"""Box-box and box-cylinder colliders for the env03 projectile block.

Box-box: SAT over the 15 candidate axes with MuJoCo/ODE-style preference for
face axes (edge axes must beat the best face separation by ~5%), then

  * face case — the contact manifold is the intersection polygon of the
    incident face with the reference face (projected along the reference
    normal).  Its vertices decompose into a fixed 24-candidate set: the 4
    incident-face corners inside the reference rectangle, the 4 reference
    corners inside the incident quad, and the 16 edge-pair intersections.
    Penetrating candidates (dist < margin) are kept, deepest-8 capped.
  * edge-edge case — single closest-point contact.

Box-cylinder: the block only reaches the wheels in rare trajectories; a
3-candidate approximation (deepest lateral-line point + axis-end rim points)
stands in for MuJoCo's 5-point manifold and is validated statistically.

Branch-free throughout: fixed candidate counts + include masks, vmap/jit safe.
Contact frames use MuJoCo's mju_makeFrame rule (helper = y-axis when
|n_y| < 0.5 else z-axis).
"""

from typing import NamedTuple

import jax.numpy as jnp

from .slin import vadd, vsub, vscale, vdot, vcross, mvmul, mtvmul, mcol


class Contact2(NamedTuple):
    """Two-body contact with an arbitrary frame."""
    pos: tuple
    dist: object
    include: object
    normal: tuple        # from body1 geom to body2 geom (MuJoCo convention)
    t1: tuple
    t2: tuple
    body1: int           # static id (0=chassis, 1=l_wheel, 2=r_wheel, -1=world)
    body2: int           # static id (3=block)


def make_frame(n):
    """MuJoCo mju_makeFrame tangent construction."""
    use_y = jnp.abs(n[1]) < 0.5
    hx = jnp.where(use_y, 0.0, 0.0)
    hy = jnp.where(use_y, 1.0, 0.0)
    hz = jnp.where(use_y, 0.0, 1.0)
    h = (hx, hy, hz)
    d = vdot(n, h)
    t1 = vsub(h, vscale(n, d))
    ln = jnp.sqrt(vdot(t1, t1))
    t1 = vscale(t1, 1.0 / jnp.maximum(ln, 1e-15))
    t2 = vcross(n, t1)
    return t1, t2


def box_box(c1, R1, half1, c2, R2, half2, margin, body1, body2):
    """Returns 9 Contact2 candidates (8 face-manifold + 1 edge-edge)."""
    A1 = [mcol(R1, i) for i in range(3)]
    A2 = [mcol(R2, j) for j in range(3)]
    C = [[vdot(A1[i], A2[j]) for j in range(3)] for i in range(3)]
    d = vsub(c2, c1)
    dp = [vdot(d, A1[i]) for i in range(3)]
    dq = [vdot(d, A2[j]) for j in range(3)]

    seps = []
    for i in range(3):  # box1 faces
        seps.append(jnp.abs(dp[i]) - half1[i]
                    - sum(half2[j] * jnp.abs(C[i][j]) for j in range(3)))
    for j in range(3):  # box2 faces
        seps.append(jnp.abs(dq[j]) - half2[j]
                    - sum(half1[i] * jnp.abs(C[i][j]) for i in range(3)))
    edge_axes = []
    for i in range(3):
        for j in range(3):
            ax = vcross(A1[i], A2[j])
            ln = jnp.sqrt(vdot(ax, ax))
            ok = ln > 1e-9
            axn = vscale(ax, 1.0 / jnp.maximum(ln, 1e-9))
            s = vdot(d, axn)
            sgn = jnp.where(s >= 0, 1.0, -1.0)
            axn = vscale(axn, sgn)
            r1 = sum(half1[k] * jnp.abs(vdot(A1[k], axn)) for k in range(3))
            r2 = sum(half2[k] * jnp.abs(vdot(A2[k], axn)) for k in range(3))
            seps.append(jnp.where(ok, jnp.abs(s) - r1 - r2, -jnp.inf))
            edge_axes.append((i, j, axn))

    seps_arr = jnp.stack(seps)
    any_contact = jnp.max(seps_arr) < margin

    FUDGE = 1.05
    face_sep = jnp.max(seps_arr[:6])
    face_idx = jnp.argmax(seps_arr[:6])
    edge_sep = jnp.max(seps_arr[6:])
    edge_idx = jnp.argmax(seps_arr[6:])
    # seps negative when penetrating; the edge axis wins only when clearly
    # better (less negative) than the fudged face separation
    use_edge = edge_sep * FUDGE > face_sep + 1e-14

    # ------------------------------------------------ face manifold
    # reference box: box1 if face_idx<3 else box2. Build both, select by mask.
    def manifold(cref, Aref, halfref, cinc, Ainc, halfinc, axis_sel, nsign):
        """Intersection candidates in the ref box frame; axis_sel one-hot of
        the reference axis; nsign +-1 (ref normal = nsign * ref_axis)."""
        # local frame of ref box
        dd = vsub(cinc, cref)
        dloc = tuple(vdot(dd, Aref[i]) for i in range(3))
        Aloc = [tuple(vdot(Ainc[j], Aref[i]) for i in range(3))
                for j in range(3)]  # inc axes in ref coords
        # ref axis index arithmetic-selected
        def sel(vals):
            return sum(jnp.where(axis_sel == i, vals[i], 0.0)
                       for i in range(3))
        # incident face: inc axis most anti-parallel to ref normal
        nref_loc = tuple(nsign * jnp.where(axis_sel == i, 1.0, 0.0)
                         for i in range(3))
        dots = [vdot(Aloc[j], nref_loc) for j in range(3)]
        inc_j = jnp.argmax(jnp.stack([jnp.abs(x) for x in dots]))
        # incident face center + tangent axes (ref coords)
        ctr, ua, va = None, None, None
        ctrs, uas, vas = [], [], []
        for j in range(3):
            sgn_j = jnp.where(dots[j] >= 0, -1.0, 1.0)
            ctrs.append(vadd(dloc, vscale(Aloc[j], sgn_j * halfinc[j])))
            uas.append(vscale(Aloc[(j + 1) % 3], halfinc[(j + 1) % 3]))
            vas.append(vscale(Aloc[(j + 2) % 3], halfinc[(j + 2) % 3]))
        ctr = tuple(sum(jnp.where(inc_j == j, ctrs[j][i], 0.0)
                        for j in range(3)) for i in range(3))
        ua = tuple(sum(jnp.where(inc_j == j, uas[j][i], 0.0)
                       for j in range(3)) for i in range(3))
        va = tuple(sum(jnp.where(inc_j == j, vas[j][i], 0.0)
                       for j in range(3)) for i in range(3))
        quad = [vadd(vadd(ctr, ua), va), vsub(vadd(ctr, ua), va),
                vsub(vsub(ctr, ua), va), vadd(vsub(ctr, ua), va)]
        # reference rectangle tangent coords: the two axes != ref axis.
        # tangent one-hots
        t_oh = []
        t_half = []
        for i in range(3):
            t_oh.append(tuple(1.0 * (k == i) for k in range(3)))
        # depth coordinate index = axis_sel; tangent halfwidths selected:
        def coord(p, i):
            return p[i]
        # For arithmetic selection treat coordinates generically: for each
        # candidate point p (ref coords), depth = nsign*p[ref] - half[ref],
        # tangent test |p[t]| <= half[t] for t != ref.
        half_arr = jnp.stack([jnp.asarray(h, jnp.result_type(float))
                              * jnp.ones(()) for h in halfref])

        def depth_of(p):
            pr = sel(p)
            return nsign * pr - sel(halfref)

        def inside_rect(p, tol=0.0):
            ok = jnp.asarray(True)
            for i in range(3):
                is_t = axis_sel != i
                ok = ok & (~is_t | (jnp.abs(p[i]) <= halfref[i] + tol))
            return ok

        cands = []
        # 1) incident quad corners inside ref rect
        for p in quad:
            cands.append((p, inside_rect(p)))
        # 2) ref rect corners inside incident quad (projected along normal)
        # ref corners: coordinates +-half on tangent axes, on the face plane
        # p_ref = sum_t (+-half_t e_t) + nsign*half_ref*e_ref ... but depth
        # measured from incident quad: project ref corner onto incident face
        # plane along ref normal.
        # incident plane: points x with (x-ctr).m = 0, m = quad normal
        m = vcross(ua, va)
        mlen = jnp.sqrt(vdot(m, m))
        m = vscale(m, 1.0 / jnp.maximum(mlen, 1e-15))
        for s1 in (-1.0, 1.0):
            for s2 in (-1.0, 1.0):
                # build tangent corner: assign +-half to the two tangent axes
                p = [0.0, 0.0, 0.0]
                first = True
                # tangent axes in fixed order (0,1,2) minus ref: use masks
                # coordinate i gets s1*half_i for the first tangent axis and
                # s2*half_i for the second.
                # first tangent = smallest i != ref; second = largest.
                for i in range(3):
                    is_first = (axis_sel != i) & (
                        (axis_sel == 0) & (i == 1) | (axis_sel != 0) & (i == 0))
                    is_second = (axis_sel != i) & (
                        (axis_sel == 2) & (i == 1) | (axis_sel != 2) & (i == 2))
                    p[i] = (jnp.where(is_first, s1 * halfref[i], 0.0)
                            + jnp.where(is_second, s2 * halfref[i], 0.0))
                # project onto incident plane along ref normal:
                # p + t*nref with (p + t*nref - ctr).m = 0
                denom = vdot(nref_loc, m)
                t = vdot(vsub(ctr, tuple(p)), m) / jnp.where(
                    jnp.abs(denom) < 1e-12, 1e-12, denom)
                proj = vadd(tuple(p), vscale(nref_loc, t))
                # inside incident quad? express in (ua, va) basis
                rel = vsub(proj, ctr)
                uu, vv = vdot(ua, ua), vdot(va, va)
                cu = vdot(rel, ua) / jnp.maximum(uu, 1e-15)
                cv = vdot(rel, va) / jnp.maximum(vv, 1e-15)
                ok = (jnp.abs(cu) <= 1.0) & (jnp.abs(cv) <= 1.0)
                cands.append((proj, ok))
        # 3) edge intersections: quad edges x rect edges, in the 2D tangent
        # plane (project along ref normal).
        # Parameterize rect edges and quad edges; solve 2x2.
        rect_pts = []
        for s1, s2 in ((1, 1), (-1, 1), (-1, -1), (1, -1)):
            p = [0.0, 0.0, 0.0]
            for i in range(3):
                is_first = (axis_sel != i) & (
                    (axis_sel == 0) & (i == 1) | (axis_sel != 0) & (i == 0))
                is_second = (axis_sel != i) & (
                    (axis_sel == 2) & (i == 1) | (axis_sel != 2) & (i == 2))
                p[i] = (jnp.where(is_first, s1 * halfref[i], 0.0)
                        + jnp.where(is_second, s2 * halfref[i], 0.0))
            rect_pts.append(tuple(p))
        for qa in range(4):
            qb = (qa + 1) % 4
            for ra in range(4):
                rb = (ra + 1) % 4
                # 2D coords: drop the ref axis (project along it)
                def flat(p):
                    out = []
                    for i in range(3):
                        out.append(jnp.where(axis_sel == i, 0.0, p[i]))
                    return out
                p1, p2 = flat(quad[qa]), flat(quad[qb])
                p3, p4 = flat(rect_pts[ra]), flat(rect_pts[rb])
                r = [p2[i] - p1[i] for i in range(3)]
                s = [p4[i] - p3[i] for i in range(3)]
                qp = [p3[i] - p1[i] for i in range(3)]
                # cross in the tangent plane: use the ref axis component of
                # 3D cross products
                rxs3 = vcross(tuple(r), tuple(s))
                qxr3 = vcross(tuple(qp), tuple(r))
                qxs3 = vcross(tuple(qp), tuple(s))
                rxs = sel(rxs3)
                tnum = sel(qxs3)
                unum = sel(qxr3)
                ok = jnp.abs(rxs) > 1e-14
                tt = tnum / jnp.where(ok, rxs, 1.0)
                uu2 = unum / jnp.where(ok, rxs, 1.0)
                ok = ok & (tt >= 0) & (tt <= 1) & (uu2 >= 0) & (uu2 <= 1)
                # interpolate on the ORIGINAL 3D quad edge (keeps depth)
                inter = vadd(quad[qa],
                             vscale(vsub(quad[qb], quad[qa]), tt))
                cands.append((inter, ok))
        # depths + world transform
        out = []
        for p, ok in cands:
            dep = depth_of(p)
            pw = vadd(cref, tuple(sum(Aref[i][k] * p[i] for i in range(3))
                                  for k in range(3)))
            out.append((pw, dep, ok))
        return out

    # manifold with box1 as reference
    ref_sel_1 = face_idx        # 0..2 valid when face_idx<3
    nsign_1 = sum(jnp.where(face_idx == i,
                            jnp.where(dp[i] >= 0, 1.0, -1.0), 0.0)
                  for i in range(3))
    man1 = manifold(c1, A1, half1, c2, A2, half2,
                    jnp.clip(face_idx, 0, 2), nsign_1)
    # manifold with box2 as reference (normal flipped to keep 1->2)
    fi2 = jnp.clip(face_idx - 3, 0, 2)
    nsign_2 = sum(jnp.where(fi2 == j,
                            jnp.where(dq[j] >= 0, -1.0, 1.0), 0.0)
                  for j in range(3))
    man2 = manifold(c2, A2, half2, c1, A1, half1, fi2, nsign_2)

    ref_is_1 = face_idx < 3
    # world normal from 1 to 2
    n1 = tuple(sum(jnp.where(face_idx == i,
                             jnp.where(dp[i] >= 0, 1.0, -1.0) * A1[i][k],
                             0.0) for i in range(3)) for k in range(3))
    n2 = tuple(sum(jnp.where(fi2 == j,
                             jnp.where(dq[j] >= 0, 1.0, -1.0) * A2[j][k],
                             0.0) for j in range(3)) for k in range(3))
    nface = tuple(jnp.where(ref_is_1, a, b) for a, b in zip(n1, n2))

    # pick up to 8 deepest valid candidates from the selected manifold
    pts, deps, oks = [], [], []
    for (p1m, d1m, o1m), (p2m, d2m, o2m) in zip(man1, man2):
        pts.append(tuple(jnp.where(ref_is_1, a, b) for a, b in zip(p1m, p2m)))
        deps.append(jnp.where(ref_is_1, d1m, d2m))
        oks.append(jnp.where(ref_is_1, o1m, o2m))
    dep_arr = jnp.stack(deps)
    ok_arr = jnp.stack(oks) & (dep_arr < margin) & ~use_edge & ~any_contact
    # rank by depth among valid
    rank_key = jnp.where(ok_arr, dep_arr, jnp.inf)
    order = jnp.argsort(rank_key)
    t1f, t2f = make_frame(nface)
    contacts = []
    for slot in range(8):
        idx = order[slot]
        sel_p = tuple(sum(jnp.where(idx == i, pts[i][k], 0.0)
                          for i in range(len(pts))) for k in range(3))
        sel_d = jnp.sum(jnp.where(idx == jnp.arange(len(pts)), dep_arr, 0.0))
        sel_ok = jnp.sum(jnp.where(idx == jnp.arange(len(pts)),
                                   ok_arr, False).astype(jnp.int32)) > 0
        pos = vsub(sel_p, vscale(nface, sel_d * 0.5))
        contacts.append(Contact2(pos=pos, dist=sel_d, include=sel_ok,
                                 normal=nface, t1=t1f, t2=t2f,
                                 body1=body1, body2=body2))

    # ------------------------------------------------ edge-edge contact
    # closest points between the two supporting edges
    ei = edge_idx // 3
    ej = edge_idx % 3
    a1 = tuple(sum(jnp.where(ei == i, A1[i][k], 0.0) for i in range(3))
               for k in range(3))
    a2 = tuple(sum(jnp.where(ej == j, A2[j][k], 0.0) for j in range(3))
               for k in range(3))
    nedge = [sum(jnp.where(edge_idx == 6 * 0 + i * 3 + j, 0.0, 0.0)
                 for i in range(3) for j in range(3))] * 3
    # edge axis (normalized, oriented 1->2): recompute
    axe = vcross(a1, a2)
    lne = jnp.sqrt(vdot(axe, axe))
    axe = vscale(axe, 1.0 / jnp.maximum(lne, 1e-9))
    se = vdot(d, axe)
    axe = vscale(axe, jnp.where(se >= 0, 1.0, -1.0))
    # supporting edge centers: move to the face of each box toward the other
    p1e = c1
    for i in range(3):
        other = jnp.where(ei == i, 0.0, 1.0)
        sgn = jnp.where(vdot(A1[i], axe) >= 0, 1.0, -1.0)
        p1e = vadd(p1e, vscale(A1[i], other * sgn * half1[i]))
    p2e = c2
    for j in range(3):
        other = jnp.where(ej == j, 0.0, 1.0)
        sgn = jnp.where(vdot(A2[j], axe) >= 0, -1.0, 1.0)
        p2e = vadd(p2e, vscale(A2[j], other * sgn * half2[j]))
    # closest points on the two infinite lines p1e + t a1, p2e + u a2
    r12 = vsub(p2e, p1e)
    a1a2 = vdot(a1, a2)
    denom = 1.0 - a1a2 * a1a2
    denom = jnp.where(jnp.abs(denom) < 1e-12, 1e-12, denom)
    t_par = (vdot(r12, a1) - a1a2 * vdot(r12, a2)) / denom
    u_par = (a1a2 * vdot(r12, a1) - vdot(r12, a2)) / denom
    q1 = vadd(p1e, vscale(a1, t_par))
    q2 = vadd(p2e, vscale(a2, u_par))
    mid = vscale(vadd(q1, q2), 0.5)
    edge_dist = sum(jnp.where(edge_idx == k - 6, seps_arr[k], 0.0)
                    for k in range(6, 15))
    t1e, t2e = make_frame(axe)
    contacts.append(Contact2(
        pos=mid, dist=edge_dist,
        include=use_edge & (edge_dist < margin) & ~any_contact,
        normal=axe, t1=t1e, t2=t2e, body1=body1, body2=body2))
    return contacts


def box_cylinder(cbox, Rbox, half, ccyl, axis, r, h, margin, body1, body2):
    """Approximate cylinder(lateral)-box manifold: 3 candidates.

    body1 = wheel (cylinder), body2 = block (box); normal from cylinder to
    box per MuJoCo geom ordering (wheel geom id < block geom id).
    """
    # closest point on box surface to the cylinder axis segment: sample the
    # segment center and both cap centers, take the closest feature normal.
    contacts = []
    for tpar in (0.0, -1.0, 1.0):
        pc = vadd(ccyl, vscale(axis, tpar * h))
        # closest point in box local coords
        lp = mtvmul(Rbox, vsub(pc, cbox))
        cl = tuple(jnp.clip(lp[i], -half[i], half[i]) for i in range(3))
        delta = vsub(lp, cl)
        dl = jnp.sqrt(vdot(delta, delta))
        outside = dl > 1e-12
        # normal from box surface toward the cylinder point (local)
        nloc = tuple(delta[i] / jnp.maximum(dl, 1e-12) for i in range(3))
        nw = mvmul(Rbox, nloc)          # box -> cylinder direction (world)
        # contact normal cylinder->box = -nw
        n = vscale(nw, -1.0)
        # distance between cylinder surface (radius r about axis... for the
        # lateral surface the support along -nw is r * the component of -nw
        # orthogonal to the axis; for cap ends it's the rim)
        ca = vdot(n, axis)
        perp = jnp.sqrt(jnp.maximum(1.0 - ca * ca, 0.0))
        support = r * perp + 0.0
        dist = jnp.where(outside, dl - support, -support - dl)
        surf = vadd(pc, vscale(n, support))
        pos = vsub(surf, vscale(n, dist * 0.5))
        t1c, t2c = make_frame(n)
        contacts.append(Contact2(pos=pos, dist=dist,
                                 include=dist < margin, normal=n,
                                 t1=t1c, t2=t2c, body1=body1, body2=body2))
    return contacts

"""Contact generation for the balance-robot scenes (MuJoCo-parity).

Implements the exact collision functions MuJoCo uses for these scenes,
reverse-engineered and validated against mujoco 3.10 (tests/test_physics_parity.py):

  * plane-cylinder (wheels vs floor): 4 candidate support points — the deepest
    rim point, the rim point at the opposite cap, and two lower-cap rim points
    at +-120 deg from the deepest direction; every candidate with dist < margin
    becomes a contact (matches mjc_PlaneCylinder behavior across the tilt sweep).
  * plane-box (chassis / block vs floor): the 8 corners, the first 4
    penetrating corners in MuJoCo's corner order become contacts.

The floor is the z = FLOOR_Z plane, so every contact frame is the constant
(n, t1, t2) = ((0,0,1), (0,1,0), (-1,0,0)) triple (mju_makeFrame of +z).

Contacts are returned as fixed-size tuples of `Contact` records with an
`include` mask — under vmap/jit nothing is data-dependent in shape.
"""

from typing import NamedTuple

import jax.numpy as jnp

from .slin import vadd, vsub, vscale, vdot, vcross, mvmul, mcol

FLOOR_Z = -0.02
NORMAL = (0.0, 0.0, 1.0)
T1 = (0.0, 1.0, 0.0)
T2 = (-1.0, 0.0, 0.0)


class Contact(NamedTuple):
    pos: tuple          # contact point (midpoint convention, unused by rows)
    point: tuple        # support point on the moving body (used for Jacobian)
    dist: object        # signed distance (scalar)
    include: object     # bool mask
    body: int           # 0=chassis, 1=l_wheel, 2=r_wheel, 3=block (static id)


def plane_cylinder(center, axis, r, h, margin, body):
    """Contacts of a cylinder (center, unit axis, radius r, half-len h) with
    the floor plane. Returns 4 Contact candidates."""
    nz = NORMAL
    ca = vdot(nz, axis)
    # w = normalize(n - ca*axis): in-plane "up" direction orthogonal to axis
    w_raw = vsub(nz, vscale(axis, ca))
    wn = jnp.sqrt(vdot(w_raw, w_raw))
    # degenerate (axis vertical): fall back to x-axis direction
    safe = jnp.maximum(wn, 1e-12)
    w = tuple(jnp.where(wn > 1e-10, c / safe, f)
              for c, f in zip(w_raw, (1.0, 0.0, 0.0)))
    # sign of axis pointing "down": lower cap center = center - h*s*axis
    s = jnp.where(ca >= 0, 1.0, -1.0)
    a_s = vscale(axis, s)
    low_cap = vsub(center, vscale(a_s, h))
    upp_cap = vadd(center, vscale(a_s, h))
    rim = vscale(w, r)
    p0 = vsub(low_cap, rim)          # deepest rim point
    p1 = vsub(upp_cap, rim)          # opposite cap rim point
    # lower-cap rim points at +-120deg: direction cos120*(-w) + sin120*v,
    # v = axis x (-w)
    v = vcross(a_s, vscale(w, -1.0))
    c120, s120 = -0.5, 0.8660254037844386
    dir2 = vadd(vscale(vscale(w, -1.0), c120), vscale(v, s120))
    dir3 = vadd(vscale(vscale(w, -1.0), c120), vscale(v, -s120))
    p2 = vadd(low_cap, vscale(dir2, r))
    p3 = vadd(low_cap, vscale(dir3, r))
    out = []
    for p in (p0, p1, p2, p3):
        dist = p[2] - FLOOR_Z
        pos = (p[0], p[1], p[2] - dist * 0.5)
        out.append(Contact(pos=pos, point=p, dist=dist,
                           include=dist < margin, body=body))
    return out


# MuJoCo mjc_PlaneBox corner enumeration: i in 0..7, corner offset component
# k is +size[k] if (i >> k) & 1 else -size[k]  (verified empirically).
_BOX_CORNERS = [tuple((1.0 if (i >> k) & 1 else -1.0) for k in range(3))
                for i in range(8)]


def plane_box(center, R, half, margin, body):
    """Contacts of an oriented box with the floor: the 4 *deepest* penetrating
    corners (= the support corner plus its 3 edge neighbors, since a diagonal
    corner is never deeper than a shared neighbor; verified vs mujoco 3.10 on
    deep-penetration states)."""
    pts, dists = [], []
    for sgn in _BOX_CORNERS:
        local = (sgn[0] * half[0], sgn[1] * half[1], sgn[2] * half[2])
        p = vadd(center, mvmul(R, local))
        pts.append(p)
        dists.append(p[2] - FLOOR_Z)
    out = []
    for i, (p, dist) in enumerate(zip(pts, dists)):
        # rank by pairwise comparison (earlier index wins ties) — equivalent
        # to argsort-top-4 but expressible as pure elementwise ops, so this
        # code also traces inside pallas kernels
        rank = 0
        for j, dj in enumerate(dists):
            if j == i:
                continue
            less = (dj < dist) | ((dj == dist) & (j < i))
            rank = rank + jnp.where(less, 1, 0)
        inc = (dist < margin) & (rank < 4)
        pos = (p[0], p[1], p[2] - dist * 0.5)
        out.append(Contact(pos=pos, point=p, dist=dist, include=inc, body=body))
    return out


def robot_floor_contacts(k, wheel_margin=0.0, chassis_margin=0.0):
    """All floor contacts of the robot given fk output `k`.

    Returns (wheel_contacts(8), chassis_contacts(8)).
    Wheel cylinder axis = chassis-frame x (hinge spin does not move it).
    """
    R = k["R"]
    axis = mcol(R, 0)
    wl = plane_cylinder(k["xpos_l"], axis, 0.034, 0.013, wheel_margin, body=1)
    wr = plane_cylinder(k["xpos_r"], axis, 0.034, 0.013, wheel_margin, body=2)
    chassis_center = vadd(k["pos"], mvmul(R, (0.0, 0.0, 0.0995)))
    ch = plane_box(chassis_center, R, (0.05, 0.0185, 0.0855), chassis_margin,
                   body=0)
    return tuple(wl) + tuple(wr), tuple(ch)


# ------------------------------------------------ array-form ContactSets

def _stack_contacts(cons):
    import jax.numpy as jnp
    pos = jnp.stack([jnp.stack(c.pos) for c in cons])
    dist = jnp.stack([c.dist for c in cons])
    inc = jnp.stack([c.include for c in cons])
    return pos, dist, inc


def wheel_floor_set(k, wheel, params, nv, margin=0.0):
    """ContactSet for one wheel (4 plane-cylinder candidates)."""
    from . import rows as rw
    axis = mcol(k["R"], 0)
    center = k["xpos_l"] if wheel == 1 else k["xpos_r"]
    cons = plane_cylinder(center, axis, 0.034, 0.013, margin, body=wheel)
    pos, dist, inc = _stack_contacts(cons)
    dofs = (0, 1, 2, 3, 4, 5, 6) if wheel == 1 else (0, 1, 2, 3, 4, 5, 7)
    return rw.ContactSet(pos=pos, dist=dist, include=inc,
                         frame=rw.floor_frames(4),
                         sign=rw.sign_matrix(nv, 4, dofs),
                         params=params, dyn_friction=True)


def box_floor_set(center, R, half, margin, params, nv, dofs,
                  includemargin=0.0, max_corners=4):
    """ContactSet for an oriented box vs the floor: the `max_corners` deepest
    penetrating corners (array form)."""
    import jax.numpy as jnp
    from . import rows as rw
    signs = jnp.asarray([[(1.0 if (i >> kk) & 1 else -1.0) for kk in range(3)]
                         for i in range(8)])
    Rm = jnp.stack([jnp.stack(r) for r in R])           # (3,3) rows
    cm = jnp.stack(center)
    local = signs * jnp.asarray(half)
    corners = cm[None, :] + local @ Rm.T                # (8,3)
    dist = corners[:, 2] - FLOOR_Z
    order = jnp.argsort(dist)
    rank = jnp.argsort(order)                            # rank[i] = position
    inc = (dist < margin) & (rank < max_corners)
    pos = corners.at[:, 2].add(-dist * 0.5)
    return rw.ContactSet(pos=pos, dist=dist - includemargin, include=inc,
                         frame=rw.floor_frames(8),
                         sign=rw.sign_matrix(nv, 8, dofs),
                         params=params)

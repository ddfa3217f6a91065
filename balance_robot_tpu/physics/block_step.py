"""Physics step for the env03 scenes: robot (8 dof) + projectile block (6 dof).

The block is an independent free body in its own kinematic tree: the mass
matrix is block-diagonal (M_robot 8x8 + M_block 6x6) and only the contact
solver couples the trees (rows spanning all 14 dofs).  The robot half reuses
robot_core verbatim; the block half is the standard free-body com-frame
dynamics (gyroscopic bias + gravity).

Block model constants (compiled env03_v1.xml, inertiafromgeom=true):
  mass 0.064, inertia 1.70667e-5 * I3, half-extent 0.02, margin 0.002.
Contact params (verified vs mujoco 3.10 probes):
  block-floor:   solref (0.0125,0.95) [solmix average], solimp default,
                 mu 1, includemargin 0.002, invweight 15.625
  block-chassis: same solref mix; invweight 1.2709 + 15.625
  block-wheel:   same solref mix; invweight 3.3757 + 15.625
"""

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .slin import (vadd, vsub, vscale, vdot, vcross, qnormalize, qmat,
                   quat_integrate, mvmul, mcol, chol_factor, chol_solve)
from . import robot_core as rc
from .robot_core import RobotSceneParams, ContactParams
from . import contacts as ct
from . import solver as sv
from .box_collisions import box_box, box_cylinder, Contact2, make_frame

NV = 14
BLOCK_MASS = 0.064
BLOCK_I = 1.7066666666666667e-05
BLOCK_HALF = (0.02, 0.02, 0.02)
BLOCK_MARGIN = 0.002
BLOCK_INVW = 15.625

BLOCK_FLOOR = ContactParams(
    solref=(0.0125, 0.95), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
    friction=(1.0, 1.0), margin=BLOCK_MARGIN, invweight=BLOCK_INVW)
BLOCK_CHASSIS = ContactParams(
    solref=(0.0125, 0.95), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
    friction=(1.0, 1.0), margin=BLOCK_MARGIN,
    invweight=1.2709072512005732 + BLOCK_INVW)
BLOCK_WHEEL = ContactParams(
    solref=(0.0125, 0.95), solimp=(0.9, 0.95, 0.001, 0.5, 2.0),
    friction=(1.0, 1.0), margin=BLOCK_MARGIN,
    invweight=3.3757186541109845 + BLOCK_INVW)

# env03 wheel/chassis floor contacts use default geom params (no <contact>
# block in env03_v1.xml) — same as ENV02
ENV03_PARAMS = rc.ENV02_PARAMS


class PhysState14(NamedTuple):
    qpos: tuple      # 16 scalars (robot 9 + block 7)
    qvel: tuple      # 14 scalars
    warmstart: tuple  # 14


def block_fk(qpos_b):
    pos = (qpos_b[0], qpos_b[1], qpos_b[2])
    quat = qnormalize((qpos_b[3], qpos_b[4], qpos_b[5], qpos_b[6]))
    R = qmat(quat)
    return pos, quat, R


def block_smooth(pos, R, qvel_b, gravity):
    """Free-body dynamics in the com frame (com == body origin, ipos=0).

    Returns (M_rot 3x3 world, bias(6)).  M_trans = m*I; no cross terms.
    cdof: trans = world axes; rot = body axes (world-rotated) with zero lever
    (the frame origin is the com itself).
    """
    # world inertia: R * (I*1) * R^T = BLOCK_I * I3 (isotropic!)
    # (cube inertia is isotropic, so the rotation drops out)
    # bias: gyroscopic term on rotation dofs. cvel_ang = R omega_local.
    w_l = (qvel_b[3], qvel_b[4], qvel_b[5])
    w_w = mvmul(R, w_l)
    Iw = vscale(w_w, BLOCK_I)
    gyro = vcross(w_w, Iw)      # = 0 for isotropic inertia, kept for clarity
    # qfrc_bias_j = cdof_j . cfrc; rotation dofs see gyro along body axes,
    # translation dofs see -m*g... RNE: cacc0 lin = -g; f = m*(-g);
    # bias_trans_i = e_i . m*(-g)
    bias = [0.0] * 6
    for i in range(3):
        bias[i] = -BLOCK_MASS * gravity[i]
    for i in range(3):
        a = mcol(R, i)
        bias[3 + i] = vdot(a, gyro)
    return tuple(bias)


def block_cdof(pos, R, com_b):
    """Block cdof spatial vectors (c-frame origin = block com = pos)."""
    cdof = []
    for i in range(3):
        e = tuple(1.0 if j == i else 0.0 for j in range(3))
        cdof.append((0.0, 0.0, 0.0) + e)
    for i in range(3):
        a = mcol(R, i)
        cdof.append(a + (0.0, 0.0, 0.0))
    return tuple(cdof)


def contact_rows_14(robot_cons, block_floor_cons, pair_cons, cdof_r, com_r,
                    cdof_b, com_b, qvel, friction=None):
    """Build the 14-dof efc rows: robot-floor contacts (z-frame), block-floor
    contacts, and robot-block Contact2 pairs with arbitrary frames."""
    p_env = ENV03_PARAMS
    rows_J, arefs, Ds, masks = [], [], [], []

    def add_contact(chain_pos, chains, n, t1, t2, dist_efc, inc, prm,
                    fric_scale=None):
        """chains: list of (dof_list, sign, cdof, com) pairs."""
        mu1, mu2 = prm.friction
        if fric_scale is not None:
            mu1 = jnp.maximum(fric_scale, sv.MJ_MINMU)
            mu2 = mu1
        tc, dr = prm.solref
        dmax = max(prm.solimp[0], prm.solimp[1])
        imp = sv.impedance(dist_efc, prm.solimp)
        k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
        b = 2.0 / (dmax * tc)
        Jn = [0.0] * NV
        Jt1 = [0.0] * NV
        Jt2 = [0.0] * NV
        for dofs, sgn, cdof, com in chains:
            rel = vsub(chain_pos, com)
            for j_local, j in enumerate(dofs):
                cd = cdof[j_local] if len(cdof) == len(dofs) else cdof[j]
                ang, lin = cd[:3], cd[3:]
                v = vadd(lin, vcross(ang, rel))
                Jn[j] = Jn[j] + sgn * vdot(n, v)
                Jt1[j] = Jt1[j] + sgn * vdot(t1, v)
                Jt2[j] = Jt2[j] + sgn * vdot(t2, v)
        incf = jnp.where(inc, 1.0, 0.0)
        for mu, Jt in ((mu1, Jt1), (mu2, Jt2)):
            dA = 2.0 * mu * mu * (1.0 + mu * mu) * prm.invweight
            Rreg = jnp.maximum(sv.MJ_MINVAL, (1.0 - imp) / imp * dA)
            for sgn2 in (1.0, -1.0):
                row = tuple(Jn[j] + sgn2 * mu * Jt[j] for j in range(NV))
                vel = sum(row[j] * qvel[j] for j in range(NV))
                arefs.append(-b * vel - k * imp * dist_efc)
                Ds.append(1.0 / Rreg)
                masks.append(incf)
                rows_J.append(row)

    ZN, ZT1, ZT2 = ct.NORMAL, ct.T1, ct.T2
    CH = {0: (0, 1, 2, 3, 4, 5), 1: (0, 1, 2, 3, 4, 5, 6),
          2: (0, 1, 2, 3, 4, 5, 7)}
    for c in robot_cons:
        prm = (p_env.wheel_contact if c.body in (1, 2)
               else p_env.chassis_contact)
        fs = friction if (p_env.dynamic_friction and c.body in (1, 2)) \
            else None
        add_contact(c.pos, [(CH[c.body], 1.0, cdof_r, com_r)],
                    ZN, ZT1, ZT2, c.dist, c.include, prm, fs)
    for c in block_floor_cons:
        # efc pos shifted by includemargin
        add_contact(c.pos, [(tuple(range(8, 14)), 1.0, cdof_b, com_b)],
                    ZN, ZT1, ZT2, c.dist - BLOCK_MARGIN, c.include,
                    BLOCK_FLOOR)
    for c in pair_cons:
        prm = BLOCK_CHASSIS if c.body1 == 0 else BLOCK_WHEEL
        add_contact(c.pos,
                    [(tuple(range(8, 14)), 1.0, cdof_b, com_b),
                     (CH[c.body1], -1.0, cdof_r, com_r)],
                    c.normal, c.t1, c.t2, c.dist - BLOCK_MARGIN, c.include,
                    prm)
    Jc = tuple(jnp.stack([r[j] for r in rows_J]) for j in range(NV))
    return sv.EfcRows(Jc=Jc, aref=jnp.stack(arefs), D=jnp.stack(Ds),
                      mask=jnp.stack(masks))


def forward14(state: PhysState14, ctrl, p: RobotSceneParams, friction=None):
    qpos, qvel = state.qpos, state.qvel
    qpos_r, qpos_b = qpos[:9], qpos[9:]
    qvel_r, qvel_b = qvel[:8], qvel[8:]

    k = rc.fk(qpos_r)
    kv = rc.com_vel(k, qvel_r)
    M_r = rc.crb_mass_matrix(k)
    bias_r = rc.rne_bias(k, kv, qvel_r, p.gravity)
    qfrc_act, dfdv = rc.actuation(ctrl, qvel_r, p)
    passive_r = (0.0,) * 6 + (-p.joint_damping * qvel_r[6],
                              -p.joint_damping * qvel_r[7])
    qfrc_smooth_r = tuple(qfrc_act[j] + passive_r[j] - bias_r[j]
                          for j in range(8))

    pos_b, quat_b, R_b = block_fk(qpos_b)
    bias_b = block_smooth(pos_b, R_b, qvel_b, p.gravity)
    qfrc_smooth_b = tuple(-bias_b[j] for j in range(6))

    # full M as block-diagonal 14x14 (block part: m*I3 + BLOCK_I*I3)
    M = [[0.0] * NV for _ in range(NV)]
    for i in range(8):
        for j in range(8):
            M[i][j] = M_r[i][j]
    for i in range(3):
        M[8 + i][8 + i] = BLOCK_MASS
        M[11 + i][11 + i] = BLOCK_I
    M = tuple(tuple(r) for r in M)
    qfrc_smooth = qfrc_smooth_r + qfrc_smooth_b
    L = chol_factor(M, NV)
    a_smooth = chol_solve(L, qfrc_smooth, NV)

    # contacts
    wheel_cons, chassis_cons = ct.robot_floor_contacts(k)
    block_floor_cons = ct.plane_box(pos_b, R_b, BLOCK_HALF, BLOCK_MARGIN,
                                    body=3)
    chassis_center = vadd(k["pos"], mvmul(k["R"], (0.0, 0.0, 0.0995)))
    bb = box_box(chassis_center, k["R"], (0.05, 0.0185, 0.0855),
                 pos_b, R_b, BLOCK_HALF, BLOCK_MARGIN, body1=0, body2=3)
    axis = mcol(k["R"], 0)
    bw_l = box_cylinder(pos_b, R_b, BLOCK_HALF, k["xpos_l"], axis,
                        0.034, 0.013, BLOCK_MARGIN, body1=1, body2=3)
    bw_r = box_cylinder(pos_b, R_b, BLOCK_HALF, k["xpos_r"], axis,
                        0.034, 0.013, BLOCK_MARGIN, body1=2, body2=3)

    cdof_b = block_cdof(pos_b, R_b, pos_b)
    rows = contact_rows_14(
        wheel_cons + chassis_cons, tuple(block_floor_cons),
        tuple(bb) + tuple(bw_l) + tuple(bw_r),
        k["cdof"], k["com"], cdof_b, pos_b, qvel, friction=friction)

    cost_ws = sv.cost(state.warmstart, a_smooth, M, rows, NV)
    cost_sm = sv.cost(a_smooth, a_smooth, M, rows, NV)
    a0 = tuple(jnp.where(cost_ws < cost_sm, w, s)
               for w, s in zip(state.warmstart, a_smooth))
    qacc = sv.solve_newton(a0, a_smooth, M, rows, NV,
                           iters=p.newton_iters, ls_iters=p.ls_iters)
    _, qfrc_con = sv.constraint_forces(qacc, rows, NV)
    qfrc_total = tuple(qfrc_smooth[j] + qfrc_con[j] for j in range(NV))
    return qacc, qfrc_total, dfdv, M


def substep14(state: PhysState14, ctrl, p: RobotSceneParams, friction=None):
    qacc, qfrc_total, dfdv, M = forward14(state, ctrl, p, friction)
    h = p.timestep
    MH = [list(r) for r in M]
    MH[6][6] = MH[6][6] - h * (-p.joint_damping + dfdv[0])
    MH[7][7] = MH[7][7] - h * (-p.joint_damping + dfdv[1])
    LH = chol_factor(tuple(tuple(r) for r in MH), NV)
    dv = chol_solve(LH, qfrc_total, NV)
    qvel = tuple(state.qvel[j] + h * dv[j] for j in range(NV))
    qp = state.qpos
    new_r = (qp[0] + h * qvel[0], qp[1] + h * qvel[1], qp[2] + h * qvel[2])
    quat_r = quat_integrate((qp[3], qp[4], qp[5], qp[6]),
                            (qvel[3], qvel[4], qvel[5]), h)
    wheels = (qp[7] + h * qvel[6], qp[8] + h * qvel[7])
    new_b = (qp[9] + h * qvel[8], qp[10] + h * qvel[9], qp[11] + h * qvel[10])
    quat_b = quat_integrate((qp[12], qp[13], qp[14], qp[15]),
                            (qvel[11], qvel[12], qvel[13]), h)
    new_qpos = new_r + quat_r + wheels + new_b + quat_b
    return PhysState14(qpos=new_qpos, qvel=qvel, warmstart=qacc)


def control_step14(state: PhysState14, ctrl, p: RobotSceneParams,
                   friction=None, frame_skip=250):
    def body(s, _):
        return substep14(s, ctrl, p, friction), None
    state, _ = lax.scan(body, state, None, length=frame_skip)
    return state

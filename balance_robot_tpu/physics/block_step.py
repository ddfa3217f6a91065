"""Physics step for the env03 scenes: robot (8 dof) + projectile block (6 dof).

The block is an independent free body in its own kinematic tree: the mass
matrix is block-diagonal (M_robot 8x8 + m*I3 + I_block*I3 — the cube inertia
is isotropic so the rotation drops out) and only the contact solver couples
the trees (rows spanning all 14 dofs).  The robot half reuses robot_core
verbatim; the block half is standard free-body com-frame dynamics.

Block model constants (compiled env03_v1.xml, inertiafromgeom=true):
  mass 0.064, inertia 1.70667e-5 * I3, half-extent 0.02, margin 0.002.
Contact params (verified vs mujoco 3.10 probes):
  block-floor:   solref (0.0125,0.95) [solmix average], solimp default,
                 mu 1, includemargin 0.002, invweight 15.625
  block-chassis: same solref mix; invweight 1.2709 + 15.625
  block-wheel:   same solref mix; invweight 3.3757 + 15.625
"""

from typing import NamedTuple

import numpy as np
import jax.numpy as jnp
from jax import lax

from .slin import (vadd, vsub, vscale, vdot, vcross, qnormalize, qmat,
                   quat_integrate, mvmul, mcol, chol_factor, chol_solve)
from . import robot_core as rc
from .robot_core import RobotSceneParams, ContactParams
from . import contacts as ct
from . import solver as sv
from . import rows as rw
from .box_collisions import box_box, box_cylinder

NV = 14
BLOCK_MASS = 0.064
BLOCK_I = 1.7066666666666667e-05
BLOCK_HALF = (0.02, 0.02, 0.02)
BLOCK_MARGIN = 0.002
BLOCK_INVW = 15.625
BLOCK_DOFS = (8, 9, 10, 11, 12, 13)

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

# env03_v1.xml has no <contact> block: wheel/chassis floor contacts use the
# default geom-derived params (same as env02)
ENV03_PARAMS = rc.ENV02_PARAMS


class PhysState14(NamedTuple):
    qpos: tuple      # 16 scalars (robot 9 + block 7)
    qvel: tuple      # 14 scalars
    warmstart: tuple  # 14


def block_fk(qpos_b):
    pos = (qpos_b[0], qpos_b[1], qpos_b[2])
    quat = qnormalize((qpos_b[3], qpos_b[4], qpos_b[5], qpos_b[6]))
    return pos, quat, qmat(quat)


def block_bias(R, qvel_b, gravity):
    """Free-body qfrc_bias: gravity on translations only.  The gyroscopic
    term w x (I w) is mathematically zero for the isotropic cube inertia
    (I = BLOCK_I * I3 => I w is parallel to w), so it is not computed —
    this traces into both the XLA path and the fused pallas kernel, 250x
    per control step.  NOTE: the dropped float computation rounded its two
    inner products independently, so trajectories may differ from the old
    code by ~1 ulp of I*w_i*w_j (block parity vs MuJoCo is unaffected,
    test_block_parity.py)."""
    return tuple(-BLOCK_MASS * g for g in gravity) + (0.0, 0.0, 0.0)


def pair_to_set(pc, body1_dofs, params, nv=NV):
    """PairContacts (block vs robot body) -> ContactSet.

    J = J(block) - J(robot body); efc pos = dist - includemargin."""
    n = pc.pos.shape[0]
    return rw.ContactSet(
        pos=pc.pos, dist=pc.dist - BLOCK_MARGIN, include=pc.include,
        frame=pc.frame,
        sign=rw.sign_matrix(nv, n, BLOCK_DOFS, body1_dofs),
        params=params)


def forward14(state: PhysState14, ctrl, p: RobotSceneParams, friction=None):
    qpos, qvel = state.qpos, state.qvel
    qpos_r, qpos_b = qpos[:9], qpos[9:]
    qvel_r, qvel_b = qvel[:8], qvel[8:]

    k = rc.fk(qpos_r)
    kv = rc.com_vel(k, qvel_r)
    M_r = rc.crb_mass_matrix(k)
    bias_r = rc.rne_bias(k, kv, qvel_r, p.gravity)
    qfrc_act, dfdv = rc.actuation(ctrl, qvel_r, p)
    qfrc_smooth_r = tuple(
        qfrc_act[j]
        + (-p.joint_damping * qvel_r[6] if j == 6 else 0.0)
        + (-p.joint_damping * qvel_r[7] if j == 7 else 0.0)
        - bias_r[j] for j in range(8))

    pos_b, quat_b, R_b = block_fk(qpos_b)
    bias_b = block_bias(R_b, qvel_b, p.gravity)
    qfrc_smooth_b = tuple(-x for x in bias_b)

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

    # ----- contacts (array form)
    Rm = jnp.stack([jnp.stack(r) for r in k["R"]])       # (3,3) rows
    Rb = jnp.stack([jnp.stack(r) for r in R_b])
    cb = jnp.stack(pos_b)
    chassis_center = vadd(k["pos"], mvmul(k["R"], (0.0, 0.0, 0.0995)))
    cc = jnp.stack(chassis_center)
    axis = jnp.stack(mcol(k["R"], 0))
    xl = jnp.stack(k["xpos_l"])
    xr = jnp.stack(k["xpos_r"])

    sets = [
        ct.wheel_floor_set(k, 1, p.wheel_contact, NV),
        ct.wheel_floor_set(k, 2, p.wheel_contact, NV),
        ct.box_floor_set(chassis_center, k["R"], (0.05, 0.0185, 0.0855),
                         0.0, p.chassis_contact, NV, (0, 1, 2, 3, 4, 5)),
        ct.box_floor_set(pos_b, R_b, BLOCK_HALF, BLOCK_MARGIN, BLOCK_FLOOR,
                         NV, BLOCK_DOFS, includemargin=BLOCK_MARGIN),
        pair_to_set(box_box(cc, Rm, (0.05, 0.0185, 0.0855), cb, Rb,
                            BLOCK_HALF, BLOCK_MARGIN),
                    (0, 1, 2, 3, 4, 5), BLOCK_CHASSIS),
        pair_to_set(box_cylinder(cb, Rb, BLOCK_HALF, xl, axis, 0.034,
                                 0.013, BLOCK_MARGIN),
                    (0, 1, 2, 3, 4, 5, 6), BLOCK_WHEEL),
        pair_to_set(box_cylinder(cb, Rb, BLOCK_HALF, xr, axis, 0.034,
                                 0.013, BLOCK_MARGIN),
                    (0, 1, 2, 3, 4, 5, 7), BLOCK_WHEEL),
    ]
    cdof_b = [jnp.array([0.0, 0, 0, 1, 0, 0]), jnp.array([0.0, 0, 0, 0, 1, 0]),
              jnp.array([0.0, 0, 0, 0, 0, 1])]
    cdof_b += [jnp.concatenate([Rb[:, i], jnp.zeros(3)]) for i in range(3)]
    cdof_arr = jnp.concatenate([
        jnp.stack([jnp.stack(c) for c in k["cdof"]]),
        jnp.stack(cdof_b)])
    com_r = jnp.stack(k["com"])
    com_dof = jnp.concatenate([jnp.tile(com_r[None], (8, 1)),
                               jnp.tile(cb[None], (6, 1))])
    qvel_arr = jnp.stack(qvel)
    fric = friction if p.dynamic_friction else None
    rows = rw.build_rows(sets, cdof_arr, com_dof, qvel_arr, NV,
                         friction=fric)

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

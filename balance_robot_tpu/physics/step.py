"""Full physics step for the robot-only scenes (env01/env02 family).

One `substep` = MuJoCo `mj_step` at timestep 2e-5 with the implicitfast
integrator; one `control_step` = 250 substeps under constant ctrl
(frame_skip=250, reference env01_v1.py:24) = 5 ms of simulation.

State is a `PhysState` NamedTuple of scalars/tuples; everything vmaps to
`(B,)` arrays.  The previous substep's qacc warm-starts the constraint solver
exactly like MuJoCo's qacc_warmstart.
"""

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from .slin import quat_integrate, chol_factor, chol_solve, vadd, mvmul
from . import robot_core as rc
from .robot_core import RobotSceneParams, NV
from . import contacts as ct
from . import solver as sv
from . import rows as rw


def vadd3(pos, R):
    """Chassis geom center: body pos + R @ (0,0,0.0995)."""
    return vadd(pos, mvmul(R, (0.0, 0.0, 0.0995)))


def _wall_sets(k, p: RobotSceneParams):
    """Robot vs static wall boxes (envMove05_v1.xml corridor): chassis
    box-box + wheel box-cylinder contacts.  Walls are the world body, so the
    rows carry -J(robot) (geom1 = robot, geom2 = wall in id order)."""
    import jax.numpy as jnp
    from dataclasses import replace
    from .box_collisions import box_box, box_cylinder
    Rm = jnp.stack([jnp.stack(r) for r in k["R"]])
    cc = jnp.stack(vadd3(k["pos"], k["R"]))
    axis = jnp.stack([k["R"][0][0], k["R"][1][0], k["R"][2][0]])
    xl = jnp.stack(k["xpos_l"])
    xr = jnp.stack(k["xpos_r"])
    CH_DOFS = (0, 1, 2, 3, 4, 5)
    W_DOFS = {1: (0, 1, 2, 3, 4, 5, 6), 2: (0, 1, 2, 3, 4, 5, 7)}
    CH_INVW = 1.2709072512005732
    W_INVW = 3.3757186541109845
    sets = []
    for center, half in p.walls:
        cw = jnp.asarray(center)
        Rw = jnp.eye(3)
        bb = box_box(cc, Rm, (0.05, 0.0185, 0.0855), cw, Rw, half, 0.0)
        prm = replace(p.wall_contact, invweight=CH_INVW)
        sets.append(rw.ContactSet(
            pos=bb.pos, dist=bb.dist, include=bb.include, frame=bb.frame,
            sign=rw.sign_matrix(NV, bb.pos.shape[0], (), CH_DOFS),
            params=prm))
        for wheel, xw in ((1, xl), (2, xr)):
            bc = box_cylinder(cw, Rw, half, xw, axis, 0.034, 0.013, 0.0)
            prm = replace(p.wall_contact, invweight=W_INVW)
            sets.append(rw.ContactSet(
                pos=bc.pos, dist=bc.dist, include=bc.include, frame=bc.frame,
                sign=rw.sign_matrix(NV, bc.pos.shape[0], (),
                                    W_DOFS[wheel]),
                params=prm))
    return sets


class PhysState(NamedTuple):
    qpos: tuple      # 9 scalars
    qvel: tuple      # 8 scalars
    warmstart: tuple  # 8 scalars (previous qacc)


def init_state(qpos, qvel):
    return PhysState(qpos=tuple(qpos), qvel=tuple(qvel),
                     warmstart=(0.0,) * NV)


def forward(state: PhysState, ctrl, p: RobotSceneParams, friction=None):
    """mj_forward equivalent: returns (qacc, qfrc_total, dfdv, aux)."""
    qpos, qvel = state.qpos, state.qvel
    k = rc.fk(qpos)
    kv = rc.com_vel(k, qvel)
    M = rc.crb_mass_matrix(k)
    bias = rc.rne_bias(k, kv, qvel, p.gravity)
    qfrc_act, dfdv = rc.actuation(ctrl, qvel, p)
    passive = (0.0,) * 6 + (-p.joint_damping * qvel[6],
                            -p.joint_damping * qvel[7])
    qfrc_smooth = tuple(qfrc_act[j] + passive[j] - bias[j] for j in range(NV))
    L = chol_factor(M, NV)
    a_smooth = chol_solve(L, qfrc_smooth, NV)

    fric = friction if p.dynamic_friction else None
    sets = [
        ct.wheel_floor_set(k, 1, p.wheel_contact, NV),
        ct.wheel_floor_set(k, 2, p.wheel_contact, NV),
        ct.box_floor_set(vadd3(k["pos"], k["R"]), k["R"],
                         (0.05, 0.0185, 0.0855), 0.0, p.chassis_contact, NV,
                         (0, 1, 2, 3, 4, 5)),
    ]
    if p.walls:
        sets += _wall_sets(k, p)
    cdof_arr = jnp.stack([jnp.stack(c) for c in k["cdof"]])
    com_arr = jnp.stack(k["com"])
    com_dof = jnp.tile(com_arr[None, :], (NV, 1))
    qvel_arr = jnp.stack(qvel)
    rows = rw.build_rows(sets, cdof_arr, com_dof, qvel_arr, NV,
                         friction=fric)
    # warmstart selection (MuJoCo: better of warmstart / qacc_smooth by cost)
    cost_ws = sv.cost(state.warmstart, a_smooth, M, rows, NV)
    cost_sm = sv.cost(a_smooth, a_smooth, M, rows, NV)
    better = cost_ws < cost_sm
    a0 = tuple(jnp.where(better, w, s)
               for w, s in zip(state.warmstart, a_smooth))
    qacc = sv.solve_newton(a0, a_smooth, M, rows, NV,
                           iters=p.newton_iters, ls_iters=p.ls_iters)
    _, qfrc_con = sv.constraint_forces(qacc, rows, NV)
    qfrc_total = tuple(qfrc_smooth[j] + qfrc_con[j] for j in range(NV))
    return qacc, qfrc_total, dfdv, dict(M=M, k=k)


def substep(state: PhysState, ctrl, p: RobotSceneParams, friction=None):
    """One mj_step: forward dynamics + implicitfast integration."""
    qacc, qfrc_total, dfdv, aux = forward(state, ctrl, p, friction)
    M = aux["M"]
    h = p.timestep
    # implicitfast: qvel += h * (M - h*D)^-1 qfrc_total,
    # D = d(qfrc_passive+actuator)/dqvel  (diag on wheel dofs)
    MH = [list(r) for r in M]
    MH[6][6] = MH[6][6] - h * (-p.joint_damping + dfdv[0])
    MH[7][7] = MH[7][7] - h * (-p.joint_damping + dfdv[1])
    LH = chol_factor(tuple(tuple(r) for r in MH), NV)
    dv = chol_solve(LH, qfrc_total, NV)
    qvel = tuple(state.qvel[j] + h * dv[j] for j in range(NV))
    qpos = state.qpos
    new_pos = (qpos[0] + h * qvel[0], qpos[1] + h * qvel[1],
               qpos[2] + h * qvel[2])
    quat = quat_integrate((qpos[3], qpos[4], qpos[5], qpos[6]),
                          (qvel[3], qvel[4], qvel[5]), h)
    new_qpos = new_pos + quat + (qpos[7] + h * qvel[6], qpos[8] + h * qvel[7])
    return PhysState(qpos=new_qpos, qvel=qvel, warmstart=qacc)


def control_step(state: PhysState, ctrl, p: RobotSceneParams, friction=None,
                 frame_skip=250):
    """250 substeps at constant ctrl = one 200 Hz control step."""
    def body(s, _):
        return substep(s, ctrl, p, friction), None
    state, _ = lax.scan(body, state, None, length=frame_skip)
    return state

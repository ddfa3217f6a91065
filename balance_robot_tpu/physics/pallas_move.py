"""Fused pallas control step for the 8-dof WALL scenes (EnvMove05).

The corridor scene (reference envMove05_v1.xml: 4 static wall boxes) ran
only on the XLA path — `step._wall_sets` builds chassis box-box and wheel
box-cylinder contact rows against every wall, and XLA compiles the
scalar-unrolled 250-substep graph into HBM-round-tripping kernelets
(~1.5k env-steps/s in training on a v5-lite).  This module fuses the whole
control step into one pallas kernel, exactly like physics/pallas_step.py
does for the flat-floor scenes, reusing:

  * the 8-dof smooth dynamics + integrator from pallas_step.substep_scalar
    (same fk/CRB/RNE/actuation/Cholesky trace),
  * the kernel-traceable scalar colliders from pallas_block
    (box_box_scalar 24-candidate manifold + edge contact, box_cylinder
    _scalar) — already proven bit-equal to the array path,
  * pallas_block.build_rows14_scalar at nv=8 for the arbitrary-frame
    contact rows (the flat-floor builder hardcodes the floor frame).

Wall rows match step._wall_sets semantics: walls are world geoms, so rows
carry -J(robot) (chain1 = robot chain, chain2 = ()); contact params are
p.wall_contact with the chassis/wheel invweights.

Row budget per lane: floor 6 recs + 4 walls x (25 box-box + 2x3
box-cylinder) = 130 recs -> 520 efc rows at nv=8 (vs 24 for the flat-floor
kernel), so BLOCK_B is 256 by default (VMEM: Jc 8 x 520 x B floats).
"""

import functools
from dataclasses import replace

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

from . import robot_core as rc
from . import contacts as ct
from . import solver as sv
from .robot_core import NV
from .slin import chol_factor, chol_solve, quat_integrate, vadd, mvmul, mcol
from .step import PhysState
from .pallas_step import CHAINS
from .pallas_block import (SContact, box_box_scalar, box_cylinder_scalar,
                           build_rows14_scalar, FLOOR_FRAME)

# chassis / wheel body invweights (step._wall_sets; mirrors the XML
# compilation constants used by the XLA wall rows)
CH_INVW = 1.2709072512005732
W_INVW = 3.3757186541109845
CHASSIS_HALF = (0.05, 0.0185, 0.0855)
EYE3 = ((1.0, 0.0, 0.0), (0.0, 1.0, 0.0), (0.0, 0.0, 1.0))

BLOCK_B = 128   # 256 overflows the 16M scoped-VMEM stack by 1.4M on v5-lite


def substep_walls_scalar(state: PhysState, ctrl, p):
    """pallas_step.substep_scalar + wall contacts (kernel-traceable)."""
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

    com_r = k["com"]
    chassis_center = vadd(k["pos"], mvmul(k["R"], (0.0, 0.0, 0.0995)))
    axis = mcol(k["R"], 0)
    scon = []
    # floor contacts (same recs as the flat-floor kernel, SContact form)
    wheel_cons, chassis_cons = ct.robot_floor_contacts(k)
    for c in wheel_cons:
        scon.append(SContact((c.pos[0], c.pos[1], c.pos[2]), c.dist,
                             c.include, FLOOR_FRAME, CHAINS[c.body], (),
                             com_r, com_r, p.wheel_contact))
    for c in chassis_cons:
        scon.append(SContact((c.pos[0], c.pos[1], c.pos[2]), c.dist,
                             c.include, FLOOR_FRAME, CHAINS[0], (),
                             com_r, com_r, p.chassis_contact))
    # wall contacts (step._wall_sets semantics: -J(robot) rows)
    ch_prm = replace(p.wall_contact, invweight=CH_INVW)
    w_prm = replace(p.wall_contact, invweight=W_INVW)
    for center, half in p.walls:
        cw = tuple(float(x) for x in center)
        hw = tuple(float(x) for x in half)
        # chassis vs wall: normal chassis -> wall; J = -J(chassis)
        for pos, dist, inc, frame in box_box_scalar(
                chassis_center, k["R"], CHASSIS_HALF, cw, EYE3, hw, 0.0):
            scon.append(SContact(pos, dist, inc, frame, (), CHAINS[0],
                                 com_r, com_r, ch_prm))
        # wheels vs wall: box_cylinder(box=wall, cyl=wheel); J = -J(wheel)
        for wheel, xw in ((1, k["xpos_l"]), (2, k["xpos_r"])):
            for pos, dist, inc, frame in box_cylinder_scalar(
                    cw, EYE3, hw, xw, axis, 0.034, 0.013, 0.0):
                scon.append(SContact(pos, dist, inc, frame, (),
                                     CHAINS[wheel], com_r, com_r, w_prm))

    rows = build_rows14_scalar(scon, qvel, k["cdof"], [com_r] * NV, nv=NV)

    cost_ws = sv.cost(state.warmstart, a_smooth, M, rows, NV)
    cost_sm = sv.cost(a_smooth, a_smooth, M, rows, NV)
    better = cost_ws < cost_sm
    a0 = tuple(jnp.where(better, w, s)
               for w, s in zip(state.warmstart, a_smooth))
    qacc = sv.solve_newton(a0, a_smooth, M, rows, NV,
                           iters=p.newton_iters, ls_iters=p.ls_iters)
    _, qfrc_con = sv.constraint_forces(qacc, rows, NV)
    qfrc_total = tuple(qfrc_smooth[j] + qfrc_con[j] for j in range(NV))

    h = p.timestep
    MH = [list(r) for r in M]
    MH[6][6] = MH[6][6] - h * (-p.joint_damping + dfdv[0])
    MH[7][7] = MH[7][7] - h * (-p.joint_damping + dfdv[1])
    LH = chol_factor(tuple(tuple(r) for r in MH), NV)
    dv = chol_solve(LH, qfrc_total, NV)
    qvel_n = tuple(state.qvel[j] + h * dv[j] for j in range(NV))
    new_pos = (qpos[0] + h * qvel_n[0], qpos[1] + h * qvel_n[1],
               qpos[2] + h * qvel_n[2])
    quat = quat_integrate((qpos[3], qpos[4], qpos[5], qpos[6]),
                          (qvel_n[3], qvel_n[4], qvel_n[5]), h)
    new_qpos = new_pos + quat + (qpos[7] + h * qvel_n[6],
                                 qpos[8] + h * qvel_n[7])
    return PhysState(qpos=new_qpos, qvel=qvel_n, warmstart=qacc)


# --------------------------------------------------------------- kernel

def _kernel_walls(qpos_ref, qvel_ref, ws_ref, ctrl_ref,
                  qpos_out, qvel_out, ws_out, *, params, frame_skip):
    qpos = tuple(qpos_ref[i, :] for i in range(9))
    qvel = tuple(qvel_ref[i, :] for i in range(8))
    ws = tuple(ws_ref[i, :] for i in range(8))
    ctrl = (ctrl_ref[0, :], ctrl_ref[1, :])
    state = PhysState(qpos=qpos, qvel=qvel, warmstart=ws)

    def body(_, st):
        return substep_walls_scalar(st, ctrl, params)

    state = lax.fori_loop(0, frame_skip, body, state)
    for i in range(9):
        qpos_out[i, :] = state.qpos[i]
    for i in range(8):
        qvel_out[i, :] = state.qvel[i]
        ws_out[i, :] = state.warmstart[i]


@functools.partial(jax.jit,
                   static_argnames=("params", "frame_skip", "interpret",
                                    "block_b"))
def control_step_walls_pallas(qpos, qvel, ws, ctrl, params,
                              frame_skip=250, interpret=False, block_b=None):
    """Batched fused control step for wall scenes.

    qpos (B,9), qvel (B,8), ws (B,8), ctrl (B,2) -> (qpos', qvel', ws')."""
    B = qpos.shape[0]
    bb = block_b or BLOCK_B
    nb = max(1, -(-B // bb))
    Bp = nb * bb

    def pad(x):
        return jnp.pad(x, ((0, Bp - B), (0, 0))) if Bp != B else x

    args = [pad(qpos).T, pad(qvel).T, pad(ws).T, pad(ctrl).T]
    specs = [
        pl.BlockSpec((9, bb), lambda i: (0, i)),
        pl.BlockSpec((8, bb), lambda i: (0, i)),
        pl.BlockSpec((8, bb), lambda i: (0, i)),
        pl.BlockSpec((2, bb), lambda i: (0, i)),
    ]
    out_specs = [
        pl.BlockSpec((9, bb), lambda i: (0, i)),
        pl.BlockSpec((8, bb), lambda i: (0, i)),
        pl.BlockSpec((8, bb), lambda i: (0, i)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((9, Bp), qpos.dtype),
        jax.ShapeDtypeStruct((8, Bp), qpos.dtype),
        jax.ShapeDtypeStruct((8, Bp), qpos.dtype),
    ]
    kern = functools.partial(_kernel_walls, params=params,
                             frame_skip=frame_skip)
    qp, qv, w = pl.pallas_call(
        kern, grid=(nb,), in_specs=specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*args)
    return qp.T[:B], qv.T[:B], w.T[:B]


# ------------------------------------------------------------- integration

@functools.lru_cache(maxsize=None)
def make_vmappable_control_step_walls(params, frame_skip=250,
                                      interpret=False):
    """(state, ctrl, friction) -> state whose vmap rule runs the fused wall
    kernel; unbatched calls keep the XLA path.  Wall scenes have no dynamic
    friction (friction must be None — EnvMove05 passes None)."""
    from . import step as st

    @jax.custom_batching.custom_vmap
    def cs(state, ctrl, friction):
        del friction  # wall scenes: static friction only
        return st.control_step(state, ctrl, params, frame_skip=frame_skip)

    @cs.def_vmap
    def cs_vmap(axis_size, in_batched, state, ctrl, friction):
        # Leaves may arrive unbatched (e.g. a shared scalar warmstart from a
        # freshly-reset state); broadcast each to the batch before stacking.
        def stack(leaves):
            return jnp.stack(
                [jnp.broadcast_to(l, (axis_size,)) for l in leaves], axis=-1)

        qpos = stack(state.qpos)
        qvel = stack(state.qvel)
        ws = stack(state.warmstart)
        ctrl_a = stack(ctrl)
        qp, qv, w = control_step_walls_pallas(qpos, qvel, ws, ctrl_a, params,
                                              frame_skip=frame_skip,
                                              interpret=interpret)
        out = PhysState(qpos=tuple(qp[:, i] for i in range(9)),
                        qvel=tuple(qv[:, i] for i in range(8)),
                        warmstart=tuple(w[:, i] for i in range(8)))
        return out, jax.tree.map(lambda _: True, out)

    return cs

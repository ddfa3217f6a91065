"""Fused pallas control step: 250 physics substeps in ONE TPU kernel.

Why: XLA compiles the scalar-unrolled substep into many small VPU kernels
per substep, each round-tripping HBM — measured ~1.08 ms per (4096,)-lane
substep on a v5-lite (≈15k env-steps/s end to end). Fusing the whole
250-substep control step into a single pallas kernel keeps every
intermediate in VMEM/registers: the batch axis lies along the 128-wide lane
dimension, every physics quantity is a (BLOCK_B,) vector, and the contact
rows stack to (R, BLOCK_B) — the natural sublane×lane layout.

The kernel TRACES the same verified physics code as the XLA path — fk /
CRB / RNE / actuation / Cholesky from robot_core+slin, the scalar-form
contacts (contacts.plane_cylinder / plane_box), the pre-array-form scalar
row builder (contact_rows_scalar below), and the Newton solver (solver.py,
whose R-axis reductions are axis-explicit for exactly this reason) — so
parity is inherited, not re-proven.

Integration: `control_step_pallas(qpos, qvel, ws, ctrl, friction, params)`
takes batch-leading arrays; `make_vmappable_control_step(params)` wraps it
in a jax.custom_batching.custom_vmap so the per-env `env.step` code path is
unchanged and VecEnv's vmap dispatches to the fused kernel.

8-dof robot-only scenes (env01/env02). The 14-dof block step keeps the XLA
path for now.
"""

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import robot_core as rc
from . import contacts as ct
from . import solver as sv
from .robot_core import NV
from .slin import chol_factor, chol_solve, quat_integrate, vadd, mvmul, mcol
from .step import PhysState

# Jacobian chains per body id (free joint 0-5, wheel hinges 6/7)
CHAINS = {0: (0, 1, 2, 3, 4, 5),
          1: (0, 1, 2, 3, 4, 5, 6),
          2: (0, 1, 2, 3, 4, 5, 7)}

NORMAL = ct.NORMAL
T1 = ct.T1
T2 = ct.T2

BLOCK_B = 1024     # sweep on v5-lite: 1024 best (147k steps/s); 4096 OOMs VMEM


def contact_rows_scalar(contacts, p, cdof, com, qvel, nv, friction=None):
    """Scalar-form pyramidal efc rows (pre-array-form builder): per-contact
    scalar math, stacked to (R, ...) at the end — traces inside pallas."""
    rows_J, arefs, Ds, masks = [], [], [], []
    for c in contacts:
        prm = p.wheel_contact if c.body in (1, 2) else p.chassis_contact
        mu1, mu2 = prm.friction
        if friction is not None and c.body in (1, 2):
            mu1 = jnp.maximum(friction, sv.MJ_MINMU)
            mu2 = mu1
        tc, dr = prm.solref
        dmax = max(prm.solimp[0], prm.solimp[1])
        imp = sv.impedance(c.dist, prm.solimp)
        k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
        b = 2.0 / (dmax * tc)
        chain = CHAINS[c.body]
        pt = c.pos
        Jn = [0.0] * nv
        Jt1 = [0.0] * nv
        Jt2 = [0.0] * nv
        rel = (pt[0] - com[0], pt[1] - com[1], pt[2] - com[2])
        for j in chain:
            ang = cdof[j][:3]
            lin = cdof[j][3:]
            vx = lin[0] + ang[1] * rel[2] - ang[2] * rel[1]
            vy = lin[1] + ang[2] * rel[0] - ang[0] * rel[2]
            vz = lin[2] + ang[0] * rel[1] - ang[1] * rel[0]
            Jn[j] = NORMAL[0] * vx + NORMAL[1] * vy + NORMAL[2] * vz
            Jt1[j] = T1[0] * vx + T1[1] * vy + T1[2] * vz
            Jt2[j] = T2[0] * vx + T2[1] * vy + T2[2] * vz
        inc = jnp.where(c.include, 1.0, 0.0)
        for mu, Jt in ((mu1, Jt1), (mu2, Jt2)):
            dA = 2.0 * mu * mu * (1.0 + mu * mu) * prm.invweight
            R = jnp.maximum(sv.MJ_MINVAL, (1.0 - imp) / imp * dA)
            for sgn in (1.0, -1.0):
                row = tuple(Jn[j] + sgn * mu * Jt[j] for j in range(nv))
                vel = sum(row[j] * qvel[j] for j in chain)
                arefs.append(-b * vel - k * imp * c.dist)
                Ds.append(jnp.ones_like(imp) / R)
                masks.append(inc)
                rows_J.append(row)
    Jc = tuple(jnp.stack([r[j] if hasattr(r[j], "shape") else
                          jnp.zeros_like(arefs[0]) + r[j]
                          for r in rows_J]) for j in range(nv))
    return sv.EfcRows(Jc=Jc, aref=jnp.stack(arefs), D=jnp.stack(Ds),
                      mask=jnp.stack(masks))


def substep_scalar(state: PhysState, ctrl, p, friction=None):
    """step.substep with the scalar contact/row path (kernel-traceable)."""
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

    wheel_cons, chassis_cons = ct.robot_floor_contacts(k)
    contacts = tuple(wheel_cons) + tuple(chassis_cons)
    fric = friction if p.dynamic_friction else None
    rows = contact_rows_scalar(contacts, p, k["cdof"], k["com"], qvel, NV,
                               friction=fric)

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
    qvel = tuple(state.qvel[j] + h * dv[j] for j in range(NV))
    new_pos = (qpos[0] + h * qvel[0], qpos[1] + h * qvel[1],
               qpos[2] + h * qvel[2])
    quat = quat_integrate((qpos[3], qpos[4], qpos[5], qpos[6]),
                          (qvel[3], qvel[4], qvel[5]), h)
    new_qpos = new_pos + quat + (qpos[7] + h * qvel[6], qpos[8] + h * qvel[7])
    return PhysState(qpos=new_qpos, qvel=qvel, warmstart=qacc)


def _kernel(qpos_ref, qvel_ref, ws_ref, ctrl_ref, fric_ref,
            qpos_out, qvel_out, ws_out, *, params, frame_skip, use_friction):
    qpos = tuple(qpos_ref[i, :] for i in range(9))
    qvel = tuple(qvel_ref[i, :] for i in range(8))
    ws = tuple(ws_ref[i, :] for i in range(8))
    ctrl = (ctrl_ref[0, :], ctrl_ref[1, :])
    fric = fric_ref[0, :] if use_friction else None
    state = PhysState(qpos=qpos, qvel=qvel, warmstart=ws)

    def body(_, st):
        return substep_scalar(st, ctrl, params, fric)

    state = lax.fori_loop(0, frame_skip, body, state)
    for i in range(9):
        qpos_out[i, :] = state.qpos[i]
    for i in range(8):
        qvel_out[i, :] = state.qvel[i]
        ws_out[i, :] = state.warmstart[i]


@functools.partial(jax.jit,
                   static_argnames=("params", "frame_skip", "interpret",
                                    "block_b"))
def control_step_pallas(qpos, qvel, ws, ctrl, friction, params,
                        frame_skip=250, interpret=False, block_b=None):
    """Batched fused control step.

    qpos (B,9), qvel (B,8), ws (B,8), ctrl (B,2), friction (B,) or None.
    Returns (qpos', qvel', ws') with the same batch-leading layout.
    """
    B = qpos.shape[0]
    BLOCK_B = block_b or globals()["BLOCK_B"]
    nb = max(1, -(-B // BLOCK_B))
    Bp = nb * BLOCK_B
    use_friction = friction is not None

    def pad(x):
        return jnp.pad(x, ((0, Bp - B), (0, 0))) if Bp != B else x

    # lane-major layout: component rows x batch lanes
    args = [pad(qpos).T, pad(qvel).T, pad(ws).T, pad(ctrl).T]
    fr = friction if use_friction else jnp.zeros((B,), qpos.dtype)
    fr = jnp.pad(fr, (0, Bp - B))[None, :] if Bp != B else fr[None, :]
    args.append(fr)

    specs = [
        pl.BlockSpec((9, BLOCK_B), lambda i: (0, i)),
        pl.BlockSpec((8, BLOCK_B), lambda i: (0, i)),
        pl.BlockSpec((8, BLOCK_B), lambda i: (0, i)),
        pl.BlockSpec((2, BLOCK_B), lambda i: (0, i)),
        pl.BlockSpec((1, BLOCK_B), lambda i: (0, i)),
    ]
    out_specs = [
        pl.BlockSpec((9, BLOCK_B), lambda i: (0, i)),
        pl.BlockSpec((8, BLOCK_B), lambda i: (0, i)),
        pl.BlockSpec((8, BLOCK_B), lambda i: (0, i)),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((9, Bp), qpos.dtype),
        jax.ShapeDtypeStruct((8, Bp), qpos.dtype),
        jax.ShapeDtypeStruct((8, Bp), qpos.dtype),
    ]
    kern = functools.partial(_kernel, params=params, frame_skip=frame_skip,
                             use_friction=use_friction)
    qp, qv, w = pl.pallas_call(
        kern, grid=(nb,), in_specs=specs, out_specs=out_specs,
        out_shape=out_shape, interpret=interpret)(*args)
    return qp.T[:B], qv.T[:B], w.T[:B]


# ------------------------------------------------------------- integration

@functools.lru_cache(maxsize=None)
def make_vmappable_control_step(params, frame_skip=250, interpret=False):
    """A (state, ctrl, friction) -> state function whose vmap rule runs the
    fused pallas kernel. Unbatched calls fall back to the XLA path."""
    from . import step as st

    @jax.custom_batching.custom_vmap
    def cs(state, ctrl, friction):
        return st.control_step(state, ctrl, params, friction=friction,
                               frame_skip=frame_skip)

    @cs.def_vmap
    def cs_vmap(axis_size, in_batched, state, ctrl, friction):
        st_b, ctrl_b, fric_b = in_batched
        # state/ctrl must be batched; friction batched or absent
        qpos = jnp.stack(state.qpos, axis=-1)     # (B, 9)
        qvel = jnp.stack(state.qvel, axis=-1)
        ws = jnp.stack(state.warmstart, axis=-1)
        ctrl_a = jnp.stack(ctrl, axis=-1)
        # friction may be per-env (batched) OR a single unbatched scalar —
        # an unbatched value must be broadcast, never dropped (dropping it
        # would silently run the kernel with the params' static friction)
        fric = friction
        if fric is not None and not all(jax.tree.leaves(fric_b)):
            fric = jnp.broadcast_to(fric, (axis_size,))
        qp, qv, w = control_step_pallas(qpos, qvel, ws, ctrl_a, fric, params,
                                        frame_skip=frame_skip,
                                        interpret=interpret)
        out = PhysState(qpos=tuple(qp[:, i] for i in range(9)),
                        qvel=tuple(qv[:, i] for i in range(8)),
                        warmstart=tuple(w[:, i] for i in range(8)))
        return out, jax.tree.map(lambda _: True, out)

    return cs

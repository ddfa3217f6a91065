"""Fused pallas control step: parity with the XLA path (interpret mode on
CPU — the TPU lowering is exercised by bench/training on the chip)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.envs.vector import VecEnv
from balance_robot_tpu.physics import robot_core as rc
from balance_robot_tpu.physics import step as st
from balance_robot_tpu.physics import pallas_step as ps


def test_scalar_substep_equals_array_path():
    """The kernel-traceable scalar contact/row path must match the array-form
    step bit-for-bit (same formulas, different construction)."""
    rng = np.random.default_rng(0)
    for _ in range(4):
        qpos = np.array([0, 0, 0, 1, 0, 0, 0, 0, 0], np.float32)
        qpos[:2] = rng.normal(size=2) * 0.01
        q = rng.normal(size=4).astype(np.float32)
        qpos[3:7] = q / np.linalg.norm(q)
        qvel = (rng.normal(size=8) * [.1, .1, .1, 1, 1, 1, 5, 5]).astype(
            np.float32)
        ctrl = rng.normal(size=2).astype(np.float32) * 10
        s = st.PhysState(tuple(jnp.asarray(qpos)), tuple(jnp.asarray(qvel)),
                         (jnp.float32(0.0),) * 8)
        ref = st.substep(s, tuple(jnp.asarray(ctrl)), rc.ENV01_PARAMS)
        out = ps.substep_scalar(s, tuple(jnp.asarray(ctrl)), rc.ENV01_PARAMS)
        np.testing.assert_allclose(
            np.asarray(jnp.stack(out.qpos)), np.asarray(jnp.stack(ref.qpos)),
            rtol=0, atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(jnp.stack(out.qvel)), np.asarray(jnp.stack(ref.qvel)),
            rtol=0, atol=1e-4)


# Env01-v2 runs in the default gate (small shapes: interpret-mode pallas is
# ~1 s per substep-batch on CPU); the Env02 variant — same kernel, different
# contact params — lives in the slow tier with the other interpret parity
# tests.
def _vecenv_pallas_matches_xla(env_id, B=4, steps=2):
    envA = brt.make(env_id)
    envB = brt.make(env_id).use_pallas_physics(interpret=True)
    vA, vB = VecEnv(envA, B), VecEnv(envB, B)
    sA, _ = jax.jit(vA.reset)(jax.random.PRNGKey(0))
    sB, _ = jax.jit(vB.reset)(jax.random.PRNGKey(0))
    stepA, stepB = jax.jit(vA.step), jax.jit(vB.step)
    rng = np.random.default_rng(2)
    for t in range(steps):
        a = jnp.asarray(rng.uniform(-1, 1, (B, 2)), jnp.float32)
        sA, outA = stepA(sA, a)
        sB, outB = stepB(sB, a)
        np.testing.assert_array_equal(np.asarray(outA.obs),
                                      np.asarray(outB.obs))
        np.testing.assert_array_equal(np.asarray(outA.reward),
                                      np.asarray(outB.reward))


def test_vecenv_pallas_matches_xla():
    _vecenv_pallas_matches_xla("Env01-v2")


@pytest.mark.slow
def test_vecenv_pallas_matches_xla_env02():
    _vecenv_pallas_matches_xla("Env02-v1", B=8, steps=3)


def test_pallas_pads_ragged_batch():
    """B not a multiple of BLOCK_B must pad and slice correctly."""
    B = 5
    rng = np.random.default_rng(1)
    qpos = np.tile([0, 0, 0, 1, 0, 0, 0, 0, 0], (B, 1)).astype(np.float32)
    qpos[:, :2] = rng.normal(size=(B, 2)) * 0.01
    qvel = np.zeros((B, 8), np.float32)
    ws = np.zeros((B, 8), np.float32)
    ctrl = np.ones((B, 2), np.float32)
    qp, qv, w = ps.control_step_pallas(
        jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ws),
        jnp.asarray(ctrl), None, rc.ENV01_PARAMS, frame_skip=3,
        interpret=True)
    assert qp.shape == (B, 9) and qv.shape == (B, 8) and w.shape == (B, 8)
    assert np.isfinite(np.asarray(qp)).all()


def test_vmap_rule_broadcasts_unbatched_friction(monkeypatch):
    """The custom_vmap rule must BROADCAST an unbatched friction scalar to
    the batch, never drop it (dropping silently ran the kernel with the
    params' static friction)."""
    from balance_robot_tpu.physics.step import PhysState

    seen = {}

    def fake_kernel(qpos, qvel, ws, ctrl, fric, params, frame_skip=250,
                    interpret=False):
        seen["fric"] = fric
        return qpos, qvel, ws

    monkeypatch.setattr(ps, "control_step_pallas", fake_kernel)
    cs = ps.make_vmappable_control_step(rc.ENV01_PARAMS, frame_skip=7)
    B = 3
    state = PhysState(qpos=tuple(jnp.zeros(B) for _ in range(9)),
                      qvel=tuple(jnp.zeros(B) for _ in range(8)),
                      warmstart=tuple(jnp.zeros(B) for _ in range(8)))
    ctrl = (jnp.zeros(B), jnp.zeros(B))
    # unbatched scalar friction: must reach the kernel broadcast to (B,)
    jax.vmap(cs, in_axes=(0, 0, None))(state, ctrl, jnp.float32(0.6))
    assert seen["fric"] is not None and seen["fric"].shape == (B,)
    np.testing.assert_allclose(np.asarray(seen["fric"]),
                               np.full(B, 0.6, np.float32))
    # per-env friction passes through unchanged
    jax.vmap(cs, in_axes=(0, 0, 0))(state, ctrl,
                                    jnp.asarray([0.5, 0.6, 0.7]))
    assert seen["fric"].shape == (B,)
    # absent friction stays absent (static-params path)
    jax.vmap(cs, in_axes=(0, 0, None))(state, ctrl, None)
    assert seen["fric"] is None


def test_fast_solver_rebuilds_pallas_wrapper():
    """use_pallas_physics().use_fast_solver() must not leave a stale kernel:
    the cached pallas control step bakes in the params it was built from,
    so switching solver grade afterwards has to rebuild it."""
    env = brt.make("Env01-v1")
    env.use_pallas_physics(interpret=True)
    cs_before = env._pallas_cs
    env.use_fast_solver()
    assert env._pallas_cs is not cs_before
    # the lru-cached factory returns the wrapper for the CURRENT params
    assert env._pallas_cs is ps.make_vmappable_control_step(
        env.params, interpret=True)

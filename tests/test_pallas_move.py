"""Wall-scene fused pallas step (physics/pallas_move.py): parity with the
XLA wall path (step._wall_sets) in interpret mode, and the EnvMove05 env
step routed through `use_pallas_physics`.

The scalar colliders themselves (box-box manifold, box-cylinder) are
bit-parity-tested against the array path in test_pallas_block.py; the wall
substep additionally gets a real-MuJoCo float64 oracle in
test_physics_parity.py (envMove05_v1.xml corridor)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from balance_robot_tpu.physics import step as st
from balance_robot_tpu.physics import pallas_move as pm
from balance_robot_tpu.physics.step import PhysState
from balance_robot_tpu.envs.move import MOVE05_PARAMS


def _states(B, rng):
    """Robot near the +x corridor wall (inner face x=0.24), some lanes
    overlapping it, sliding wall-ward."""
    qpos = np.tile([0.2, 0.0, 0.0, 1, 0, 0, 0, 0, 0], (B, 1)).astype(
        np.float32)
    qpos[:, 0] = np.linspace(0.18, 0.21, B)
    qpos[:, 1] = rng.normal(size=B) * 0.02
    qvel = np.zeros((B, 8), np.float32)
    qvel[:, 0] = 2.0
    qvel[:, 6] = rng.normal(size=B) * 5
    qvel[:, 7] = rng.normal(size=B) * 5
    return qpos, qvel


def test_pallas_move_matches_xla_wall_path():
    """Interpret-mode fused kernel vs the XLA wall path over 3 substeps
    spanning wall contact.  The two are differently-structured programs
    (array rows.build_rows vs scalar build_rows14_scalar reductions), so
    the check is tight-tolerance, not bitwise (same rationale as
    test_env03_pallas_env_step)."""
    B = 4
    rng = np.random.default_rng(0)
    qpos, qvel = _states(B, rng)
    ws = np.zeros((B, 8), np.float32)
    ctrl = rng.normal(size=(B, 2)).astype(np.float32) * 5
    FS = 3

    def xla_one(qp, qv, w, c):
        s = PhysState(qpos=tuple(qp), qvel=tuple(qv), warmstart=tuple(w))
        out = st.control_step(s, (c[0], c[1]), MOVE05_PARAMS, frame_skip=FS)
        return jnp.stack(out.qpos), jnp.stack(out.qvel)

    xq, xv = jax.jit(jax.vmap(xla_one))(qpos, qvel, ws, ctrl)
    kq, kv, _ = pm.control_step_walls_pallas(
        jnp.asarray(qpos), jnp.asarray(qvel), jnp.asarray(ws),
        jnp.asarray(ctrl), MOVE05_PARAMS, frame_skip=FS, interpret=True,
        block_b=8)
    np.testing.assert_allclose(np.asarray(kq), np.asarray(xq),
                               atol=1e-7, rtol=0)
    np.testing.assert_allclose(np.asarray(kv), np.asarray(xv),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_move05_env_step_pallas():
    """EnvMove05 env.step through use_pallas_physics (interpret) vs the XLA
    path — the full hierarchical step incl. the int8 inner policy."""
    import balance_robot_tpu as brt
    from balance_robot_tpu.envs.vector import VecEnv
    envA = brt.make("EnvMove05-v1")
    envB = brt.make("EnvMove05-v1").use_pallas_physics(interpret=True)
    B = 4
    vA, vB = VecEnv(envA, B), VecEnv(envB, B)
    sA, _ = jax.jit(vA.reset)(jax.random.PRNGKey(0))
    sB, _ = jax.jit(vB.reset)(jax.random.PRNGKey(0))
    a = jnp.tile(jnp.asarray([0.4, 0.1]), (B, 1))
    for _ in range(2):
        sA, outA = jax.jit(vA.step)(sA, a)
        sB, outB = jax.jit(vB.step)(sB, a)
    np.testing.assert_allclose(np.asarray(outA.obs), np.asarray(outB.obs),
                               atol=1e-5, rtol=0)
    np.testing.assert_allclose(np.asarray(outA.reward),
                               np.asarray(outB.reward), atol=1e-5, rtol=0)

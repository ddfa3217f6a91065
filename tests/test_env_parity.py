"""Trajectory parity: our functional Env01 vs the reference Gymnasium env.

Drives the real reference env (mounted read-only at /root/reference, running
real MuJoCo) and our JAX env from identical post-reset states through an
identical action sequence, asserting per-step obs / reward / termination
agreement in float64.  This replaces the reference's manual A/B testing
(SURVEY §4) with an automated gate.
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

mujoco = pytest.importorskip("mujoco")
gymnasium = pytest.importorskip("gymnasium")

sys.path.insert(0, "/root/reference/src")


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)


@pytest.fixture(scope="module")
def ref_env():
    import balance_robot  # noqa: F401  (registration side effect)
    env = gymnasium.make("Env01-v1")
    yield env
    env.close()


def test_env01_v1_trajectory(ref_env, x64):
    from balance_robot_tpu.envs.env01 import Env01V1

    # The reference reset draws its orientation from the UNSEEDED global
    # np.random (env01_v1.py:46-49); seed it so the trajectory under test is
    # deterministic across runs.
    np.random.seed(123)
    obs0, _ = ref_env.reset(seed=42)
    d = ref_env.unwrapped.data
    qpos0, qvel0 = d.qpos.copy(), d.qvel.copy()

    env = Env01V1()
    state = env.state_from_qpos(jnp.float64(qpos0), jnp.float64(qvel0))
    step = jax.jit(env.step)

    rng = np.random.default_rng(7)
    T = 40
    actions = rng.uniform(-1, 1, size=(T, 2))
    for t in range(T):
        ref_obs, ref_r, ref_term, ref_trunc, _ = ref_env.step(
            actions[t].astype(np.float32))
        state, obs, r, term, trunc = step(state, jnp.float64(actions[t]))
        obs = np.asarray(obs, dtype=np.float64)
        # obs emitted as float32 in both stacks; compare at f32 resolution.
        # pitch_dot (obs[1]) finite-differences two nearly-equal pitches over
        # dt=5ms: MuJoCo's Newton stops at tolerance 1e-8 while ours runs
        # fixed iterations, so qpos agrees to ~1e-6 along the trajectory and
        # the (p_t - p_{t-1})/0.005 cancellation amplifies that ×200 → allow
        # 5e-3 on that slot only; every other slot holds 1e-3 (and the raw
        # qpos gate below holds 1e-6).
        slot_atol = np.array([1e-3, 5e-3, 1e-3, 1e-3, 1e-3, 1e-3])
        assert np.all(np.abs(obs - ref_obs) <= slot_atol), (
            f"obs mismatch at step {t}: ours={obs} ref={ref_obs} "
            f"diff={obs - ref_obs}")
        # reward depends on wheel qvels (dv term), which carry the same
        # solver-truncation drift as qpos (~1e-4 by late trajectory)
        assert abs(float(r) - ref_r) < 1e-3, f"reward mismatch at step {t}"
        assert bool(term) == ref_term, f"termination mismatch at step {t}"
        # raw physics state: per-step solver truncation drift is ~2e-10,
        # compounding along the trajectory
        np.testing.assert_allclose(
            np.asarray(jnp.stack(state.phys.qpos)),
            ref_env.unwrapped.data.qpos, atol=1e-6,
            err_msg=f"qpos diverged at step {t}")
        if ref_term:
            break


def test_env01_v1_reset_distribution(x64):
    """Reset draws: qpos jitter, scrambled-quaternion orientation, zero qvel,
    z forced to 0 (env01_v1.py:39-58)."""
    from balance_robot_tpu.envs.env01 import Env01V1
    env = Env01V1()
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    qpos = np.asarray(jnp.stack(state.phys.qpos))
    assert qpos[2] == 0.0
    assert np.all(np.abs(qpos[:2]) <= 0.01)
    q = qpos[3:7]
    assert abs(np.linalg.norm(q) - 1.0) < 0.2   # raw scrambled quat, ~unit
    assert np.all(np.asarray(jnp.stack(state.phys.qvel)) == 0.0)
    assert obs.shape == (6,) and obs.dtype == jnp.float32
    # pitch_dot slot is 0 on reset (dt <= 0 in get_pitch_dot_alt)
    assert float(obs[1]) == 0.0

"""Auxiliary-subsystem tests (SURVEY §5): preemption checkpoint/resume,
checkify NaN guards, profiling counters."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.train.ppo import PPO, PPOConfig
from balance_robot_tpu.train import checkpoint as ckpt


def test_train_state_roundtrip(tmp_path):
    env = brt.make("Env01-v1")
    cfg = PPOConfig(n_envs=4, n_steps=4, minibatch_size=8, n_epochs=1)
    ppo = PPO(env, cfg)
    ts = ppo.init(jax.random.PRNGKey(0))
    ts, _ = ppo.iteration(ts)

    ckpt.save_train_state(tmp_path / "resume_state.npz", ts, steps=16)
    ts_like = ppo.init(jax.random.PRNGKey(99))
    ts2, steps = ckpt.load_train_state(tmp_path / "resume_state.npz", ts_like)
    assert steps == 16
    for a, b in zip(jax.tree.leaves(ts), jax.tree.leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # resumed state continues identically to the uninterrupted one
    ts_c, m1 = ppo.iteration(ts)
    ts_r, m2 = ppo.iteration(ts2)
    np.testing.assert_allclose(
        np.asarray(jax.tree.leaves(ts_c.params)[0]),
        np.asarray(jax.tree.leaves(ts_r.params)[0]), rtol=0, atol=0)


def test_train_state_config_mismatch(tmp_path):
    env = brt.make("Env01-v1")
    ppo = PPO(env, PPOConfig(n_envs=4, n_steps=4, minibatch_size=8,
                             n_epochs=1))
    ts = ppo.init(jax.random.PRNGKey(0))
    ckpt.save_train_state(tmp_path / "s.npz", ts)
    bad = ppo.init(jax.random.PRNGKey(0))._replace(
        env_states=None)  # different structure -> fewer leaves
    with pytest.raises(ValueError, match="configs must match"):
        ckpt.load_train_state(tmp_path / "s.npz", bad)


def test_checked_step_clean_and_poisoned():
    from balance_robot_tpu.utils.guards import checked_step
    env = brt.make("Env01-v1")
    state, obs = jax.jit(env.reset)(jax.random.PRNGKey(0))
    step = checked_step(env)
    err, (state2, obs2, r, term, trunc) = step(state, jnp.zeros(2))
    err.throw()  # clean state: no error
    # poison qvel -> the guard must name the failing check
    qvel = list(state.phys.qvel)
    qvel[0] = jnp.float32(jnp.nan)
    bad = state._replace(phys=state.phys._replace(qvel=tuple(qvel)))
    err, _ = step(bad, jnp.zeros(2))
    with pytest.raises(Exception, match="non-finite"):
        err.throw()


def test_assert_finite_tree():
    from balance_robot_tpu.utils.guards import assert_finite_tree
    assert_finite_tree({"w": jnp.ones(3)}, "params")
    with pytest.raises(FloatingPointError, match="params"):
        assert_finite_tree({"w": jnp.array([1.0, jnp.nan])}, "params")


def test_profiling_counters():
    from balance_robot_tpu.utils.profiling import Timer, Throughput
    t = Timer()
    x = jnp.zeros(8)
    with t("phase", sync=x):
        x = x + 1
    rep = t.report()
    assert rep["phase"]["n"] == 1 and rep["phase"]["total_s"] >= 0
    tp = Throughput()
    tp.add(100)
    assert tp.rate() > 0

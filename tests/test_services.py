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


def test_distributed_init_order():
    """parallel.distributed.initialize must call jax.distributed.initialize
    BEFORE any backend-touching JAX API (jax.process_count() and friends
    initialize the local backend, after which multi-host init silently
    degrades to per-host single-process runs — the round-1 bug)."""
    import subprocess
    import sys

    script = r"""
import os
os.environ["BRT_MULTIHOST"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")

state = {}

def probe(**kwargs):
    # Record whether any XLA backend exists at the moment of the call.
    from jax._src import xla_bridge as xb
    state["called"] = True
    state["backends"] = dict(getattr(xb, "_backends", {}))

jax.distributed.initialize = probe
from balance_robot_tpu.parallel import distributed
distributed.initialize()
assert state.get("called"), "jax.distributed.initialize was never called"
assert not state["backends"], (
    "XLA backend was initialized before jax.distributed.initialize: "
    f"{list(state['backends'])}")
assert distributed.is_initialized()
# idempotent: a second call must not re-invoke
state["called"] = False
distributed.initialize()
assert not state["called"]
print("INIT_ORDER_OK")
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True,
                         env={**__import__("os").environ,
                              "JAX_PLATFORMS": "cpu"})
    assert "INIT_ORDER_OK" in out.stdout, out.stderr


def test_distributed_single_host_noop():
    """Without multi-host env signals, initialize() must not attempt a
    coordinator handshake (single-host no-op)."""
    import subprocess
    import sys

    script = r"""
import os
for v in ("BRT_MULTIHOST", "JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
          "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES"):
    os.environ.pop(v, None)
import jax
jax.config.update("jax_platforms", "cpu")
called = []
jax.distributed.initialize = lambda **kw: called.append(kw)
from balance_robot_tpu.parallel import distributed
distributed.initialize()
assert not called, "initialize() attempted a coordinator handshake"
assert distributed.is_initialized()
print("SINGLE_HOST_OK")
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True)
    assert "SINGLE_HOST_OK" in out.stdout, out.stderr


def test_distributed_explicit_disable():
    """BRT_MULTIHOST=0 explicitly disables the coordinator handshake even
    when cluster env vars are present (same 0-disables convention as
    BRT_COMPILE_CACHE; '0' used to be truthy and force a hang)."""
    import subprocess
    import sys

    script = r"""
import os
os.environ["BRT_MULTIHOST"] = "0"
os.environ["JAX_COORDINATOR_ADDRESS"] = "10.0.0.1:8476"
import jax
jax.config.update("jax_platforms", "cpu")
called = []
jax.distributed.initialize = lambda **kw: called.append(kw)
from balance_robot_tpu.parallel import distributed
distributed.initialize()
assert not called, "BRT_MULTIHOST=0 must disable the handshake"
assert distributed.is_initialized()
print("DISABLE_OK")
"""
    out = subprocess.run([sys.executable, "-c", script],
                         capture_output=True, text=True)
    assert "DISABLE_OK" in out.stdout, out.stderr

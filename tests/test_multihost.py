"""Two-process multi-host smoke test (SURVEY §2.2: per-host
jax.distributed.initialize + one global 'env' mesh spanning all hosts).

Runs two real OS processes, each a fake "host" with 4 virtual CPU devices,
wired together through the JAX coordination service on localhost.  This
exercises the exact path the round-1 bug broke silently: initialize() must
reach jax.distributed.initialize BEFORE the local backend exists, after
which jax.process_count() == 2 and the global device list has 8 entries.
A global psum over the 'env' mesh validates that cross-process collectives
actually run."""

import socket
import subprocess
import sys
import os

import pytest

_WORKER = r"""
import sys
port, pid = sys.argv[1], int(sys.argv[2])
import os
os.environ["BRT_MULTIHOST"] = "1"
import jax
jax.config.update("jax_platforms", "cpu")
from balance_robot_tpu.parallel import distributed
distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                       num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()
assert len(jax.local_devices()) == 4
assert distributed.is_coordinator() == (pid == 0)

import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
mesh = distributed.global_env_mesh()
assert mesh.devices.size == 8

# one global array sharded over 'env': each host contributes its local
# shards; a jitted global sum must see every shard (cross-host collective)
sharding = NamedSharding(mesh, P("env"))
global_shape = (8,)
arr = jax.make_array_from_callback(
    global_shape, sharding, lambda idx: np.arange(8.0)[idx])
total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(arr)
assert float(total) == 28.0, float(total)
print(f"WORKER_{pid}_OK", flush=True)

# --- sharded PPO iteration spanning both hosts (the code path a real pod
# runs): env batch laid over the global 'env' axis, params replicated,
# episode stats reduced ACROSS processes inside the jitted iteration.
from balance_robot_tpu.envs.env01 import Env01V1
from balance_robot_tpu.train.ppo import PPO, PPOConfig

env = Env01V1()
env.max_episode_steps = 6     # episodes complete within 12 sharded steps
n_envs = 16
cfg = PPOConfig(n_envs=n_envs, n_steps=4, minibatch_size=4, n_epochs=1)
ppo = PPO(env, cfg)
# init is deterministic from the key, so both processes hold identical
# host-local values; make_array_from_callback lifts them into ONE global
# array per leaf (env-batch leaves sharded over 'env', rest replicated)
ts = ppo.init(jax.random.PRNGKey(0))
env_s = NamedSharding(mesh, P("env"))
rep = NamedSharding(mesh, P())

def globalize(x):
    v = np.asarray(x)
    s = env_s if (v.ndim >= 1 and v.shape[0] == n_envs) else rep
    return jax.make_array_from_callback(v.shape, s, lambda i, v=v: v[i])

ts = jax.tree.map(globalize, ts)
with mesh:
    for _ in range(3):        # 12 sharded env steps > 6-step horizon
        ts, metrics = ppo.iteration(ts)
jax.block_until_ready(ts.params)
n_eps = float(metrics["n_episodes"])
assert n_eps >= float(n_envs), metrics   # every env completed >= 1 episode
assert np.isfinite(float(metrics["loss"])), metrics
assert np.isfinite(float(metrics["mean_ep_return"])), metrics
# params must remain replicated across the full 8-device global mesh
assert len(ts.params["pi_w1"].sharding.device_set) == 8
print(f"WORKER_{pid}_PPO_OK neps={n_eps}", flush=True)
"""


def test_two_process_mesh():
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    env = {**os.environ,
           "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
           "JAX_PLATFORMS": "cpu"}
    procs = [subprocess.Popen(
        [sys.executable, "-c", _WORKER, str(port), str(i)],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True, env=env)
        for i in range(2)]
    outs = []
    try:
        for i, p in enumerate(procs):
            # two simultaneous XLA:CPU compiles of the PPO iteration on this
            # 1-core host are slow; generous ceiling, typical ~2-3 min
            out, err = p.communicate(timeout=900)
            outs.append((out, err))
            assert f"WORKER_{i}_OK" in out, f"worker {i}:\n{err[-3000:]}"
            assert f"WORKER_{i}_PPO_OK" in out, f"worker {i}:\n{err[-3000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

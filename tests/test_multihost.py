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
            out, err = p.communicate(timeout=240)
            outs.append((out, err))
            assert f"WORKER_{i}_OK" in out, f"worker {i}:\n{err[-3000:]}"
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

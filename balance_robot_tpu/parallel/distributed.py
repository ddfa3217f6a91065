"""Multi-host initialization (SURVEY §2.2/§5: the reference has no
distributed backend at all; this is the TPU-native replacement).

One call per host process before any JAX computation:

    from balance_robot_tpu.parallel import distributed
    distributed.initialize()          # no-op on a single host
    mesh = distributed.global_env_mesh()

`jax.distributed.initialize()` wires the pod slice's hosts together (coord
address/process id from the TPU environment); `jax.devices()` then returns
the GLOBAL device list and the same 1-D 'env' mesh + NamedSharding code from
parallel/mesh.py spans all chips. Gradient psums ride ICI within a slice.
"""

import jax

from . import mesh as _mesh


def initialize(**kwargs):
    """Idempotent jax.distributed.initialize; no-op for single-process runs.

    On TPU pods the coordinator address, process count, and process id are
    discovered from the runtime environment; kwargs pass through for manual
    setups (coordinator_address=..., num_processes=..., process_id=...).
    """
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        # single-process (no coordinator available) — the 1-host path
        pass


def global_env_mesh(axis="env"):
    """1-D mesh over every addressable-or-remote chip in the slice."""
    return _mesh.make_mesh(jax.devices(), axis=axis)


def is_coordinator():
    return jax.process_index() == 0

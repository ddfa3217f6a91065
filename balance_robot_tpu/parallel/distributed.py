"""Multi-host initialization (SURVEY §2.2/§5: the reference has no
distributed backend at all; this is the TPU-native replacement).

One call per host process BEFORE any other JAX API:

    from balance_robot_tpu.parallel import distributed
    distributed.initialize()          # no-op on a single host
    mesh = distributed.global_env_mesh()

`jax.distributed.initialize()` wires the pod slice's hosts together (coord
address/process id from the TPU environment); `jax.devices()` then returns
the GLOBAL device list and the same 1-D 'env' mesh + NamedSharding code from
parallel/mesh.py spans all chips.  Gradient psums ride ICI within a slice.

Ordering is load-bearing: `jax.distributed.initialize` must run before the
first backend-touching JAX call (even `jax.process_count()` initializes the
local backend, after which multi-host init is impossible).  This module
therefore decides single- vs multi-host from the *environment only* — a
module-level flag plus cluster env vars — and never queries a JAX runtime
API before initializing.  Misuse (calling after the backend is already up on
a multi-host slice) fails loudly inside jax.distributed.initialize rather
than being swallowed into a silent 1-host fallback.
"""

import os

import jax

from . import mesh as _mesh

_initialized = False

# Environment signals that this process is one host of a multi-host job.
# TPU pod slices export the worker topology; explicit coordinator vars cover
# manual / GPU-style launches.  BRT_MULTIHOST=1 forces the call (e.g. for
# tests or nonstandard launchers); BRT_MULTIHOST=0 explicitly disables it
# (same convention as BRT_COMPILE_CACHE).
_COORDINATOR_VARS = (
    "JAX_COORDINATOR_ADDRESS",
    "COORDINATOR_ADDRESS",
    "MEGASCALE_COORDINATOR_ADDRESS",
)

_FALSEY = ("", "0", "false", "no")


def _multihost_environment():
    forced = os.environ.get("BRT_MULTIHOST")
    if forced is not None:
        return forced.strip().lower() not in _FALSEY
    if any(os.environ.get(v) for v in _COORDINATOR_VARS):
        return True
    # TPU runtime: TPU_WORKER_HOSTNAMES lists every host of the slice.
    hosts = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    return len([h for h in hosts.split(",") if h.strip()]) > 1


def initialize(**kwargs):
    """Idempotent jax.distributed.initialize; no-op for single-process runs.

    On TPU pods the coordinator address, process count, and process id are
    discovered from the runtime environment; kwargs pass through for manual
    setups (coordinator_address=..., num_processes=..., process_id=...).
    Call this before any other JAX API.  On a multi-host environment a
    failure here is a hard error — it is never downgraded to single-host.
    """
    global _initialized
    if _initialized:
        return
    if kwargs or _multihost_environment():
        jax.distributed.initialize(**kwargs)
    _initialized = True


def is_initialized():
    return _initialized


def global_env_mesh(axis="env"):
    """1-D mesh over every addressable-or-remote chip in the slice."""
    return _mesh.make_mesh(jax.devices(), axis=axis)


def is_coordinator():
    return jax.process_index() == 0

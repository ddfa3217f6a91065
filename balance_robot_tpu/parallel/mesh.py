"""Device mesh + sharding helpers (the TPU-native replacement for the absent
distributed backend — SURVEY §2.2, §5).

Design: a 1-D mesh over the axis `'env'`.  Env states and rollout batches are
sharded along their leading (env) axis; policy/optimizer parameters are
replicated.  Under `jit`, XLA inserts the gradient all-reduce (psum) over ICI
automatically.  Multi-host: call `jax.distributed.initialize()` per host
before building the mesh (the same code then spans the pod slice).
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis="env"):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis,))


def env_sharding(mesh, axis="env"):
    return NamedSharding(mesh, P(axis))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch_leaves(tree, mesh, batch_size, axis="env"):
    """Place every leaf whose leading dim == batch_size on the env axis,
    replicate the rest."""
    env_s = env_sharding(mesh, axis)
    rep = replicated(mesh)

    def place(x):
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] == batch_size:
            return jax.device_put(x, env_s)
        return jax.device_put(x, rep)

    return jax.tree.map(place, tree)


def shard_train_state(ts, mesh, n_envs, axis="env"):
    """PPO TrainState placement: env-batch leaves sharded, params/opt
    replicated."""
    return ts._replace(
        params=jax.device_put(ts.params, replicated(mesh)),
        opt_state=jax.device_put(ts.opt_state, replicated(mesh)),
        env_states=shard_batch_leaves(ts.env_states, mesh, n_envs, axis),
        last_obs=jax.device_put(ts.last_obs, env_sharding(mesh, axis)),
        key=jax.device_put(ts.key, replicated(mesh)),
        ep_ret=jax.device_put(ts.ep_ret, env_sharding(mesh, axis)),
        ep_len=jax.device_put(ts.ep_len, env_sharding(mesh, axis)),
        stat_sum_ret=jax.device_put(ts.stat_sum_ret, replicated(mesh)),
        stat_n_eps=jax.device_put(ts.stat_n_eps, replicated(mesh)),
    )

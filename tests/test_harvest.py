"""Fatal-state harvesting (train/harvest.py) — the failure-replay bank.

No reference analogue (the reference has no automated evaluation; SURVEY §4)
— this backs the TPU-native failure-replay trainer (tools/burst_refine.py
--failure-replay).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import balance_robot_tpu as brt
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train.harvest import harvest_fatal_states


@pytest.mark.slow
def test_harvest_bank_and_replay_reset():
    env = brt.make("Env03-v2")
    env.use_fast_solver()
    # Fire the block almost immediately so a weakened policy dies
    # post-launch within a short horizon (keeps CPU compile+run ~1 min).
    env.block_delay = 0.04
    env.max_episode_steps = 200

    key = jax.random.PRNGKey(0)
    params = mlp.init_params(key, obs_dim=env.obs_dim, act_dim=env.act_dim)

    bank, info = harvest_fatal_states(env, params, episodes=8, seed=3,
                                      chunk=50)
    # A fresh random policy cannot balance 200 steps: every episode is
    # fatal, but only post-launch deaths may enter the bank.
    assert info["episodes"] == 8
    assert info["full_rate"] < 1.0
    assert info["n_bank"] <= info["n_fatal"]
    if info["n_bank"] == 0:
        return  # all deaths pre-launch — filter worked, nothing to replay

    # Bank states are post-launch snapshots: death_dt >= 0 and every leaf
    # has the bank's leading axis.
    assert (np.asarray(info["death_dt"]) >= 0).all()
    B = info["n_bank"]
    for leaf in jax.tree.leaves(bank):
        assert leaf.shape[0] == B

    # Replay-reset: restart from a bank state with a fresh key / t=0 and
    # step — the physics must accept the restored state.
    bs = jax.tree.map(lambda x: x[0], bank)
    bs = bs._replace(key=jax.random.PRNGKey(9), t=jnp.int32(0))
    obs, state = env._obs(bs)
    assert bool(jnp.isfinite(obs).all())
    a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
    _, obs2, r, term, trunc = env.step(state, a)
    assert bool(jnp.isfinite(obs2).all()) and bool(jnp.isfinite(r))

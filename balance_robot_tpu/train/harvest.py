"""Fatal-state harvesting for the Env03 block envs.

Rolls a deterministic policy over N episodes and snapshots the full EnvState
at each episode's most recent block launch; episodes that then die yield
their snapshot as a "fatal pre-impact state" (block on the 0.3 m spawn
circle, impact ~8 control steps out, the exact situation the policy loses).

Consumers:
  - tools/oracle_probe.py  — CEM recoverability search from these states;
  - tools/burst_refine.py  — failure-replay PPO: mix the bank into training
    resets so the rollout data over-samples the recovery regime the policy
    actually fails in (measured: deaths cluster 29-141 control steps after
    a launch; runs/forensics_best.log).

No reference analogue (the reference has no automated evaluation at all,
SURVEY §4); this is TPU-native tooling — the whole harvest is three jitted
vmapped programs.
"""

import numpy as np
import jax
import jax.numpy as jnp

from ..models import mlp


def _block_dist(state):
    q = jnp.stack(state.phys.qpos)
    return jnp.linalg.norm(q[9:11] - q[0:2])


def harvest_fatal_states(env, params, episodes=512, seed=0, chunk=250,
                         max_states=512):
    """Returns (bank, info): `bank` is a stacked EnvState pytree of fatal
    pre-impact snapshots (leading axis = state index), `info` a dict with
    the harvest's full-horizon rate and counts.  Env must be an Env03-family
    env (14-dof state with the block at qpos[9:16])."""
    max_steps = env.max_episode_steps

    @jax.jit
    def reset_all(keys):
        states, obs = jax.vmap(env.reset)(keys)
        n = keys.shape[0]
        return (states, obs, jnp.zeros(n, bool), jnp.zeros(n, jnp.int32),
                states, jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))

    @jax.jit
    def harvest_chunk(carry):
        def body(carry, _):
            states, obs, done, t, snap, snap_t, prev_parked = carry
            a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
            states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
            alive = ~done
            d2 = jax.vmap(_block_dist)(states2)
            fired = prev_parked & (d2 < 0.5) & alive
            sel = lambda m, A, B: jax.tree.map(
                lambda x, y: jnp.where(
                    m.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
            snap = sel(fired, states2, snap)
            snap_t = jnp.where(fired, t + 1, snap_t)
            states = sel(alive, states2, states)
            obs = jnp.where(alive[:, None], obs2, obs)
            t = t + alive.astype(jnp.int32)
            done = done | term | trunc
            prev_parked = jnp.where(alive, d2 > 2.0, prev_parked)
            return (states, obs, done, t, snap, snap_t, prev_parked), None

        carry, _ = jax.lax.scan(body, carry, None, length=chunk)
        return carry

    keys = jax.random.split(jax.random.PRNGKey(seed), episodes)
    carry = reset_all(keys)
    steps = 0
    while steps < max_steps:
        carry = harvest_chunk(carry)
        steps += chunk
        if bool(carry[2].all()):
            break
    _, _, _, lens, snap, snap_t, _ = carry
    lens = np.asarray(lens)
    # snap_t > 0 filters episodes that died before any launch (their snap
    # is still the reset state, not a pre-impact state).
    fatal = (lens < max_steps - 1) & (np.asarray(snap_t) > 0)
    idx = np.nonzero(fatal)[0][:max_states]
    bank = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[idx]), snap)
    info = dict(episodes=episodes, n_fatal=int(fatal.sum()),
                n_bank=len(idx),
                full_rate=float((lens >= max_steps - 1).mean()),
                death_dt=(lens[idx] - np.asarray(snap_t)[idx]))
    return bank, info

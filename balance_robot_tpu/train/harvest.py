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
    the harvest's full-horizon rate and counts plus `info["obs"]`, the
    (N, 6) observation emitted by each snapshot's own step (the fd
    pitch_dot cannot be recomputed from the bare state — see the comment at
    the snap_obs update).  Env must be an Env03-family env (14-dof state
    with the block at qpos[9:16])."""
    max_steps = env.max_episode_steps

    @jax.jit
    def reset_all(keys):
        states, obs = jax.vmap(env.reset)(keys)
        n = keys.shape[0]
        return (states, obs, jnp.zeros(n, bool), jnp.zeros(n, jnp.int32),
                states, obs, jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))

    @jax.jit
    def harvest_chunk(carry):
        def body(carry, _):
            states, obs, done, t, snap, snap_obs, snap_t, prev_parked = carry
            a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
            states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
            alive = ~done
            d2 = jax.vmap(_block_dist)(states2)
            fired = prev_parked & (d2 < 0.5) & alive
            sel = lambda m, A, B: jax.tree.map(
                lambda x, y: jnp.where(
                    m.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
            snap = sel(fired, states2, snap)
            # Bank the obs EMITTED by the snapshot step: the fd pitch_dot in
            # a recomputed env._obs(snap) sees dt == t - last_t == 0 and
            # returns 0 while the robot is actually pitching — consumers
            # (CEM expert warm start, BC pairs) must use this obs, never
            # recompute it.
            snap_obs = jnp.where(fired[:, None], obs2, snap_obs)
            snap_t = jnp.where(fired, t + 1, snap_t)
            states = sel(alive, states2, states)
            obs = jnp.where(alive[:, None], obs2, obs)
            t = t + alive.astype(jnp.int32)
            done = done | term | trunc
            prev_parked = jnp.where(alive, d2 > 2.0, prev_parked)
            return (states, obs, done, t, snap, snap_obs, snap_t,
                    prev_parked), None

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
    _, _, _, lens, snap, snap_obs, snap_t, _ = carry
    lens = np.asarray(lens)
    # snap_t > 0 keeps only episodes that died after a RESPAWN launch.
    # Reset itself fires the first block (env03.py reset), so snap_t == 0
    # means the episode died to the reset-fired block — but at snap_t == 0
    # a block-caused death is indistinguishable from an unrecoverable reset
    # draw (~13% of scrambled-quat starts are beyond the 50° bound), so
    # those episodes are conservatively excluded to keep the bank free of
    # states no policy could survive (deliberate: commit 90a8a81).
    fatal = (lens < max_steps) & (np.asarray(snap_t) > 0)
    idx = np.nonzero(fatal)[0][:max_states]
    bank = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[idx]), snap)
    info = dict(episodes=episodes, n_fatal=int(fatal.sum()),
                n_bank=len(idx),
                full_rate=float((lens >= max_steps).mean()),
                death_dt=(lens[idx] - np.asarray(snap_t)[idx]),
                obs=jnp.asarray(np.asarray(snap_obs)[idx]))
    return bank, info

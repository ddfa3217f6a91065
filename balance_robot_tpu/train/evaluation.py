"""Chunked deterministic-policy evaluation — the single owner of the
watchdog-critical eval rollout.

A full 6000-control-step episode is 1.5M sequential physics substeps; one
XLA program that long trips the TPU runtime watchdog and crashes the worker
(observed at the first eval where a policy actually balances).  Every
rollout that isn't the jitted training iteration therefore runs as a host
loop over ~CHUNK-control-step device kernels.  PPO.evaluate,
OffPolicy.evaluate, and runner.record_episode all delegate here so the
chunking invariant lives in exactly one place.

Reference semantics being reproduced: SB3 EvalCallback's deterministic
episode returns (sb_rl.py:536-543) and the RecordVideo trajectory capture
(sb_rl.py:502-507).
"""

from functools import partial

import numpy as np
import jax
import jax.numpy as jnp


class ChunkedEvaluator:
    """Batched deterministic episode rollouts in CHUNK-step device kernels.

    `act_fn(params, obs) -> actions` must be the deterministic (mean)
    policy, already clipped to the action space; it is traced into the
    chunk kernel.  Instances are meant to be long-lived (one per trainer /
    env) — the jitted chunk caches on `self`.
    """

    CHUNK = 250

    def __init__(self, env, act_fn, chunk=None):
        self.env = env
        self.act_fn = act_fn
        self.chunk = int(chunk or self.CHUNK)

    # ------------------------------------------------------- batched eval
    @partial(jax.jit, static_argnums=0)
    def _reset(self, keys):
        states, obs = jax.vmap(self.env.reset)(keys)
        n = keys.shape[0]
        return (states, obs, jnp.zeros(n), jnp.zeros(n, bool),
                jnp.zeros(n, jnp.int32))

    @partial(jax.jit, static_argnums=0)
    def _chunk(self, params, carry, max_steps):
        def body(carry, _):
            states, obs, ret, done, t = carry
            action = self.act_fn(params, obs)
            states2, obs2, r, term, trunc = jax.vmap(self.env.step)(states,
                                                                    action)
            keep = lambda a, b: jax.tree.map(
                lambda x, y: jnp.where(
                    done.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), a, b)
            states = keep(states, states2)
            obs = keep(obs, obs2)
            ret = ret + jnp.where(done, 0.0, r)
            t = t + (~done).astype(jnp.int32)
            # reaching the caller's max_steps is a truncation: stops return
            # accumulation exactly at the step budget even though chunks are
            # fixed-length compiled kernels (no overshoot tail in returns)
            done = done | term | trunc | (t >= max_steps)
            return (states, obs, ret, done, t), None

        carry, _ = jax.lax.scan(body, carry, None, length=self.chunk)
        return carry

    def evaluate_detail(self, params, keys, max_steps=None):
        """Per-episode (returns, lengths) numpy arrays for an explicit key
        batch — fixed keys make selection evals paired (common-mode noise
        cancels across checkpoints, see tools/sweep_checkpoints.py)."""
        max_steps = max_steps or self.env.max_episode_steps
        carry = self._reset(keys)
        ms = jnp.int32(max_steps)
        steps = 0
        while steps < max_steps:
            carry = self._chunk(params, carry, ms)
            steps += self.chunk
            if bool(carry[3].all()):
                break
        _, _, rets, _, lens = carry
        # _chunk truncates at max_steps inside the kernel, so both returns
        # and lengths are exact even when max_steps is below the env horizon
        # and not a multiple of the chunk size
        return np.asarray(rets), np.asarray(lens)

    def evaluate(self, params, n_episodes: int, key, max_steps=None):
        """Mean (return, episode length) over n deterministic episodes."""
        rets, lens = self.evaluate_detail(
            params, jax.random.split(key, n_episodes), max_steps)
        return rets.mean(), lens.astype(np.float32).mean()

    # -------------------------------------------- single-episode recording
    @partial(jax.jit, static_argnums=0)
    def _record_reset(self, key):
        state, obs = self.env.reset(key)
        return state, obs, jnp.asarray(False)

    @partial(jax.jit, static_argnums=0)
    def _record_chunk(self, params, carry):
        def body(carry, _):
            state, obs, done = carry
            a = self.act_fn(params, obs[None, :])[0]
            state2, obs2, r, term, trunc = self.env.step(state, a)
            keep = lambda A, B: jax.tree.map(
                lambda x, y: jnp.where(done, x, y), A, B)
            state = keep(state, state2)
            obs = jnp.where(done, obs, obs2)
            qpos = jnp.stack(state.phys.qpos)
            return (state, obs, done | term | trunc), (qpos, done)

        return jax.lax.scan(body, carry, None, length=self.chunk)

    def record(self, params, key, max_steps=None):
        """One deterministic episode as a (T, nq) qpos trajectory + length,
        rolled out in CHUNK-step kernels (the un-chunked version crashed the
        TPU worker the first time a recorded policy survived the horizon)."""
        max_steps = max_steps or self.env.max_episode_steps
        carry = self._record_reset(key)
        qpos_chunks, alive = [], []
        steps = 0
        while steps < max_steps:
            carry, (qpos, done_prestep) = self._record_chunk(params, carry)
            qpos_chunks.append(np.asarray(qpos))
            alive.append(np.asarray(~done_prestep))
            steps += self.chunk
            if bool(carry[2]):
                break
        qpos = np.concatenate(qpos_chunks)[:max_steps]
        length = int(np.concatenate(alive)[:max_steps].sum())
        return qpos, length

"""Vectorized env engine: vmapped step/reset with SB3 VecEnv auto-reset.

The reference trains on a single env wrapped in SB3's DummyVecEnv; the
TPU-native engine runs B envs in lockstep under `jit(vmap(...))`:

  * `VecEnv.reset(key)    -> (states, obs)`                    # (B, ...)
  * `VecEnv.step(states, actions) -> (states, obs, reward, done, info)`

Auto-reset semantics match SB3 (DummyVecEnv.step_wait): when an episode ends
(terminated or truncated), the returned obs is the *reset* obs of a fresh
episode and the pre-reset ("terminal") observation is reported separately for
bootstrapping, together with the terminated/truncated split — exactly the
information SB3's PPO uses for timeout value bootstrapping.
"""

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


class StepOut(NamedTuple):
    obs: jnp.ndarray            # (B, obs_dim) post-auto-reset observation
    reward: jnp.ndarray         # (B,)
    done: jnp.ndarray           # (B,) terminated | truncated
    terminated: jnp.ndarray     # (B,)
    truncated: jnp.ndarray      # (B,)
    terminal_obs: jnp.ndarray   # (B, obs_dim) pre-reset obs (valid when done)
    terminal_priv: jnp.ndarray  # (B, priv_dim) pre-reset privileged critic
                                # features ((B, 0) unless with_priv — see
                                # train/ppo.py privileged_critic)


class VecEnv:
    def __init__(self, env, num_envs: int, with_priv: bool = False):
        self.env = env
        self.num_envs = num_envs
        self.obs_dim = env.obs_dim
        self.act_dim = env.act_dim
        # privileged critic features (asymmetric actor-critic): only
        # surfaced when the trainer asks, so symmetric users pay nothing
        self.priv_dim = env.priv_dim if (
            with_priv and getattr(env, "priv_dim", 0)) else 0

    @partial(jax.jit, static_argnums=0)
    def reset(self, key):
        keys = jax.random.split(key, self.num_envs)
        return jax.vmap(self.env.reset)(keys)

    @partial(jax.jit, static_argnums=0)
    def step(self, states, actions):
        def one(state, action):
            state2, obs, reward, terminated, truncated = self.env.step(
                state, action)
            done = terminated | truncated
            # auto-reset from a fresh key derived from the env's stream
            reset_key = jax.random.fold_in(state2.key, 0x5EED)
            rstate, robs = self.env.reset(reset_key)
            # fd-pitch_dot state: the reference's reset_model calls
            # _get_obs, whose get_pitch_dot_alt UNCONDITIONALLY re-anchors
            # last_pitch/last_time to the new episode's initial pitch at
            # t=0 (RobotBaseEnv.py:154-155); env.reset's own _obs already
            # reproduced exactly that in rstate, so nothing is carried.
            # (Carrying the dead episode's last_pitch — as this code once
            # did — made the first post-reset fd step compute
            # (p1 - p_dead)/0.005, an O(±300) spike in a ±4 obs.)
            # env-instance properties that survive episode resets
            # (e.g. Env03-v2 attack side, chosen once per env instance)
            if hasattr(self.env, "carry_across_reset"):
                rstate = self.env.carry_across_reset(state2, rstate)
            # inside vmap `done` is a scalar bool -> plain where on every leaf
            new_state = jax.tree.map(lambda a, b: jnp.where(done, a, b),
                                     rstate, state2)
            new_obs = jnp.where(done, robs, obs)
            # pre-reset privileged features: the truncation value bootstrap
            # V(terminal) must see the same critic input as training
            priv = (self.env.privileged(state2) if self.priv_dim
                    else jnp.zeros((0,), jnp.float32))
            return new_state, StepOut(obs=new_obs, reward=reward, done=done,
                                      terminated=terminated,
                                      truncated=truncated, terminal_obs=obs,
                                      terminal_priv=priv)
        return jax.vmap(one)(states, actions)

"""Behavior-clone a PD balance expert into the policy MLP (PPO warm start).

The reference's curriculum mechanism is warm-starting SB3 runs from a prior
model (`-m`, sb_rl.py:519-525). At TPU scale the reward's 0.5*pitch*dv term
is a deceptive optimum (see README), so stage 0 of the curriculum here is a
PD expert — `u = -(k1*pitch + k2*pitch_dot)`, `a = (u, -u)` — cloned into the
MLP (policy mean by MSE, value head to the expert's discounted
return-to-go). The cloned policy balances every recoverable reset draw.
"""

from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..envs.vector import VecEnv
from ..models import mlp


@dataclass(frozen=True)
class BCConfig:
    episodes: int = 256        # parallel expert rollouts
    steps: int = 400           # control steps per rollout
    k1: float = 10.0           # pitch gain
    k2: float = 1.0            # pitch_dot gain
    noise: float = 0.05        # exploration noise during collection
    gamma: float = 0.999       # value-target discount (match the PPO run)
    log_std: float = -1.0      # cloned policy's initial log_std
    bc_steps: int = 2000
    batch: int = 4096
    lr: float = 1e-3


def pd_expert_actions(obs, key, cfg: BCConfig):
    u = -(cfg.k1 * obs[:, 0] * 0.25 + cfg.k2 * obs[:, 1])
    a = jnp.stack([u, -u], axis=1)
    a = a + cfg.noise * jax.random.normal(key, a.shape)
    return jnp.clip(a, -1.0, 1.0)


def collect(env, cfg: BCConfig, key):
    """Expert rollouts -> (obs, actions, discounted return-to-go)."""
    vec = VecEnv(env, cfg.episodes)

    @jax.jit
    def _run(key):
        k0, key = jax.random.split(key)
        states, obs = vec.reset(k0)

        def body(carry, _):
            states, obs, key = carry
            key, k = jax.random.split(key)
            a = pd_expert_actions(obs, k, cfg)
            states, out = vec.step(states, a)
            return (states, out.obs, key), dict(
                obs=obs, act=a, rew=out.reward, done=out.done)

        (_, _, _), traj = jax.lax.scan(body, (states, obs, key), None,
                                       length=cfg.steps)

        def back(g, d):
            g = d["rew"] + cfg.gamma * g * (
                1.0 - d["done"].astype(jnp.float32))
            return g, g

        _, rtg = jax.lax.scan(back, jnp.zeros(cfg.episodes), traj,
                              reverse=True)
        return traj["obs"], traj["act"], rtg

    obs, act, rtg = _run(key)
    n = obs.shape[0] * obs.shape[1]
    return (obs.reshape(n, -1), act.reshape(n, -1), rtg.reshape(n))


def fit(env, cfg: BCConfig, key, data=None, verbose=False):
    """Returns params warm-startable by PPO (policy mean ~= expert)."""
    k_data, k_init, key = jax.random.split(key, 3)
    if data is None:
        data = collect(env, cfg, k_data)
    obs, act, rtg = data
    params = mlp.init_params(k_init, env.obs_dim, env.act_dim)
    optim = optax.adam(cfg.lr)
    opt_state = optim.init(params)

    @jax.jit
    def step(params, opt_state, key):
        idx = jax.random.randint(key, (cfg.batch,), 0, obs.shape[0])

        def loss_fn(p):
            mean = mlp.policy_mean(p, obs[idx])
            v = mlp.value(p, obs[idx])
            l_pi = jnp.mean((mean - act[idx]) ** 2)
            l_v = jnp.mean((v - rtg[idx]) ** 2)
            return l_pi + 0.1 * l_v, (l_pi, l_v)

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        upd, opt_state = optim.update(grads, opt_state)
        return optax.apply_updates(params, upd), opt_state, aux

    for i in range(cfg.bc_steps):
        key, k = jax.random.split(key)
        params, opt_state, (l_pi, l_v) = step(params, opt_state, k)
        if verbose and (i % 500 == 0 or i == cfg.bc_steps - 1):
            print(f"bc step {i}: action MSE {float(l_pi):.5f} "
                  f"value MSE {float(l_v):.1f}")

    params["log_std"] = jnp.full(env.act_dim, cfg.log_std)
    return params

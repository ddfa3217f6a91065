"""Behavior-clone a PD balance expert into the policy MLP as a PPO warm start.

A pitch PD law `u = -(k1*pitch + k2*pitch_dot)`, `a = (u, -u)` balances the
robot from the entire reachable reset distribution (see README's gamma note:
the reference reward's 0.5*pitch*dv term is a deceptive local optimum that
massively-parallel PPO-from-scratch finds instead of balancing). Cloning the
expert puts PPO inside the balance basin, mirroring the reference's own
warm-start curriculum mechanism (sb_rl.py:519-525).

Usage:
  python tools/bc_init.py [--env Env01-v2] [--out models/bc_init.npz]
      [--episodes 256] [--steps 400] [--log-std -1.0] [--gamma 0.999]

Fits the policy mean to expert actions (MSE) and the value head to the
expert's discounted return-to-go, then saves a params npz for
`train --init` / `-m`.
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import balance_robot_tpu as brt
from balance_robot_tpu.envs.vector import VecEnv
from balance_robot_tpu.models import mlp

p = argparse.ArgumentParser()
p.add_argument("--env", default="Env01-v2")
p.add_argument("--out", default="models/bc_init.npz")
p.add_argument("--episodes", type=int, default=256)
p.add_argument("--steps", type=int, default=400)
p.add_argument("--k1", type=float, default=10.0)
p.add_argument("--k2", type=float, default=1.0)
p.add_argument("--noise", type=float, default=0.05,
               help="exploration noise on expert actions during collection")
p.add_argument("--gamma", type=float, default=0.999)
p.add_argument("--log-std", type=float, default=-1.0,
               help="initial log_std for the cloned policy (std ~0.37)")
p.add_argument("--bc-steps", type=int, default=2000)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--seed", type=int, default=0)
args = p.parse_args()

env = brt.make(args.env)
vec = VecEnv(env, args.episodes)


def expert(obs, key):
    u = -(args.k1 * obs[:, 0] * 0.25 + args.k2 * obs[:, 1])
    a = jnp.stack([u, -u], axis=1)
    a = a + args.noise * jax.random.normal(key, a.shape)
    return jnp.clip(a, -1.0, 1.0)


@jax.jit
def collect(key):
    k0, key = jax.random.split(key)
    states, obs = vec.reset(k0)

    def body(carry, _):
        states, obs, key = carry
        key, k = jax.random.split(key)
        a = expert(obs, k)
        states, out = vec.step(states, a)
        return (states, out.obs, key), dict(
            obs=obs, act=a, rew=out.reward, done=out.done)

    (_, _, _), traj = jax.lax.scan(body, (states, obs, key), None,
                                   length=args.steps)
    # discounted return-to-go (zero across episode boundaries)
    def back(g, d):
        g = d["rew"] + args.gamma * g * (1.0 - d["done"].astype(jnp.float32))
        return g, g

    _, rtg = jax.lax.scan(back, jnp.zeros(args.episodes), traj, reverse=True)
    return traj, rtg


key = jax.random.PRNGKey(args.seed)
traj, rtg = collect(key)
obs = np.asarray(traj["obs"]).reshape(-1, env.obs_dim)
act = np.asarray(traj["act"]).reshape(-1, env.act_dim)
val = np.asarray(rtg).reshape(-1)
alive = ~np.asarray(traj["done"]).reshape(-1)
print(f"collected {obs.shape[0]} transitions "
      f"(mean ep reward/step {np.asarray(traj['rew']).mean():.3f}, "
      f"done frac {1 - alive.mean():.4f})")

params = mlp.init_params(jax.random.PRNGKey(args.seed + 1),
                         env.obs_dim, env.act_dim)
optim = optax.adam(args.lr)
opt_state = optim.init(params)
data = {"obs": jnp.asarray(obs), "act": jnp.asarray(act),
        "val": jnp.asarray(val)}


@jax.jit
def bc_step(params, opt_state, key):
    idx = jax.random.randint(key, (4096,), 0, data["obs"].shape[0])

    def loss_fn(p):
        mean = mlp.policy_mean(p, data["obs"][idx])
        v = mlp.value(p, data["obs"][idx])
        l_pi = jnp.mean((mean - data["act"][idx]) ** 2)
        l_v = jnp.mean((v - data["val"][idx]) ** 2)
        return l_pi + 0.1 * l_v, (l_pi, l_v)

    (loss, (l_pi, l_v)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    upd, opt_state = optim.update(grads, opt_state)
    return optax.apply_updates(params, upd), opt_state, l_pi, l_v


for i in range(args.bc_steps):
    key, k = jax.random.split(key)
    params, opt_state, l_pi, l_v = bc_step(params, opt_state, k)
    if i % 500 == 0 or i == args.bc_steps - 1:
        print(f"bc step {i}: action MSE {float(l_pi):.5f} "
              f"value MSE {float(l_v):.1f}")

params["log_std"] = jnp.full(env.act_dim, args.log_std)

# sanity: deterministic rollout of the cloned policy
@jax.jit
def eval_clone(key):
    states, obs = vec.reset(key)

    def body(carry, _):
        states, obs, alive, steps = carry
        a = jnp.clip(mlp.policy_mean(params, obs), -1, 1)
        states, out = vec.step(states, a)
        return (states, out.obs, alive & ~out.terminated,
                steps + alive.astype(jnp.int32)), None

    (_, _, _, steps), _ = jax.lax.scan(
        body, (states, obs, jnp.ones(args.episodes, bool),
               jnp.zeros(args.episodes, jnp.int32)), None, length=600)
    return steps

steps = np.asarray(eval_clone(jax.random.PRNGKey(7)))
print(f"cloned policy: median survival {np.median(steps):.0f}/600, "
      f"frac full {np.mean(steps >= 590):.2f}")

from balance_robot_tpu.train import checkpoint as ckpt
ckpt.save(args.out, params)
print(f"saved {args.out}")

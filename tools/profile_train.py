"""Break down PPO iteration time vs pure rollout throughput.

Usage: python tools/profile_train.py [--envs 1024] [--steps 64] [--mb 4096]
       [--trace logs/traces]

Phases measured (each jitted separately, device-synced):
  rollout-only   : VecEnv scan + policy sample (the bench.py path)
  iteration      : full PPO iteration (rollout + GAE + 10-epoch update)
  update-only    : the update on a fixed trajectory
Prints per-phase times and env-steps/s so regressions in the training path
show up against the BASELINE headline metric.
"""
import argparse
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.train.ppo import PPO, PPOConfig

p = argparse.ArgumentParser()
p.add_argument("--envs", type=int, default=1024)
p.add_argument("--steps", type=int, default=64)
p.add_argument("--mb", type=int, default=4096)
p.add_argument("--env-id", default="Env01-v2")
p.add_argument("--trace", default=None)
p.add_argument("--reps", type=int, default=5)
args = p.parse_args()

env = brt.make(args.env_id)
cfg = PPOConfig(n_envs=args.envs, n_steps=args.steps, minibatch_size=args.mb)
ppo = PPO(env, cfg)
ts = ppo.init(jax.random.PRNGKey(0))
spi = cfg.n_envs * cfg.n_steps


@jax.jit
def rollout_only(ts):
    ts, traj = ppo._rollout(ts)
    return ts, traj["reward"].mean()


@jax.jit
def gae_update_only(ts, traj):
    adv, ret = ppo._gae(ts, traj)
    ts, metrics = ppo._update(ts, traj, adv, ret)
    return ts, metrics


def timeit(name, fn, *a, steps=None):
    out = fn(*a)                    # compile + warm
    jax.block_until_ready(jax.tree.leaves(out)[0])
    best = float("inf")
    for _ in range(args.reps):
        t0 = time.perf_counter()
        out = fn(*a)
        jax.block_until_ready(jax.tree.leaves(out)[0])
        best = min(best, time.perf_counter() - t0)
    rate = f"  {steps / best:,.0f} env-steps/s" if steps else ""
    print(f"{name:18s} {best * 1e3:9.2f} ms{rate}")
    return out, best


print(f"config: {args.envs} envs x {args.steps} steps, mb={args.mb}, "
      f"backend={jax.default_backend()}")
(_, _), t_roll = timeit("rollout-only", rollout_only, ts, steps=spi)
ts2, traj = jax.jit(ppo._rollout)(ts)
jax.block_until_ready(jax.tree.leaves(traj)[0])
(_, _), t_upd = timeit("gae+update-only", gae_update_only, ts2, traj)
(_, _), t_iter = timeit("full iteration", ppo.iteration, ts, steps=spi)
print(f"{'overhead (iter - roll - upd)':30s} {(t_iter - t_roll - t_upd) * 1e3:.2f} ms")

if args.trace:
    from balance_robot_tpu.utils.profiling import trace
    with trace(args.trace):
        out = ppo.iteration(ts)
        jax.block_until_ready(jax.tree.leaves(out)[0])
    print(f"trace written to {args.trace}")

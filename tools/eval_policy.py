"""Large-scale deterministic policy evaluation.

Usage: python tools/eval_policy.py MODEL.npz [--env Env01-v2] [--episodes 256]

Runs N vmapped deterministic episodes (chunked kernels — see
PPO.evaluate's watchdog note), reporting return / length statistics split by
recoverable vs unrecoverable starts (the reference reset distribution puts
~13%% of Env01-v2 episodes beyond the 50-degree termination threshold at t=0;
no policy can save those). "Consistent balance" = recoverable episodes
surviving the full horizon.
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.envs.base import pitch_of, TERMINATE_PITCH
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt

p = argparse.ArgumentParser()
p.add_argument("model")
p.add_argument("--env", default="Env01-v2")
p.add_argument("--episodes", type=int, default=256)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--chunk", type=int, default=250)
p.add_argument("--dump", default=None,
               help="npz path for per-episode (return, length, start pitch) "
                    "arrays — failure analysis of the non-surviving tail")
p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
               help="force the JAX backend (config.update, not the env var: "
                    "sitecustomize has already imported jax)")
args = p.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env)
params = ckpt.load(args.model)
max_steps = env.max_episode_steps


@jax.jit
def reset_all(keys):
    states, obs = jax.vmap(env.reset)(keys)
    p0 = jax.vmap(lambda s: pitch_of(s.phys.qpos))(states)
    n = keys.shape[0]
    return (states, obs, jnp.zeros(n), jnp.zeros(n, bool),
            jnp.zeros(n, jnp.int32)), p0


@jax.jit
def chunk(carry):
    def body(carry, _):
        states, obs, ret, done, t = carry
        a = jnp.clip(mlp.policy_mean(params, obs), -1.0, 1.0)
        states2, obs2, r, term, trunc = jax.vmap(env.step)(states, a)
        keep = lambda A, B: jax.tree.map(
            lambda x, y: jnp.where(
                done.reshape((-1,) + (1,) * (x.ndim - 1)), x, y), A, B)
        states = keep(states, states2)
        obs = keep(obs, obs2)
        ret = ret + jnp.where(done, 0.0, r)
        t = t + (~done).astype(jnp.int32)
        done = done | term | trunc
        return (states, obs, ret, done, t), None

    carry, _ = jax.lax.scan(body, carry, None, length=args.chunk)
    return carry


keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
carry, p0 = reset_all(keys)
steps = 0
while steps < max_steps:
    carry = chunk(carry)
    steps += args.chunk
    if bool(carry[3].all()):
        break

_, _, ret, _, lens = carry
ret = np.asarray(ret)
lens = np.asarray(lens)
recoverable = np.abs(np.asarray(p0)) < TERMINATE_PITCH
if args.dump:
    np.savez(args.dump, ret=ret, lens=lens, p0=np.asarray(p0),
             seed=args.seed)
    print(f"per-episode arrays -> {args.dump}")

print(f"{args.env}  {args.model}  ({args.episodes} deterministic episodes, "
      f"horizon {max_steps})")
for name, m in (("all", np.ones_like(recoverable)),
                ("recoverable starts", recoverable),
                ("unrecoverable starts", ~recoverable)):
    if m.sum() == 0:
        continue
    full = (lens[m] >= max_steps - 1).mean()
    print(f"  {name:22s} n={int(m.sum()):4d}  return mean {ret[m].mean():8.1f}"
          f"  len mean {lens[m].mean():6.0f} median {np.median(lens[m]):6.0f}"
          f"  full-horizon {100 * full:5.1f}%")

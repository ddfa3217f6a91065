"""Behavior-clone a PD balance expert into the policy MLP as a PPO warm start.

Thin driver over balance_robot_tpu.train.bc (also exposed as the CLI
`bc-init` command). See that module and README's gamma note for why this is
stage 0 of the curriculum.

Usage:
  python tools/bc_init.py [--env Env01-v2] [--out models/bc_init.npz]
      [--episodes 256] [--steps 400] [--log-std -1.0] [--gamma 0.999]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import bc
from balance_robot_tpu.train import checkpoint as ckpt

p = argparse.ArgumentParser()
p.add_argument("--env", default="Env01-v2")
p.add_argument("--out", default="models/bc_init.npz")
p.add_argument("--episodes", type=int, default=256)
p.add_argument("--steps", type=int, default=400)
p.add_argument("--k1", type=float, default=10.0)
p.add_argument("--k2", type=float, default=1.0)
p.add_argument("--noise", type=float, default=0.05)
p.add_argument("--gamma", type=float, default=0.999)
p.add_argument("--log-std", type=float, default=-1.0)
p.add_argument("--bc-steps", type=int, default=2000)
p.add_argument("--lr", type=float, default=1e-3)
p.add_argument("--seed", type=int, default=0)
p.add_argument("--platform", choices=["tpu", "cpu"], default=None,
               help="force the JAX backend (config.update, not the env "
                    "var: sitecustomize has already imported jax)")
args = p.parse_args()

if args.platform is not None:
    jax.config.update("jax_platforms", args.platform)

env = brt.make(args.env)
cfg = bc.BCConfig(episodes=args.episodes, steps=args.steps, k1=args.k1,
                  k2=args.k2, noise=args.noise, gamma=args.gamma,
                  log_std=args.log_std, bc_steps=args.bc_steps, lr=args.lr)
params = bc.fit(env, cfg, jax.random.PRNGKey(args.seed), verbose=True)

# sanity: deterministic rollout of the cloned policy, through the shared
# chunked evaluator (600 steps in one scan = 150k sequential substeps,
# past the TPU watchdog limit — train/evaluation.py owns the chunking)
from balance_robot_tpu.train import evaluation

_ev = evaluation.ChunkedEvaluator(
    env, lambda pp, o: jnp.clip(mlp.policy_mean(pp, o), -1.0, 1.0))
_, steps = _ev.evaluate_detail(
    params, jax.random.split(jax.random.PRNGKey(7), cfg.episodes),
    max_steps=600)
print(f"cloned policy: median survival {np.median(steps):.0f}/600, "
      f"frac full {np.mean(steps >= 590):.2f}")
ckpt.save(args.out, params)
print(f"saved {args.out}")

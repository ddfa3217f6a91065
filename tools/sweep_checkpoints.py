"""Sweep every checkpoint of a run with a large deterministic eval and rank
by full-horizon survival.

The training runner gates best_model on a small (5-16 episode) eval, which
is noisy at the flagship's margins; this sweeps cp_*.npz + best/longest/
final with a 256-episode eval instead.  The eval kernel takes params as an
ARGUMENT, so all checkpoints share one compile — on chip each additional
checkpoint costs only the rollout itself.

Usage: python tools/sweep_checkpoints.py models/Env03-v2_r2a \
           [--env Env03-v2] [--episodes 256] [--out sweep.json]
"""
import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt
from balance_robot_tpu.models import mlp
from balance_robot_tpu.train import checkpoint as ckpt
from balance_robot_tpu.train import evaluation

ap = argparse.ArgumentParser()
ap.add_argument("run_dir")
ap.add_argument("--env", default="Env03-v2")
ap.add_argument("--episodes", type=int, default=256)
ap.add_argument("--seed", type=int, default=0)
ap.add_argument("--chunk", type=int, default=250)
ap.add_argument("--every", type=int, default=1,
                help="evaluate every Nth numbered checkpoint")
ap.add_argument("--out", default=None, help="write ranked results as JSON")
args = ap.parse_args()

env = brt.make(args.env)
env.use_fast_solver()
if hasattr(env, "use_pallas_physics") and \
        jax.devices()[0].platform == "tpu":
    try:
        env.use_pallas_physics()
    except NotImplementedError:
        pass
max_steps = env.max_episode_steps


# One owner for the watchdog-critical chunked rollout (train/evaluation.py);
# the chunk kernel takes params as an argument, so every checkpoint shares
# one compile.
_evaluator = evaluation.ChunkedEvaluator(
    env, lambda p, o: jnp.clip(mlp.policy_mean(p, o), -1.0, 1.0),
    chunk=args.chunk)


def evaluate(params, keys):
    return _evaluator.evaluate_detail(params, keys)


run = pathlib.Path(args.run_dir)
numbered = sorted(run.glob("cp_*.npz"),
                  key=lambda p: int(p.stem.split("_")[1]))[::args.every]
named = [run / f"{n}.npz" for n in ("best_model", "longest_model",
                                    "final_model")]
paths = [p for p in numbered + named if p.exists()]
print(f"{len(paths)} checkpoints, {args.episodes} episodes each, "
      f"horizon {max_steps} ({jax.devices()[0].platform})", flush=True)

keys = jax.random.split(jax.random.PRNGKey(args.seed), args.episodes)
rows = []
for p in paths:
    params = ckpt.load(p)
    ret, lens = evaluate(params, keys)
    full = float((lens >= max_steps).mean())
    rows.append(dict(ckpt=p.name, full_horizon=full,
                     mean_return=float(ret.mean()),
                     mean_len=float(lens.mean()),
                     median_len=float(np.median(lens))))
    print(f"  {p.name:24s} full={100 * full:5.1f}%  "
          f"ret={ret.mean():8.1f}  len={lens.mean():6.0f}", flush=True)

rows.sort(key=lambda r: (r["full_horizon"], r["mean_len"]), reverse=True)
print("\nbest:", rows[0])
if args.out:
    pathlib.Path(args.out).write_text(json.dumps(rows, indent=1))
    print(f"wrote {args.out}")

"""Measure and bound the on-chip pallas-vs-XLA obs drift.

The fused pallas control-step kernels are bit-exact against the XLA path in
interpret mode (tests/test_pallas_block.py), but on hardware Mosaic
contracts floats differently, so obs diverge ~1e-5 per control step with
chaotic growth (docs/PERFORMANCE.md).  Round-1 verdict: nothing bounded
this on hardware, so a Mosaic regression could silently corrupt training.
This tool steps the same reset states through both paths and reports the
max-abs obs divergence per control step; bench.py asserts the step-1 bound
on every round's chip run.

Usage: python tools/check_pallas_drift.py [--env Env03-v2] [--steps 5]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp

import balance_robot_tpu as brt


def obs_drift(env_id, steps=5, batch=64, seed=0):
    """Per-step max|obs_pallas - obs_xla| over a batch of identical resets
    driven by identical deterministic actions."""
    env_x = brt.make(env_id)
    env_x.use_fast_solver()
    env_p = brt.make(env_id)
    env_p.use_fast_solver()
    env_p.use_pallas_physics()

    keys = jax.random.split(jax.random.PRNGKey(seed), batch)
    sx, ox = jax.jit(jax.vmap(env_x.reset))(keys)
    sp, op = jax.jit(jax.vmap(env_p.reset))(keys)
    step_x = jax.jit(jax.vmap(env_x.step))
    step_p = jax.jit(jax.vmap(env_p.step))

    out = [float(jnp.max(jnp.abs(ox - op)))]     # reset obs must agree
    for t in range(steps):
        a = jnp.tile(jnp.asarray(
            [[0.3 * np.sin(0.1 * t), -0.2 * np.sin(0.13 * t)]],
            jnp.float32), (batch, 1))
        sx, ox, _, _, _ = step_x(sx, a)
        sp, op, _, _, _ = step_p(sp, a)
        out.append(float(jnp.max(jnp.abs(ox - op))))
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Env03-v2")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    d = obs_drift(args.env, args.steps, args.batch)
    print(f"{args.env} pallas-vs-XLA max|obs| divergence "
          f"({jax.devices()[0].platform}):")
    print(f"  reset: {d[0]:.3e}")
    for i, v in enumerate(d[1:], 1):
        print(f"  step {i}: {v:.3e}")


if __name__ == "__main__":
    main()

"""Standalone probe for the on-chip pallas-vs-XLA obs drift envelope.

Measurement + bounds live in balance_robot_tpu/utils/drift.py; bench.py
asserts them every round.  Usage:

    python tools/check_pallas_drift.py [--env Env03-v2] [--steps 5]
"""
import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import jax

from balance_robot_tpu.utils import drift


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--env", default="Env03-v2")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    d = drift.obs_drift(args.env, args.steps, args.batch)
    print(f"{args.env} pallas-vs-XLA max|obs| divergence "
          f"({jax.devices()[0].platform}):")
    print(f"  reset: {d[0]:.3e}")
    for i, v in enumerate(d[1:], 1):
        print(f"  step {i}: {v:.3e}")
    if jax.devices()[0].platform == "tpu" and args.env in drift.STEP1_BOUND:
        drift.assert_drift_bounded(args.env, steps=min(args.steps, 5),
                                   batch=args.batch)
        print("within the documented envelope "
              f"(step1<{drift.STEP1_BOUND[args.env]:.0e}, "
              f"step5<{drift.STEP5_BOUND[args.env]:.0e})")


if __name__ == "__main__":
    main()

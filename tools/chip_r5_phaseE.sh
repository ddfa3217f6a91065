#!/bin/bash
# Round-5 phase E: the last distribution-axis variant (severity-only),
# under the round-5 honest bar (auto 2*SE min-win + disjoint-margin
# confirm + pooled fresh-seed gate inside burst_refine).
set -u
cd "$(dirname "$0")/.."
timeout 7200 python tools/burst_refine.py \
  --init models/Env03-v2_PPO/best_model.npz --out models/Env03-v2_r5a \
  --bursts 6 --burst-steps 2000000 --snap-steps 500000 \
  --envs 1024 --steps 32 --mb 1024 --privileged-critic \
  --train-block-speed 9.0 \
  --lr 5e-5 --gamma 0.999 --eval-episodes 512 --seed 41 \
  --confirm --max-wall 5800 2>&1 | tee runs/burst_r5a.log | tail -40
echo "=== phase E done ==="

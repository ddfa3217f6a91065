#!/bin/bash
# Round-5 phase D: KL-anchored MPC-demo integration (verdict task 1b).
# Plain MSE cloning collapsed (TRAINING.md negative result 3); weight-1.0
# KL was too stiff to move (runs/bc_kl_smoke.log).  Sweep the anchor weight
# across the interpolation range with paired selection, then pool the
# winner fresh-seed (the honest bar) before any install decision.
set -u
cd "$(dirname "$0")/.."
DEMOS="--dagger runs/dagger_mpc_r5.npz --dagger runs/dagger_mpc_a.npz --dagger runs/dagger_mpc_b.npz"
for w in 0.3 0.1 0.03; do
  echo "=== [D] KL-anchored clone, anchor-weight $w ==="
  timeout 2700 python tools/bc_finetune.py \
    models/Env03-v2_PPO/best_model.npz $DEMOS \
    --kl-anchor --anchor-weight $w --dagger-frac 0.3 \
    --steps 4000 --eval-every 500 --select-episodes 128 \
    --eval-episodes 512 --seed 11 \
    --out models/Env03-v2_klbc_$w 2>&1 | tee runs/klbc_w$w.log | tail -30
done
echo "=== phase D sweep done — pool the best variant fresh-seed next ==="

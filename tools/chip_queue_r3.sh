#!/bin/bash
# Round-3 chip queue — the three flagship levers from docs/TRAINING.md
# ("Next levers"), in expected-value order, sized so the whole queue fits
# in a few chip-hours.  Run when the TPU relay is back:
#
#   nohup bash tools/chip_queue_r3.sh > runs/chip_queue_r3.log 2>&1 &
#
# One TPU process at a time (axon chip contention, see docs/TRAINING.md).
# Every stage is under `timeout` and the queue continues past a dead stage,
# so a worker crash costs one stage, not the queue.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

BEST=models/Env03-v2_PPO/best_model.npz   # r2i flagship, 89.5% pooled

echo "=== [1] privileged critic + longer rollouts: the value net sees the"
echo "    block (heading-frame kinematics + attack side) so GAE can price"
echo "    incoming impacts; steps 128 spans the 76-step launch->death lag ==="
timeout 10800 python tools/burst_refine.py \
  --init "$BEST" --out models/Env03-v2_r3a \
  --bursts 6 --burst-steps 2000000 --snap-steps 250000 \
  --envs 256 --steps 128 --mb 1024 --privileged-critic \
  --lr 5e-5 --gamma 0.999 --eval-episodes 512 --seed 11 \
  --max-wall 9600

R3A=models/Env03-v2_r3a/best_model.npz
[ -f "$R3A" ] || R3A="$BEST"

echo "=== [2] KL-anchored CEM-demo integration (MSE cloning collapsed;"
echo "    the Gaussian-KL anchor is ~550x stiffer + keep-if-better) ==="
timeout 7200 python tools/bc_finetune.py "$R3A" \
  --dagger runs/dagger_mpc_a.npz --dagger runs/dagger_mpc_b.npz \
  --kl-anchor --dagger-frac 0.05 --lr 2e-5 --steps 3000 \
  --eval-every 500 --select-episodes 256 --eval-episodes 512 \
  --out models/Env03-v2_r3kl

echo "=== [3] specialist probe: does a back-only fine-tune close the back"
echo "    gap (78.8% vs front 93.5%)?  Bounds the unobservability floor. ==="
timeout 5400 python tools/burst_refine.py \
  --init "$BEST" --out models/Env03-v2_r3back \
  --bursts 2 --burst-steps 1000000 --snap-steps 250000 \
  --train-back-frac 1.0 \
  --envs 1024 --steps 32 --mb 1024 \
  --lr 5e-5 --gamma 0.999 --eval-episodes 256 --seed 21 \
  --max-wall 4800

for m in models/Env03-v2_r3back/best_model.npz; do
  [ -f "$m" ] || continue
  echo "== forensics $m (front/back split on the STANDARD env)"
  timeout 3600 python tools/failure_forensics.py "$m" --episodes 256 --seed 5
done

echo "=== [4] fresh-seed pooled re-eval of every candidate that beat the"
echo "    incumbent (honest number: two disjoint 512-episode seed sets) ==="
for m in models/Env03-v2_r3a/best_model.npz \
         models/Env03-v2_r3kl/best_model.npz; do
  [ -f "$m" ] || continue
  echo "== $m"
  timeout 3600 python tools/eval_policy.py "$m" --env Env03-v2 \
    --episodes 512 --seed 101
  timeout 3600 python tools/eval_policy.py "$m" --env Env03-v2 \
    --episodes 512 --seed 202
done
echo "=== [5] critic anticipation probe: does the privileged critic dip"
echo "    between launch and impact where the symmetric one stays flat? ==="
for m in "$BEST" models/Env03-v2_r3a/best_model.npz; do
  [ -f "$m" ] || continue
  echo "== value_probe $m"
  timeout 2400 python tools/value_probe.py "$m" --episodes 128 --seed 9 --window 120
done
echo "=== queue done ==="

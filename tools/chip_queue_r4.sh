#!/bin/bash
# Round-4 chip queue (fallback codification — the round is driven
# interactively; this records the intended sequence after the teacher
# training run models/Env03-v2_teacher completes).  One TPU process at a
# time (docs/PERFORMANCE.md gotchas).
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== [1] teacher pooled eval (fresh seeds, the r3 convention) ==="
for s in 101 202; do
  timeout 3600 python tools/eval_policy.py \
    models/Env03-v2_teacher/best_model.npz --env Env03-v2 \
    --episodes 512 --seed $s 2>&1
done

echo "=== [2] DAgger distillation into the 6-obs student ==="
timeout 3600 python tools/distill_teacher.py \
  --teacher models/Env03-v2_teacher/best_model.npz \
  --init models/Env03-v2_PPO/best_model.npz \
  --out models/Env03-v2_dagger_r4 \
  --envs 1024 --collect-steps 64 --iters 40 --beta0 1 \
  --lr 5e-4 --eval-every 5 --eval-episodes 512 --max-wall 3000 2>&1

echo "=== [3] student pooled eval (fresh seeds) ==="
for s in 101 202; do
  timeout 3600 python tools/eval_policy.py \
    models/Env03-v2_dagger_r4/best_model.npz --env Env03-v2 \
    --episodes 512 --seed $s 2>&1
done

echo "=== [4] SAC continuation to consistent balance (VERDICT r2 item 3) ==="
timeout 3300 python tools/train_offpolicy.py SAC Env01-v2 --envs 64 \
  --grad-steps 8 --batch 256 --learning-starts 10000 \
  --max-steps 12000000 --max-wall 2700 --gamma 0.999 \
  --eval-freq 100000 --eval-episodes 16 --seed 0 --resume \
  --run-name Env01-v2_SAC 2>&1
timeout 1800 python tools/eval_policy.py models/Env01-v2_SAC/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1

echo "=== [5] Move05: probe the 900 bar, BC-init, PPO to threshold ==="
timeout 1800 python tools/move_probe.py --pallas 2>&1
# BC params filled in from the probe's best THRESH member interactively;
# defaults here are the analysis's central guess
timeout 600 python tools/move_bc_init.py --mid 8 --width 1 \
  --a-hi 1.0 --a-lo 0.02 --out models/EnvMove05-v1_bc/bc_init.npz 2>&1
timeout 3300 python tools/train_run.py EnvMove05-v1 \
  --envs 1024 --steps 32 --mb 1024 \
  --init models/EnvMove05-v1_bc/bc_init.npz \
  --gamma 0.99 --eval-freq 1000000 --eval-episodes 32 \
  --max-steps 200000000 --max-wall 2400 \
  --run-name EnvMove05-v1_PPO_r4 --solver fast 2>&1
timeout 1800 python tools/eval_policy.py \
  models/EnvMove05-v1_PPO_r4/best_model.npz \
  --env EnvMove05-v1 --episodes 256 --seed 7 2>&1

echo "=== [6] round evidence: bench + drift ==="
timeout 5400 python bench.py 2>&1
echo "=== queue r4 done ==="

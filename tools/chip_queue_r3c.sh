#!/bin/bash
# Round-3 chip queue C: breadth items (VERDICT 3/4/5) + end-of-round
# evidence, sized to ~2h.  Run via tools/chip_watch_r3c.sh, which probes
# the backend with a real jax init and launches this the moment the
# tunnel relay is back.  One TPU process at a time.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== [1] SAC Env01-v2, gamma 0.999 (the production anti-exploit recipe;"
echo "    gamma 0.99 measurably finds the pitch*dv reward exploit) ==="
timeout 3300 python tools/train_offpolicy.py SAC Env01-v2 --envs 64 \
  --grad-steps 8 --batch 256 --learning-starts 10000 \
  --max-steps 6000000 --max-wall 2400 --gamma 0.999 \
  --eval-freq 100000 --eval-episodes 16 --seed 0 \
  --run-name Env01-v2_SAC 2>&1
echo "sac rc=$?"

echo "=== [1b] SAC eval 256 episodes ==="
timeout 1800 python tools/eval_policy.py models/Env01-v2_SAC/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1

echo "=== [2] EnvMove05 warm-start PPO toward the registered 900 bar ==="
timeout 3300 python tools/train_run.py EnvMove05-v1 \
  --envs 1024 --steps 32 --mb 1024 \
  --init models/EnvMove05-v1_PPO/best_model.npz \
  --gamma 0.999 --ent-coef 0.005 --eval-freq 1000000 --eval-episodes 32 \
  --max-steps 500000000 --max-wall 2400 \
  --run-name EnvMove05-v1_PPO_r3 --solver fast --physics xla 2>&1
echo "move rc=$?"

echo "=== [2b] Move05 eval 256 episodes ==="
for m in models/EnvMove05-v1_PPO_r3/best_model.npz; do
  [ -f "$m" ] || continue
  timeout 1800 python tools/eval_policy.py "$m" \
    --env EnvMove05-v1 --episodes 256 --seed 7 2>&1
done

echo "=== [3] 14-dof training-path profile (VERDICT item 5) ==="
timeout 1500 python tools/profile_train.py --env-id Env03-v2 \
  --envs 256 --steps 128 --mb 1024 2>&1
timeout 1500 python tools/profile_train.py --env-id Env03-v2 \
  --envs 1024 --steps 32 --mb 1024 2>&1

echo "=== [4] bench (round evidence; asserts both pallas drift bounds) ==="
timeout 5400 python bench.py > runs/bench_r3c.json 2> runs/bench_r3c.err
echo "bench rc=$?"
cat runs/bench_r3c.json runs/bench_r3c.err

echo "=== [5] CLI smoke on chip (verify drive) ==="
timeout 1200 python -m balance_robot_tpu.cli -a PPO \
  -m models/Env01-v2_PPO/best_model.npz test -e Env01-v2 --episodes 2 2>&1
echo "cli rc=$?"
echo "=== queue C done ==="

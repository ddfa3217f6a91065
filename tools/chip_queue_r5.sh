#!/bin/bash
# Round-5 chip queue (fallback codification — rounds are driven
# interactively; this records the intended sequence if the session is cut
# short).  One TPU process at a time (docs/PERFORMANCE.md gotchas).
#
# Outstanding items it covers:
#   [1-3] measured A2C / TD3 / DDPG outcomes on Env01-v2 — the last
#         unmeasured cell of the reference's algorithm-notes table
#         (reference README.md:168-195: "A2C/TD3 poor"; our SAC leg is
#         already measured at 97.4% recoverable-start full-horizon).
#         Each probe gets a bounded budget; "trains poorly" within it is
#         itself the expected parity finding — record the eval number
#         either way.
#   [4]   flagship hazard-density follow-up: if the r4d burst
#         (--train-block-delay 0.2, runs/burst_r4d.log) confirmed a win,
#         ratchet from ITS winner with a delay sweep; else try the
#         orthogonal severity axis (--train-block-speed 9).
#   [5]   round evidence: bench + both pallas drift bounds.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

echo "=== [1] A2C probe (SB3 defaults: n_steps 5, plain PG) ==="
# --gamma 0.999 matches the TD3/DDPG probes and the measured SAC/PPO runs;
# 0.99 at 1024 envs finds the pitch*dv reward exploit (CLI help), which
# would confound the "A2C trains poorly" parity cell with a reward artifact.
timeout 2400 python -m balance_robot_tpu.cli -a A2C train -e Env01-v2 \
  --num-envs 1024 --gamma 0.999 --max-wall 1800 --eval-freq 500000 --seed 0 \
  2>&1 | tee runs/a2c_env01v2_r5.log | tail -40
timeout 1200 python tools/eval_policy.py models/Env01-v2_A2C/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1 | tee runs/a2c_r5_eval.log

echo "=== [2] TD3 probe ==="
timeout 2400 python tools/train_offpolicy.py TD3 Env01-v2 --envs 64 \
  --grad-steps 8 --batch 256 --learning-starts 10000 \
  --max-steps 6000000 --max-wall 1800 --gamma 0.999 \
  --eval-freq 100000 --eval-episodes 16 --seed 0 \
  --run-name Env01-v2_TD3 2>&1 | tail -40
timeout 1200 python tools/eval_policy.py models/Env01-v2_TD3/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1 | tee runs/td3_r5_eval.log

echo "=== [3] DDPG probe (reference nets [300,200]/[200,150], sigma=0.1) ==="
timeout 2400 python tools/train_offpolicy.py DDPG Env01-v2 --envs 64 \
  --grad-steps 8 --batch 256 --learning-starts 10000 \
  --max-steps 6000000 --max-wall 1800 --gamma 0.999 \
  --eval-freq 100000 --eval-episodes 16 --seed 0 \
  --run-name Env01-v2_DDPG 2>&1 | tail -40
timeout 1200 python tools/eval_policy.py models/Env01-v2_DDPG/best_model.npz \
  --env Env01-v2 --episodes 256 --seed 7 2>&1 | tee runs/ddpg_r5_eval.log

echo "=== [4] flagship severity probe (hazard-density lever is dead:"
echo "    runs/burst_r4d.log monotone regression 85.2->74.0%) ==="
# Severity-only: --train-block-speed 9 without --train-block-delay, so a
# negative closes the severity axis unconfounded.  INIT stays the incumbent
# (r4d did NOT confirm — machine-checkable via burst_history.json.accepted
# for new runs; r4d predates the flag and its log shows the regression).
# min_win left at the auto 2*SE default; pooled fresh-seed gate on.
timeout 7200 python tools/burst_refine.py \
  --init models/Env03-v2_PPO/best_model.npz --out models/Env03-v2_r5a \
  --bursts 6 --burst-steps 2000000 --snap-steps 500000 \
  --envs 1024 --steps 32 --mb 1024 --privileged-critic \
  --train-block-speed 9.0 \
  --lr 5e-5 --gamma 0.999 --eval-episodes 512 --seed 41 \
  --confirm --max-wall 6600 2>&1 | tail -60
for s in 101 202; do
  timeout 3600 python tools/eval_policy.py \
    models/Env03-v2_r5a/best_model.npz --env Env03-v2 \
    --episodes 512 --seed $s 2>&1
done

echo "=== [5] round evidence: bench + drift ==="
timeout 5400 python bench.py 2>&1
echo "=== queue r5 done ==="

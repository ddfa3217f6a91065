#!/bin/bash
# Round-5 chip chain: wait for the TPU tunnel to serve again (the backend
# died ~09:46 with FAILED_PRECONDITION and then hung), then run the queued
# phases in order.  One TPU process at a time; every leg under timeout.
set -u
cd "$(dirname "$0")/.."
log() { echo "[chain $(date -u +%H:%M:%S)] $*"; }

log "probing chip (90s-timeout jax init, 120s poll)"
ok=0
while [ $ok -lt 2 ]; do
  if timeout 90 python -c "import jax, jax.numpy as jnp; jax.devices(); \
print(float(jnp.ones((8,8)).sum()))" >/dev/null 2>&1; then
    ok=$((ok+1)); log "probe ok ($ok/2)"
  else
    ok=0; log "chip still down"; sleep 120
  fi
done
log "chip is back"

log "=== [A2 rerun] teacher2 pooled eval (seed 101 died, 202 hung) ==="
for s in 101 202; do
  timeout 3600 python tools/eval_policy.py \
    models/Env03-v2_teacher2/best_model.npz --env Env03-v2 \
    --episodes 512 --seed $s 2>&1
done | tee runs/teacher2_r5_pooled.log | tail -8

bash tools/chip_r5_phaseB.sh 2>&1 | tail -5
bash tools/chip_r5_phaseC.sh 2>&1 | tail -5
log "chain done"

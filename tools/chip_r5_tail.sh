#!/bin/bash
# Round-5 tail: after the second tunnel outage (18:2x UTC), recover and run
# the round evidence FIRST (bench + drift asserts), then a bounded retry of
# the recoverability scaling point if the clock allows.
set -u
cd "$(dirname "$0")/.."
log() { echo "[tail $(date -u +%H:%M:%S)] $*"; }
DEADLINE=$(date -u -d "20:15" +%s 2>/dev/null || echo 0)

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

log "=== bench.py (round evidence + both drift asserts) ==="
timeout 3600 python bench.py > runs/bench_r5.json 2> runs/bench_r5.err
log "bench rc=$?"
cat runs/bench_r5.json

if [ "$(date -u +%s)" -lt "$DEADLINE" ]; then
  log "=== recoverability scaling point, bounded ==="
  timeout 3900 python tools/mpc_dagger.py \
    models/Env03-v2_PPO/best_model.npz --env Env03-v2 \
    --episodes 512 --max-fatal 48 --pop 256 --iters 3 \
    --plan-h 25 --exec-k 4 --tail-h 60 --replay-steps 148 \
    --seed 0 --dump runs/dagger_mpc_r5b.npz 2>&1 \
    | tee runs/mpc_oracle_r5b.log | tail -20
else
  log "past deadline — skipping the scaling probe"
fi
log "tail done"

#!/bin/bash
# Poll the TPU backend with a REAL jax init (not just a TCP connect — the
# round-2/3 failure mode is "relay port open, backend init blocked").
# Exits 0 the moment a matmul completes on the axon backend; exits 1 after
# --max-wait seconds. Writes status lines to runs/chip_probe.log.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
MAX_WAIT=${1:-14400}
POLL_S=${2:-180}
START=$(date +%s)
log() { echo "[chip_probe $(date -u +%H:%M:%S)] $*" | tee -a runs/chip_probe.log; }
log "probing axon backend (poll ${POLL_S}s, max ${MAX_WAIT}s)"
while true; do
  if timeout 150 python -c "
import jax, jax.numpy as jnp, numpy as np
d = jax.devices()
x = jnp.ones((128, 128))
assert float(np.asarray((x @ x).sum())) == 128.0 * 128 * 128
print('devices:', d)
" >> runs/chip_probe.log 2>&1; then
    log "CHIP UP"
    exit 0
  fi
  NOW=$(date +%s)
  if [ $((NOW - START)) -ge "$MAX_WAIT" ]; then
    log "giving up after ${MAX_WAIT}s"
    exit 1
  fi
  log "still down ($((NOW - START))s elapsed)"
  sleep "$POLL_S"
done

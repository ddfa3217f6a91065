#!/bin/bash
# Watch for the TPU tunnel relay (axon, ports in /root/.tpu_init.py) to come
# back, then run the round-3 chip work in order:
#   1. bench.py          -> runs/bench_r3_relayup.json  (BENCH evidence +
#                           both pallas drift asserts, VERDICT item 2)
#   2. chip_queue_r3.sh  -> runs/chip_queue_r3.log      (flagship levers,
#                           VERDICT item 1)
# One TPU process at a time (docs/TRAINING.md).  The relay is parent-owned
# stdio and not restartable from in-session; all we can do is poll.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs

PROBE_PORT=8082
POLL_S=60

log() { echo "[relay_watch $(date -u +%H:%M:%S)] $*"; }

log "watching 127.0.0.1:${PROBE_PORT} (poll ${POLL_S}s)"
while true; do
  if timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/${PROBE_PORT}" 2>/dev/null; then
    log "port open; confirming stability (30s)"
    sleep 30
    if timeout 2 bash -c "echo > /dev/tcp/127.0.0.1/${PROBE_PORT}" 2>/dev/null; then
      log "relay is UP"
      break
    fi
    log "flapped; resuming watch"
  fi
  sleep "${POLL_S}"
done

log "=== bench.py (BENCH_r03 evidence + drift asserts) ==="
timeout 5400 python bench.py \
  > runs/bench_r3_relayup.json 2> runs/bench_r3_relayup.err
rc=$?
log "bench rc=${rc}"
cat runs/bench_r3_relayup.json 2>/dev/null
cat runs/bench_r3_relayup.err 2>/dev/null

log "=== chip_queue_r3.sh (flagship levers) ==="
bash tools/chip_queue_r3.sh > runs/chip_queue_r3.log 2>&1
log "chip queue done rc=$?"

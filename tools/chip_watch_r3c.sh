#!/bin/bash
# Probe the axon backend with a REAL jax matmul (TCP connect is not
# evidence — the relay port stays open while the far end is dead) and run
# chip_queue_r3c.sh the moment it answers.
set -u
cd "$(dirname "$0")/.."
mkdir -p runs
if bash tools/chip_probe.sh "${1:-10800}" "${2:-120}"; then
  echo "[chip_watch_r3c] chip up -> queue C" >> runs/chip_probe.log
  bash tools/chip_queue_r3c.sh > runs/chip_queue_r3c.log 2>&1
  echo "[chip_watch_r3c] queue C rc=$?" >> runs/chip_probe.log
else
  echo "[chip_watch_r3c] gave up waiting for the chip" >> runs/chip_probe.log
fi

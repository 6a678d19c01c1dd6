#!/bin/bash
# TPU-return watcher (round 2): the tunnel chip has been unreachable since
# ~16:00; when it comes back, run in order
#   1. tools/diag_blockwarp.py       — Pallas block_warp compile/numerics/
#                                      wall-clock vs tile/exact (fails fast)
#   2. od_warp_study.py bench 1080p  — in-model DMC A/B with the FIXED
#                                      packed flow_warp auto-impl
#                                      (re-measurement queued in RDNOTES §1)
#   3. python bench.py               — headline JSON with the RD-gated
#                                      tile default
# Logs to out/warp_gate/tpu_return.log. Probe cadence ~4.5 min.
cd /root/repo
mkdir -p out/warp_gate
LOG=out/warp_gate/tpu_return.log
echo "=== tpu-return watcher start $(date -u +%H:%M:%S) ===" >> "$LOG"
for i in $(seq 1 160); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print('claimed:', float(jnp.ones((8,8)).sum()))" >> "$LOG" 2>&1; then
    echo "=== chip up (probe $i) $(date -u +%H:%M:%S) ===" >> "$LOG"
    echo "=== 1. diag_blockwarp ===" >> "$LOG"
    timeout 3600 python tools/diag_blockwarp.py >> "$LOG" 2>&1
    echo "=== 2. in-model 1080p A/B ===" >> "$LOG"
    timeout 7200 python tools/od_warp_study.py bench --height 1088 \
      --width 1920 --bf16 \
      --tile_modes "tile:16,2+block:4,4,64,128+block:6,4,32,128+mcblock:4,4,64,128+allblock:4,4,64,128" \
      >> "$LOG" 2>&1
    echo "=== 3. bench.py ===" >> "$LOG"
    timeout 7200 python bench.py >> "$LOG" 2>&1
    echo "=== 4. train-step timing (B=2,4 remat, VERDICT #8) ===" >> "$LOG"
    timeout 5400 python tools/diag_trainstep.py >> "$LOG" 2>&1
    echo "=== watcher done $(date -u +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  sleep 45
done
echo "=== watcher gave up $(date -u +%H:%M:%S) ===" >> "$LOG"

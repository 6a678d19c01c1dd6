#!/bin/bash
# Claim the TPU when it frees (short-timeout probes — axon init HANGS while
# the chip is held), then re-measure the 1080p in-model warp A/B with the
# fixed flow_warp auto impl (exact + tile:16,2 + tile:32,2 + tile:32,1).
cd /root/repo
LOG=out/warp_gate/tpu_ab.log
mkdir -p out/warp_gate
echo "=== tpu-ab watcher start $(date -u +%H:%M:%S) ===" >> "$LOG"
for attempt in $(seq 1 200); do
  echo "=== probe $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print('claimed:', float(jnp.ones((8,8)).sum()))" >> "$LOG" 2>&1; then
    echo "=== A/B bench $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 5400 python tools/od_warp_study.py bench --height 1088 \
      --width 1920 --bf16 \
      --tile_modes "tile:16,2+tile:32,2+tile:32,1" \
      >> "$LOG" 2>&1 && break
  fi
  sleep 45
done
echo "=== tpu-ab done $(date -u +%H:%M:%S) ===" >> "$LOG"

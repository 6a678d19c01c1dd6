#!/bin/bash
# Post-proxy chain: wait for tools/run_warp_proxy_tpu.sh to finish
# (out/warp_proxy/proxy_check.json is written LAST by train_warp_proxy.py),
# then
#   1. RD gate on the trained checkpoint (CPU — numerics only):
#      od_warp_study dmc --restore, in-distribution MotionClips pairs
#   2. wall-clock A/B on the freed chip with the fixed flow_warp auto
#      impl (exact + tile:16,2 + tile:32,2 + tile:32,1, 1080p bf16)
# Logs to out/warp_gate/log.txt.
cd /root/repo
mkdir -p out/warp_gate
LOG=out/warp_gate/log.txt
CHECK=out/warp_proxy/proxy_check.json
echo "=== watcher start $(date -u +%H:%M:%S) ===" >> "$LOG"
for i in $(seq 1 720); do   # up to 6h
  [ -f "$CHECK" ] && [ "$CHECK" -nt tools/run_warp_gate_after_proxy.sh ] && break
  sleep 30
done
if ! { [ -f "$CHECK" ] && [ "$CHECK" -nt tools/run_warp_gate_after_proxy.sh ]; }; then
  echo "=== watcher timed out waiting for $CHECK ===" >> "$LOG"
  exit 1
fi
echo "=== proxy done; RD gate (CPU) $(date -u +%H:%M:%S) ===" >> "$LOG"
PYTHONPATH= JAX_PLATFORMS=cpu timeout 3600 python tools/od_warp_study.py dmc \
  --restore out/warp_proxy/proxy.npz --data motion --n_pairs 6 \
  --height 128 --width 128 --motion 5 \
  --tile_modes "tile:16,2,median+tile:32,2,median+tile:32,1,median" \
  >> "$LOG" 2>&1
echo "=== RD gate (CPU, 256px) $(date -u +%H:%M:%S) ===" >> "$LOG"
PYTHONPATH= JAX_PLATFORMS=cpu timeout 7200 python tools/od_warp_study.py dmc \
  --restore out/warp_proxy/proxy.npz --data motion --n_pairs 4 \
  --height 256 --width 256 --motion 8 \
  --tile_modes "tile:16,2,median+tile:32,2,median+tile:32,1,median" \
  >> "$LOG" 2>&1
echo "=== TPU wall-clock A/B $(date -u +%H:%M:%S) ===" >> "$LOG"
for attempt in $(seq 1 60); do
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print('claimed:', float(jnp.ones((8,8)).sum()))" >> "$LOG" 2>&1; then
    timeout 5400 python tools/od_warp_study.py bench --height 1088 \
      --width 1920 --bf16 \
      --tile_modes "tile:16,2+tile:32,2+tile:32,1" \
      >> "$LOG" 2>&1 && break
  fi
  sleep 45
done
echo "=== watcher done $(date -u +%H:%M:%S) ===" >> "$LOG"

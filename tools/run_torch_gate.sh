#!/bin/bash
# Wait for tools/train_torch_proxy.py to finish (proxy_check.json is
# written last), then run the exact-vs-tile RD gate on the ported
# reference-trained checkpoint (CPU numerics, in-distribution MotionClips).
cd /root/repo
LOG=out/warp_gate/torch_gate.log
CHECK=out/torch_proxy/proxy_check.json
mkdir -p out/warp_gate
echo "=== torch-gate watcher start $(date -u +%H:%M:%S) ===" >> "$LOG"
for i in $(seq 1 480); do
  [ -f "$CHECK" ] && break
  sleep 30
done
if [ ! -f "$CHECK" ]; then
  echo "=== timed out waiting for $CHECK ===" >> "$LOG"
  exit 1
fi
sleep 5
echo "=== proxy_check: ===" >> "$LOG"
cat "$CHECK" >> "$LOG"
echo "=== RD gate (CPU, 128px, in-distribution motion 5) $(date -u +%H:%M:%S) ===" >> "$LOG"
PYTHONPATH= JAX_PLATFORMS=cpu timeout 5400 python tools/od_warp_study.py dmc \
  --restore out/torch_proxy/proxy.npz --data motion --n_pairs 6 \
  --height 128 --width 128 --motion 5 \
  --tile_modes "tile:16,2,median+tile:32,2,median+tile:32,1,median" \
  >> "$LOG" 2>&1
echo "=== torch-gate done $(date -u +%H:%M:%S) ===" >> "$LOG"

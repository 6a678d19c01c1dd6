#!/bin/bash
# Follow-up TPU measurements, gated on the tpu-return watcher finishing its
# queue (tools/run_tpu_return.sh -> out/warp_gate/tpu_return.log):
#   - in-model 1080p A/B for tile:32,2 and tile:32,1 (the half-slice-count
#     default candidates, RDNOTES.md §2; re-measure with the fixed packed
#     flow_warp auto-impl alongside the shipped tile:16,2)
# Logs to out/warp_gate/tpu_followup.log. Probe cadence ~5 min.
cd /root/repo
LOG=out/warp_gate/tpu_followup.log
MAIN=out/warp_gate/tpu_return.log
echo "=== tpu-followup watcher start $(date -u +%H:%M:%S) ===" >> "$LOG"
for i in $(seq 1 150); do
  if grep -q "watcher done" "$MAIN" 2>/dev/null; then
    echo "=== main watcher done; running followups $(date -u +%H:%M:%S) ===" >> "$LOG"
    timeout 7200 python tools/od_warp_study.py bench --height 1088 \
      --width 1920 --bf16 \
      --tile_modes "tile:16,2+tile:32,2+tile:32,1" >> "$LOG" 2>&1
    echo "=== followup done $(date -u +%H:%M:%S) ===" >> "$LOG"
    exit 0
  fi
  if grep -q "watcher gave up" "$MAIN" 2>/dev/null; then
    echo "=== main watcher gave up; exiting $(date -u +%H:%M:%S) ===" >> "$LOG"
    exit 1
  fi
  sleep 300
done
echo "=== followup gave up $(date -u +%H:%M:%S) ===" >> "$LOG"

#!/bin/bash
# Session-6 TPU measurement queue (chip is back up).
cd /root/repo
LOG=out/warp_gate/s6_queue.log
echo "=== s6 queue start $(date -u +%H:%M:%S) ===" >> "$LOG"
echo "=== 1. diag_blockwarp small-only (on-chip numerics) ===" >> "$LOG"
timeout 900 python tools/diag_blockwarp.py --small-only >> "$LOG" 2>&1
echo "=== 2. in-model 1080p A/B (tile + block candidates) $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 4500 python tools/od_warp_study.py bench --height 1088 --width 1920 --bf16 \
  --tile_modes "tile:16,2+tile:32,2+tile:32,1+block:4,4,64,128+block:6,4,32,128+mcblock:4,4,64,128+allblock:4,4,64,128" \
  >> "$LOG" 2>&1
echo "=== 3. bench.py $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 2700 python bench.py >> "$LOG" 2>&1
echo "=== 4. diag_trainstep (VERDICT #8) $(date -u +%H:%M:%S) ===" >> "$LOG"
timeout 1800 python tools/diag_trainstep.py >> "$LOG" 2>&1
echo "=== s6 queue done $(date -u +%H:%M:%S) ===" >> "$LOG"

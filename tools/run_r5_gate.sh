#!/bin/bash
# Round-5 warp-RD gate (VERDICT r4 #2b): >=16 pairs x 3 rate points,
# BD-rate vs exact, demotion-candidate arms included. Runs on the real
# chip against the converged r4 proxy checkpoint. Decision rule is
# pre-committed in RDNOTES.md §5.
set -u
CK=${GATE_CKPT:-out/warp_proxy_r4/proxy.npz}
LOG=${GATE_LOG:-out/r5_gate.log}
ARMS=${GATE_ARMS:-allblock:4,4,64,128,median4+block:4,4,64,128,median4+alltile:32,2,median}
Q=${GATE_Q:-0.6,1.0,1.6}

echo "=== r5 gate start $(date -u +%H:%M:%S) ckpt=$CK ===" >> "$LOG"
# Arm 1: 1080p synthetic layered pairs (the block scheme's worst case)
timeout 5400 python -u tools/od_warp_study.py dmc \
    --height 1088 --width 1920 --restore "$CK" --bf16 \
    --data synthetic --n_pairs 8 --motion 8 \
    --q_scales "$Q" --tile_modes "$ARMS" >> "$LOG" 2>&1
echo "=== synthetic done $(date -u +%H:%M:%S) ===" >> "$LOG"
# Arm 2: 1088x1088 in-distribution MotionClips pairs
timeout 5400 python -u tools/od_warp_study.py dmc \
    --height 1088 --width 1088 --restore "$CK" --bf16 \
    --data motion --n_pairs 8 --motion 10 \
    --q_scales "$Q" --tile_modes "$ARMS" >> "$LOG" 2>&1
echo "=== r5 gate done $(date -u +%H:%M:%S) ===" >> "$LOG"

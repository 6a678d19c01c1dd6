#!/bin/bash
# Round-4 post-training queue: waits for the converged proxy, then runs
# the 1080p warp gates (VERDICT r2 #3 at eval resolution), a batch-2
# throughput probe, and the per-stage breakdown. Each step logs to out/.
set -u
WORKDIR=${PROXY_WORKDIR:-out/warp_proxy_r4}
MODES="allblock:4,4,64,128,median4+alltile:32,2,median"

for i in $(seq 1 400); do
    [ -f "$WORKDIR/proxy_check.json" ] && break
    sleep 30
done
if [ ! -f "$WORKDIR/proxy_check.json" ]; then
    echo "proxy never completed" > out/r4_gate.log
    exit 1
fi
cat "$WORKDIR/proxy_check.json" > out/r4_gate.log

# gate 1: full-1080p synthetic layered motion, shipped bf16 dtype
timeout 2700 python tools/od_warp_study.py dmc \
    --restore "$WORKDIR/proxy.npz" --height 1088 --width 1920 \
    --data synthetic --motion 12 --n_pairs 3 --bf16 \
    --tile_modes "$MODES" >> out/r4_gate.log 2>&1

# gate 2: in-distribution MotionClips at 1088x1088 crops
timeout 2700 python tools/od_warp_study.py dmc \
    --restore "$WORKDIR/proxy.npz" --height 1088 --width 1088 \
    --data motion --motion 10 --n_pairs 4 --bf16 \
    --tile_modes "$MODES" >> out/r4_gate.log 2>&1

echo "=== gates done $(date -u +%H:%M:%S) ===" >> out/r4_gate.log

#!/bin/bash
# Babysit tools/train_warp_proxy.py against remote-TPU tunnel drops: the
# trainer checkpoints every 500-step epoch and resumes from the last saved
# epoch, so kill+relaunch on a stall (no log growth for STALL_S) loses at
# most one epoch. Only the child started HERE is ever killed (by PID).
set -u
LOG=${PROXY_LOG:-out/r4_proxy_train2.log}
WORKDIR=${PROXY_WORKDIR:-out/warp_proxy_r4}
STALL_S=${PROXY_STALL_S:-540}
ARGS=${PROXY_ARGS:---crop 256 --batch_size 2 --flow_steps 800 \
  --rd_steps 3000 --cascade_steps 500 --max_v 10}

rm -f "$WORKDIR/proxy_check.json"
for attempt in $(seq 1 15); do
    echo "=== attempt $attempt $(date -u +%H:%M:%S) ===" >> "$LOG"
    # -u: stdout is block-buffered when redirected; without it the
    # per-step progress print can sit unflushed past STALL_S and the
    # babysitter kills healthy runs (ADVICE r4).
    python -u tools/train_warp_proxy.py $ARGS --workdir "$WORKDIR" \
        >> "$LOG" 2>&1 &
    PID=$!
    while kill -0 "$PID" 2>/dev/null; do
        SZ1=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
        sleep "$STALL_S"
        kill -0 "$PID" 2>/dev/null || break
        SZ2=$(stat -c %s "$LOG" 2>/dev/null || echo 0)
        if [ "$SZ1" = "$SZ2" ]; then
            echo "=== stall: killing $PID $(date -u +%H:%M:%S) ===" >> "$LOG"
            kill "$PID" 2>/dev/null
            sleep 10
            kill -9 "$PID" 2>/dev/null
            break
        fi
    done
    wait "$PID" 2>/dev/null
    if [ -f "$WORKDIR/proxy_check.json" ]; then
        echo "=== complete $(date -u +%H:%M:%S) ===" >> "$LOG"
        exit 0
    fi
    sleep 20
done
echo "=== gave up after 15 attempts ===" >> "$LOG"
exit 1

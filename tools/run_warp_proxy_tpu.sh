#!/bin/bash
# Persistent launcher: wait for the TPU claim (short-timeout probes — the
# axon init HANGS rather than errors while the chip is held), then run the
# warp-RD proxy training (crash-resumes via flow_warm.npz).
# Logs to out/warp_proxy/log.txt.
cd /root/repo
mkdir -p out/warp_proxy
for attempt in $(seq 1 200); do
  echo "=== probe $attempt $(date -u +%H:%M:%S) ===" >> out/warp_proxy/log.txt
  if timeout 240 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print('claimed:', float(jnp.ones((8,8)).sum()))" >> out/warp_proxy/log.txt 2>&1; then
    echo "=== train $(date -u +%H:%M:%S) ===" >> out/warp_proxy/log.txt
    timeout 14400 python tools/train_warp_proxy.py \
      --crop 128 --batch_size 8 --flow_steps 1500 --rd_steps 4500 \
      --cascade_steps 300 --workdir out/warp_proxy \
      >> out/warp_proxy/log.txt 2>&1 && break
  fi
  sleep 45
done
echo "=== launcher done $(date -u +%H:%M:%S) ===" >> out/warp_proxy/log.txt

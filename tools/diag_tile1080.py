#!/usr/bin/env python
"""Standalone 1080p OD-shaped warp timing: exact vs tile_warp chunk sizes.

Round-2 isolation harness: in-model the tile warp measured SLOWER than the
exact warp at 1080p while the 720p standalone diag said ~2x the other way.
This times the PRODUCTION ops/warp.py paths on the OD workload shape
(32 maps x 3ch, 1080p) outside the model, across chunk sizes, both dtypes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.ops.warp import flow_warp, tile_warp


def main():
    M, H, W, C = 32, 1088, 1920, 3
    key = jax.random.PRNGKey(0)
    src = jax.random.uniform(key, (M, H, W, C), jnp.float32)
    off = (jax.random.uniform(jax.random.PRNGKey(1), (M, H, W, 2)) - 0.5) * 2
    # smooth the offsets a little so tile bases are representative
    off = jax.image.resize(
        jax.image.resize(off, (M, H // 8, W // 8, 2), "linear"),
        (M, H, W, 2), "linear") * 4

    def timed(name, fn):
        # off must be a jit ARG, not a closure constant: baked 167MB
        # constants overflow the remote-compile request (HTTP 413).
        f = jax.jit(fn)
        try:
            x = f(src, off)  # warm/compile
            np.asarray(x[0])  # full-array readback = the only true sync
            t0 = time.time()
            x = src
            for _ in range(4):  # dependent chain: output feeds next input
                x = f(x, off)
            np.asarray(x[0])
            dt = (time.time() - t0) / 4
            print(f"{name}: {dt*1e3:8.1f} ms", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}",
                  flush=True)

    timed("exact packed f32", lambda s, o: flow_warp(s, o))
    for chunk in (1, 2, 4, 8):
        timed(f"tile:16,2 chunk={chunk} f32",
              lambda s, o, ch=chunk: tile_warp(s, o, 16, 2, "median", ch))
    timed("tile:32,1 chunk=4 f32",
          lambda s, o: tile_warp(s, o, 32, 1, "median", 4))
    timed("tile:32,2 chunk=4 f32",
          lambda s, o: tile_warp(s, o, 32, 2, "median", 4))


if __name__ == "__main__":
    main()

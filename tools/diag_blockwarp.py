#!/usr/bin/env python
"""Standalone block_warp TPU diagnostic: compile check, numerics vs the
jnp oracle, and wall-clock vs tile_warp / flow_warp at OD shape.

Run FIRST when the chip returns, before the in-model A/B — a Mosaic
lowering rejection or numerics drift shows up here in ~a minute instead
of inside a 20-minute DMC compile.

  python tools/diag_blockwarp.py [--height 1088 --width 1920 --maps 32
                                  --ch 3] [--small-only]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np


def _sync(x):
    return float(jnp.sum(x.astype(jnp.float32)))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--maps", type=int, default=32)
    p.add_argument("--ch", type=int, default=3)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--small-only", action="store_true")
    p.add_argument("--modes",
                   default="8,2+4,4,64,128+6,4,32,128"
                           "+4,4,64,128,median4+4,4,64,128,mean",
                   help="block Dh,Rv[,BH,BW[,base]] list, '+'-separated")
    args = p.parse_args()

    from dcvc_tpu.ops.block_warp import block_warp, block_warp_ref
    from dcvc_tpu.ops.warp import flow_warp, tile_warp

    print(json.dumps({"backend": jax.default_backend(),
                      "devices": str(jax.devices())}), flush=True)

    # --- numerics on-device vs oracle (small shape) ---
    rng = np.random.default_rng(0)
    M, H, W, C = 4, 64, 256, 3
    im = jnp.asarray(rng.random((M, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.normal(0, 1.5, (M, H, W, 2))
                       + np.array([4.0, -3.0]), jnp.float32)
    ref = np.asarray(block_warp_ref(im, flow, 8, 2, 8, 128))
    try:
        t0 = time.time()
        ker = np.asarray(block_warp(im, flow, 8, 2, 8, 128))
        err = float(np.abs(ker - ref).max())
        print(json.dumps({"check": "small_numerics",
                          "compile_s": round(time.time() - t0, 1),
                          "max_err": err, "ok": err < 1e-5}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"check": "small_numerics",
                          "error": repr(e)[:800]}), flush=True)
        return
    if args.small_only:
        return

    # --- wall-clock at OD shape (chained iterations, one readback) ---
    M, H, W, C = args.maps, args.height, args.width, args.ch
    im = jnp.asarray(rng.random((M, H, W, C)), jnp.float32)
    flow = jnp.asarray(rng.normal(0, 1.5, (M, H, W, 2))
                       + np.array([4.0, -3.0]), jnp.float32)

    def bench(name, fn):
        try:
            t0 = time.time()
            out = fn(im, flow)
            _sync(out)
            compile_s = time.time() - t0
            t0 = time.time()
            for _ in range(args.iters):
                out = fn(im + out * 1e-6, flow)  # chain: no dead-code
            _sync(out)
            ms = (time.time() - t0) / args.iters * 1e3
            print(json.dumps({"mode": name, "ms": round(ms, 1),
                              "compile_s": round(compile_s, 1)}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"mode": name, "error": repr(e)[:800]}),
                  flush=True)

    bench("exact(flow_warp)", jax.jit(flow_warp))
    bench("tile:16,2", jax.jit(lambda a, b: tile_warp(a, b, 16, 2)))
    bench("tile:32,1", jax.jit(lambda a, b: tile_warp(a, b, 32, 1)))
    for spec in args.modes.split("+"):
        parts = spec.split(",")
        base = parts[4] if len(parts) > 4 else "median"
        v = [int(s) for s in parts[:4]]
        dh, rv = v[0], v[1]
        bh = v[2] if len(v) > 2 else 8
        bw = v[3] if len(v) > 3 else 512
        bench(f"block:{spec}",
              lambda a, b, dh=dh, rv=rv, bh=bh, bw=bw, base=base:
              block_warp(a, b, dh, rv, bh, bw, base))

    # DMA pipeline depth sweep on the RD-preferred shape: with depth=2 only
    # ONE window copy is in flight; if the ~114us fixed dynamic-offset DMA
    # cost (tools/diag_dma.py) dominates, deeper buffering is the fix.
    for depth in (4, 8, 16):
        bench(f"block:4,4,64,128,median4,d{depth}",
              lambda a, b, depth=depth:
              block_warp(a, b, 4, 4, 64, 128, "median4", depth=depth))


if __name__ == "__main__":
    main()

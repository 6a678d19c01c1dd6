#!/usr/bin/env python
"""Trustworthy DMC timing: force device->host transfer of a scalar each iter.

block_until_ready alone showed 1 ms steady for a 2.6 TFLOP program on the
axon remote platform (impossible: v5e bf16 peak ~197 TFLOPs -> >=13 ms), so
this variant times N iterations ending in a host readback of a reduced
scalar, which cannot complete before the computation does.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp
import numpy as np


def main():
    H = int(os.environ.get("DIAG_H", 704))
    W = int(os.environ.get("DIAG_W", 1280))
    iters = int(os.environ.get("DIAG_ITERS", 10))
    from dcvc_tpu.models.video_dc import DMC

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    jax.block_until_ready(params)
    print("init done", flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    dpb_i = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
             "ref_y": None, "ref_mv_y": None}

    @jax.jit
    def fwd(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1)
        dpb = out["dpb"]
        # scalar probe forces the full frame to be computed before readback
        return dpb, out["bpp"], jnp.sum(dpb["ref_frame"])

    dpb, bpp, probe = fwd(params, x, dpb_i, qs)
    print(f"first P-dpb probe: {float(probe):.2f} bpp={np.asarray(bpp)}",
          flush=True)
    t0 = time.time()
    for _ in range(iters):
        dpb, bpp, probe = fwd(params, x, dpb, qs)
        _ = float(probe)  # host sync every iteration
    dt = (time.time() - t0) / iters
    print(f"synced steady: {dt * 1000:.1f} ms/frame ({1 / dt:.1f} fps)",
          flush=True)

    # async chain: submit all, sync once (pipelined dispatch, closer to a
    # real GOP loop where rANS overlaps)
    t0 = time.time()
    for _ in range(iters):
        dpb, bpp, probe = fwd(params, x, dpb, qs)
    _ = float(probe)
    dt = (time.time() - t0) / iters
    print(f"chained steady: {dt * 1000:.1f} ms/frame ({1 / dt:.1f} fps)",
          flush=True)


def readback_probe():
    """Characterize per-frame host readback cost in a runner-style loop."""
    import numpy as np
    H = int(os.environ.get("DIAG_H", 704))
    W = int(os.environ.get("DIAG_W", 1280))
    from dcvc_tpu.models.video_dc import DMC

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    jax.block_until_ready(params)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    dpb_i = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
             "ref_y": None, "ref_mv_y": None}

    @jax.jit
    def fwd(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1)
        return out["dpb"], out["bpp"], jnp.sum(out["dpb"]["ref_frame"])

    dpb, bpp, probe = fwd(params, x, dpb_i, qs)
    _ = float(probe)
    n = int(os.environ.get("DIAG_ITERS", 5))
    # runner pattern: per-frame np.asarray of the reconstructed frame
    t0 = time.time()
    for _ in range(n):
        dpb, bpp, probe = fwd(params, x, dpb, qs)
        _ = np.asarray(dpb["ref_frame"][0, :8, :8])  # small slab readback
    dt = (time.time() - t0) / n
    print(f"per-frame slab readback: {dt*1000:.0f} ms/frame", flush=True)
    t0 = time.time()
    for _ in range(n):
        dpb, bpp, probe = fwd(params, x, dpb, qs)
        _ = np.asarray(dpb["ref_frame"])  # full frame (10.8MB)
    dt = (time.time() - t0) / n
    print(f"per-frame full readback: {dt*1000:.0f} ms/frame", flush=True)


if __name__ == "__main__":
    if os.environ.get("DIAG_READBACK"):
        readback_probe()
    else:
        main()

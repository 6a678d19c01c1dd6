#!/usr/bin/env python
"""Calibrate the axon TPU path: readback latency, matmul/conv peak, warp cost,
DMC stage costs — all timed by chaining N dependent iterations and reading
back ONE scalar at the end (block_until_ready does not reliably block on the
axon remote platform, and per-iteration readbacks add huge latency).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp
import numpy as np


def bench(tag, fn, args, iters=10, flops=None):
    """Chain iters dependent calls, read one scalar back, report per-iter."""
    out = fn(*args)
    _ = float(out[-1]) if isinstance(out, tuple) else float(jnp.sum(out))
    t0 = time.time()
    cur = args
    for _ in range(iters):
        out = fn(*cur)
        cur = out[:-1] + (cur[-1],) if isinstance(out, tuple) else cur
        probe = out[-1] if isinstance(out, tuple) else out
    _ = float(jnp.sum(probe))
    dt = (time.time() - t0) / iters
    extra = f" {flops / dt / 1e12:.1f} TFLOP/s" if flops else ""
    print(f"{tag}: {dt * 1000:.1f} ms/iter{extra}", flush=True)
    return dt


def main():
    # 1. readback latency
    one = jnp.ones(())
    f = jax.jit(lambda a: a + 1)
    v = f(one)
    _ = float(v)
    t0 = time.time()
    for _ in range(5):
        v = f(v)
        _ = float(v)
    print(f"scalar roundtrip: {(time.time() - t0) / 5 * 1000:.1f} ms", flush=True)

    # 2. matmul peak (bf16), 4096^3 = 137 GFLOP/iter
    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def mm(a):
        return a @ a * jnp.bfloat16(1e-3)

    bench("matmul 4096 bf16", mm, (a,), iters=20, flops=2 * n**3)

    # 3. conv stack: 10x conv3x3 128ch at 704x1280 bf16
    x = jnp.ones((1, 704, 1280, 128), jnp.bfloat16)
    w = jnp.ones((3, 3, 128, 128), jnp.bfloat16) * jnp.bfloat16(1e-3)

    @jax.jit
    def convs(x, w):
        for _ in range(10):
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x

    fl = 10 * 2 * 704 * 1280 * 128 * 128 * 9
    bench("conv3x3x10 128ch 720p bf16", convs, (x, w), iters=5, flops=fl)

    # 4. flow_warp at 720p, 48ch
    from dcvc_tpu.ops.warp import flow_warp

    im = jnp.ones((1, 704, 1280, 48), jnp.bfloat16)
    flow = jnp.ones((1, 704, 1280, 2), jnp.float32)

    @jax.jit
    def warp(im, flow):
        out = flow_warp(im, flow)
        return out

    bench("flow_warp 720p 48ch", warp, (im,), iters=5)

    # warp chained through itself (dependent)
    @jax.jit
    def warp_dep(im):
        return flow_warp(im, flow)

    bench("flow_warp dep", warp_dep, (im,), iters=5)

    # 5. DMC stages, each self-chained where possible
    from dcvc_tpu.models.video_dc import DMC

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    _ = float(jnp.sum(params["params"]["feature_adaptor_I"]["kernel"]))

    H, W = 704, 1280
    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))

    @jax.jit
    def flow_stage(x, ref):
        mv = module.apply(params, x, ref, method=lambda m, a, b: m.optic_flow(a, b))
        return x + jnp.mean(mv), mv

    def flow_loop(x, ref):
        out, mv = flow_stage(x, ref)
        return out, ref, jnp.sum(mv)

    bench("optic_flow 720p", flow_loop, (x, ref), iters=5)

    dpb = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}

    @jax.jit
    def mocomp(x, dpb, mv):
        def go(m, dpb, mv):
            return m.motion_compensation(dpb, mv, 1)
        c1, c2, c3, wf = module.apply(params, dpb, mv, method=go)
        return x + jnp.mean(c1) + jnp.mean(c2) + jnp.mean(c3), c1

    mv = jnp.zeros((1, H, W, 2), jnp.float32)

    def mocomp_loop(x, dpb, mv):
        out, c1 = mocomp(x, dpb, mv)
        return out, dpb, mv, jnp.sum(c1)

    bench("motion_comp 720p (I-dpb)", mocomp_loop, (x, dpb, mv), iters=5)


if __name__ == "__main__":
    main()

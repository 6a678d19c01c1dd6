#!/usr/bin/env python
"""Benchmark bilinear-warp gather formulations on the axon TPU.

The naive im[b, yy, xx] gather runs ~100x off memory speed-of-light
(241 ms for 48ch 720p). Candidates:
  A. baseline: advanced indexing [B,H,W,C] with [B,H,W] index arrays
  B. flat spatial, take_along_axis on axis=1 of [B, H*W, C] (4 taps)
  C. flat spatial minor-most: [B, C, H*W], take_along_axis on lanes
  D. one_hot matmul over W then H? (skipped: O(N^2) memory)
  E. roll-based bounded-displacement decomposition (exact only if
     |floor(disp)| <= D): sum over (2D+1)^2 shifts — try D=2 to gauge cost/term
  F. Pallas: per-row dynamic-slice loop (gauges Mosaic scalar-loop cost)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp


def chain(tag, step, state, iters=5):
    try:
        s0 = step(state)
        _ = float(jnp.sum(s0))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
        return None
    t0 = time.time()
    s = state
    for _ in range(iters):
        s = step(s)
    _ = float(jnp.sum(s))
    dt = (time.time() - t0) / iters
    print(f"{tag}: {dt * 1000:.1f} ms", flush=True)
    return dt


H, W, C = 704, 1280, 48
B = 1
key = jax.random.PRNGKey(0)
flow = (jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 2)) - 0.5) * 8.0


def common_indices(dtype=jnp.float32):
    xs = jnp.arange(W, dtype=dtype)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=dtype)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    x0r = x0.astype(jnp.int32)
    y0r = y0.astype(jnp.int32)
    x0i = jnp.clip(x0r, 0, W - 1)
    x1i = jnp.clip(x0r + 1, 0, W - 1)
    y0i = jnp.clip(y0r, 0, H - 1)
    y1i = jnp.clip(y0r + 1, 0, H - 1)
    return x0i, x1i, y0i, y1i, wx, wy


def warp_a(im):
    x0i, x1i, y0i, y1i, wx, wy = common_indices()
    b = jnp.arange(B)[:, None, None]

    def g(yy, xx):
        return im[b, yy, xx]

    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def warp_b(im):
    x0i, x1i, y0i, y1i, wx, wy = common_indices()
    imf = im.reshape(B, H * W, C)

    def g(yy, xx):
        lin = (yy * W + xx).reshape(B, H * W, 1)
        return jnp.take_along_axis(imf, lin, axis=1).reshape(B, H, W, C)

    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return (top * (1 - wy) + bot * wy)


def warp_c(im):
    x0i, x1i, y0i, y1i, wx, wy = common_indices()
    imf = im.transpose(0, 3, 1, 2).reshape(B, C, H * W)

    def g(yy, xx):
        lin = (yy * W + xx).reshape(B, 1, H * W)
        lin = jnp.broadcast_to(lin, (B, C, H * W))
        out = jnp.take_along_axis(imf, lin, axis=2)
        return out.reshape(B, C, H, W).transpose(0, 2, 3, 1)

    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return (top * (1 - wy) + bot * wy)


def warp_e(im, D=2):
    # roll-based: exact iff floor-displacements within [-D, D]
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    sx = (x0 - jnp.arange(W, dtype=jnp.float32)[None, None, :]).astype(jnp.int32)
    sy = (y0 - jnp.arange(H, dtype=jnp.float32)[None, :, None]).astype(jnp.int32)
    out = jnp.zeros_like(im)
    for r in range(-D, D + 2):
        imr = jnp.roll(im, -r, axis=1)
        my0 = (sy == r)[..., None]
        my1 = (sy == r - 1)[..., None]
        rowsel = my0 * (1 - wy) + my1 * wy
        for s in range(-D, D + 2):
            ims = jnp.roll(imr, -s, axis=2)
            mx0 = (sx == s)[..., None]
            mx1 = (sx == s - 1)[..., None]
            colsel = mx0 * (1 - wx) + mx1 * wx
            out = out + ims * (rowsel * colsel)
    return out


def main():
    im = jax.random.uniform(key, (B, H, W, C))

    for tag, fn in [("A baseline-indexing", warp_a),
                    ("B flat-takealong-sublane", warp_b),
                    ("C flat-takealong-lane", warp_c)]:
        jfn = jax.jit(lambda im, fn=fn: fn(im) + 1e-6 * jnp.mean(im))
        chain(tag, jfn, im)

    jfn = jax.jit(lambda im: warp_e(im, 2) + 1e-6 * jnp.mean(im))
    chain("E roll D=2 (25 terms)", jfn, im)

    # check agreement A vs B vs C on small slab
    a = warp_a(im)
    bb = warp_b(im)
    cc = warp_c(im)
    print("max|A-B|", float(jnp.max(jnp.abs(a - bb))),
          "max|A-C|", float(jnp.max(jnp.abs(a - cc))), flush=True)


if __name__ == "__main__":
    main()

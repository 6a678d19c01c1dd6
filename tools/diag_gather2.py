#!/usr/bin/env python
"""Round 2 of warp-gather formulations: block-slice gathers & dtype effects.

G1: one gather, slice [2,2,C] on a 1px-padded image (all 4 taps per slice)
G2: two gathers, slice [1,2,C] (horizontal tap pairs)
G3: baseline 4-gather but bf16 image
G4: G1 but bf16
G5: vertical-only gather (slice [1,1,C], 2 taps) — isolates axis cost
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp

H, W, C = 704, 1280, 48
B = 1
flow = (jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 2)) - 0.5) * 8.0


def chain(tag, step, state, iters=5):
    try:
        s0 = step(state)
        _ = float(jnp.sum(s0))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return
    t0 = time.time()
    s = state
    for _ in range(iters):
        s = step(s)
    _ = float(jnp.sum(s))
    print(f"{tag}: {(time.time() - t0) / iters * 1000:.1f} ms", flush=True)


def indices():
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def warp_block22(im):
    # pad 1 texel each side (edge), shift indices by 1; clamp so that the
    # 2x2 block starting at (y0p, x0p) stays in bounds and border semantics
    # (both taps collapse to edge texel) are preserved by index clamping
    x0, y0, wx, wy = indices()
    imp = jnp.pad(im, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    x0p = jnp.clip(x0, -1, W - 1) + 1  # block cols [x0p, x0p+1] in [0, W+1]
    y0p = jnp.clip(y0, -1, H - 1) + 1
    idx = jnp.stack([y0p, x0p], axis=-1).reshape(B, H * W, 2)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(1, 2),
        operand_batching_dims=(),
        start_indices_batching_dims=())
    # operand [B, H+2, W+2, C] -> treat batch by vmap
    def g1(im1, idx1):
        return jax.lax.gather(
            im1[None], idx1, dnums, slice_sizes=(1, 2, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP)
    taps = jax.vmap(g1)(imp, idx)  # [B, H*W, 2, 2, C]
    taps = taps.reshape(B, H, W, 2, 2, C)
    # when x0 < 0 or >= W-? border: clamped block still yields correct edge
    # collapse because wx,wy in [0,1) weight in-range combinations of equal
    # edge texels... only exact when original clamp made both taps equal;
    # with pad=edge the [2,2] block at the border contains (edge, first) so
    # weights select correctly for xs in [-1, W-1]; beyond that clamp x0
    top = taps[:, :, :, 0, 0] * (1 - wx) + taps[:, :, :, 0, 1] * wx
    bot = taps[:, :, :, 1, 0] * (1 - wx) + taps[:, :, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def warp_rowpair(im):
    x0, y0, wx, wy = indices()
    imp = jnp.pad(im, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    x0p = jnp.clip(x0, -1, W - 1) + 1
    y0i = jnp.clip(y0, 0, H - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    dnums = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3),
        collapsed_slice_dims=(0,),
        start_index_map=(1, 2),
        operand_batching_dims=(),
        start_indices_batching_dims=())

    def g1(im1, idx1):
        return jax.lax.gather(
            im1[None], idx1, dnums, slice_sizes=(1, 1, 2, C),
            mode=jax.lax.GatherScatterMode.CLIP)

    idx_t = jnp.stack([y0i, x0p], axis=-1).reshape(B, H * W, 2)
    idx_b = jnp.stack([y1i, x0p], axis=-1).reshape(B, H * W, 2)
    tt = jax.vmap(g1)(imp, idx_t).reshape(B, H, W, 2, C)
    bb = jax.vmap(g1)(imp, idx_b).reshape(B, H, W, 2, C)
    top = tt[:, :, :, 0] * (1 - wx) + tt[:, :, :, 1] * wx
    bot = bb[:, :, :, 0] * (1 - wx) + bb[:, :, :, 1] * wx
    return top * (1 - wy) + bot * wy


def warp_naive(im):
    x0, y0, wx, wy = indices()
    x0i = jnp.clip(x0, 0, W - 1)
    x1i = jnp.clip(x0 + 1, 0, W - 1)
    y0i = jnp.clip(y0, 0, H - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    b = jnp.arange(B)[:, None, None]

    def g(yy, xx):
        return im[b, yy, xx]

    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def main():
    im = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, C))
    imb = im.astype(jnp.bfloat16)

    chain("G1 block[2,2,C] f32", jax.jit(lambda v: warp_block22(v) * 0.999), im)
    chain("G2 rowpair[1,2,C] f32", jax.jit(lambda v: warp_rowpair(v) * 0.999), im)
    chain("G3 naive bf16", jax.jit(lambda v: warp_naive(v) * 1), imb)
    chain("G4 block[2,2,C] bf16", jax.jit(lambda v: warp_block22(v) * 1), imb)

    a = warp_naive(im)
    g1 = warp_block22(im)
    g2 = warp_rowpair(im)
    print("max|naive-G1|", float(jnp.max(jnp.abs(a - g1))),
          "max|naive-G2|", float(jnp.max(jnp.abs(a - g2))), flush=True)


if __name__ == "__main__":
    main()

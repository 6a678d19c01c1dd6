#!/usr/bin/env python
"""Round 3: flattened single-gather warp + OffsetDiversity-shaped gathers.

G5: ONE gather on operand [H+1, (W+2)*C], slice [2, 2C] (all 4 taps) — rows
    y0,y0+1 and cols x0,x0+1 × all C contiguous.
G2b: rowpair [1,2,C] in bf16.
OD0: current OffsetDiversity pattern (32 maps, Cg=3, naive 4-tap indexing).
OD1: per-map single gather, operand [32, H+1, (W+2)*3], slice [1, 2, 6].
S0/S1: small-C (3ch) warp naive vs flattened single-gather.
All variants numerically checked against naive ON TPU (miscompile guard).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp

H, W = 704, 1280
B = 1


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


def mkflow(key, scale=8.0):
    return (jax.random.uniform(key, (B, H, W, 2)) - 0.5) * scale


FLOW = mkflow(jax.random.PRNGKey(1))


def indices(flow):
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def warp_naive(im, flow):
    B = im.shape[0]
    C = im.shape[-1]
    x0, y0, wx, wy = indices(flow)
    x0i = jnp.clip(x0, 0, W - 1)
    x1i = jnp.clip(x0 + 1, 0, W - 1)
    y0i = jnp.clip(y0, 0, H - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    b = jnp.arange(B)[:, None, None]
    g = lambda yy, xx: im[b, yy, xx]
    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = g(y0i, x0i) * (1 - wx) + g(y0i, x1i) * wx
    bot = g(y1i, x0i) * (1 - wx) + g(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def warp_flat(im, flow):
    """Single gather: operand [B, H+1, (W+2)*C], slice [1, 2, 2C]."""
    B = im.shape[0]
    C = im.shape[-1]
    x0, y0, wx, wy = indices(flow)
    imp = jnp.pad(im, ((0, 0), (0, 1), (1, 1), (0, 0)), mode="edge")
    impf = imp.reshape(B, H + 1, (W + 2) * C)
    x0p = (jnp.clip(x0, -1, W - 1) + 1) * C
    y0p = jnp.clip(y0, 0, H - 1)
    idx = jnp.stack([y0p, x0p], axis=-1).reshape(B, H * W, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(1, 2),
        operand_batching_dims=(), start_indices_batching_dims=())

    def g1(op, ix):
        return jax.lax.gather(op[None], ix, dn, slice_sizes=(1, 2, 2 * C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    taps = jax.vmap(g1)(impf, idx).reshape(B, H, W, 2, 2, C)
    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = taps[:, :, :, 0, 0] * (1 - wx) + taps[:, :, :, 0, 1] * wx
    bot = taps[:, :, :, 1, 0] * (1 - wx) + taps[:, :, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def warp_rowpair(im, flow):
    B = im.shape[0]
    C = im.shape[-1]
    x0, y0, wx, wy = indices(flow)
    imp = jnp.pad(im, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    x0p = jnp.clip(x0, -1, W - 1) + 1
    y0i = jnp.clip(y0, 0, H - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,), start_index_map=(1, 2),
        operand_batching_dims=(), start_indices_batching_dims=())

    def g1(op, ix):
        return jax.lax.gather(op[None], ix, dn, slice_sizes=(1, 1, 2, C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    idx_t = jnp.stack([y0i, x0p], axis=-1).reshape(B, H * W, 2)
    idx_b = jnp.stack([y1i, x0p], axis=-1).reshape(B, H * W, 2)
    tt = jax.vmap(g1)(imp, idx_t).reshape(B, H, W, 2, C)
    bb = jax.vmap(g1)(imp, idx_b).reshape(B, H, W, 2, C)
    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = tt[:, :, :, 0] * (1 - wx) + tt[:, :, :, 1] * wx
    bot = bb[:, :, :, 0] * (1 - wx) + bb[:, :, :, 1] * wx
    return top * (1 - wy) + bot * wy


def check(tag, fn, im, flow):
    ref = jax.jit(warp_naive)(im.astype(jnp.float32), flow)
    out = jax.jit(fn)(im, flow).astype(jnp.float32)
    d = float(jnp.max(jnp.abs(ref - out)))
    tol = 1e-5 if im.dtype == jnp.float32 else 2e-2
    print(f"{tag}: maxdiff={d:.2e} {'OK' if d < tol else 'MISMATCH'}", flush=True)


def main():
    im48 = jax.random.uniform(jax.random.PRNGKey(0), (B, H, W, 48))
    im3 = im48[..., :3]

    check("chk G5 f32", warp_flat, im48, FLOW)
    check("chk G2 bf16", warp_rowpair, im48.astype(jnp.bfloat16), FLOW)
    check("chk G5 bf16", warp_flat, im48.astype(jnp.bfloat16), FLOW)
    check("chk S1 flat 3ch", warp_flat, im3, FLOW)

    chain("G5 flat[2,2C] f32 48ch", jax.jit(lambda v: warp_flat(v, FLOW) * 0.999), im48)
    chain("G2b rowpair bf16 48ch", jax.jit(lambda v: warp_rowpair(v, FLOW) * 1), im48.astype(jnp.bfloat16))
    chain("G5b flat bf16 48ch", jax.jit(lambda v: warp_flat(v, FLOW) * 1), im48.astype(jnp.bfloat16))
    chain("S0 naive f32 3ch", jax.jit(lambda v: warp_naive(v, FLOW) * 0.999), im3)
    chain("S1 flat f32 3ch", jax.jit(lambda v: warp_flat(v, FLOW) * 0.999), im3)

    # OffsetDiversity shape: 32 maps x Cg=3
    xg = jax.random.uniform(jax.random.PRNGKey(2), (32, H, W, 3))
    flows = jnp.broadcast_to(FLOW, (32, H, W, 2)) + mkflow(jax.random.PRNGKey(3), 4.0)

    def od_naive(v):
        return warp_naive(v, flows) * 0.999

    def od_flat(v):
        return warp_flat(v, flows) * 0.999

    ref = jax.jit(warp_naive)(xg, flows)
    out = jax.jit(warp_flat)(xg, flows)
    print("chk OD flat:", float(jnp.max(jnp.abs(ref - out))), flush=True)
    chain("OD0 naive f32 32x3ch", jax.jit(od_naive), xg)
    chain("OD1 flat f32 32x3ch", jax.jit(od_flat), xg)


if __name__ == "__main__":
    main()

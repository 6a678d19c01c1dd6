#!/usr/bin/env python
"""Round 4: dodge the TPU layout-assignment SIGILL on batched rowpair gathers.

E1: batch folded into rows — operand [B*H, W+2, C], single gather, no vmap.
E2: E1 with C padded 3 -> 8 (aligned minor).
Shapes tested: (B=32, C=3) OffsetDiversity and (B=1, C=48) context warp.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp

H, W = 704, 1280


def chain(tag, step, state, iters=5):
    try:
        s0 = step(state)
        _ = float(jnp.sum(s0))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)
        return
    t0 = time.time()
    s = state
    for _ in range(iters):
        s = step(s)
    _ = float(jnp.sum(s))
    print(f"{tag}: {(time.time() - t0) / iters * 1000:.1f} ms", flush=True)


def indices(flow):
    xs = jnp.arange(W, dtype=jnp.float32)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=jnp.float32)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def warp_naive(im, flow):
    B, _, _, C = im.shape
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


def warp_rowfold(im, flow, pad_c=0):
    """Batch folded into the row axis: one gather, rank-3 operand."""
    B, _, _, C = im.shape
    x0, y0, wx, wy = indices(flow)
    if pad_c:
        im = jnp.pad(im, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
    Cp = C + pad_c
    imp = jnp.pad(im, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    impf = imp.reshape(B * H, W + 2, Cp)
    x0p = jnp.clip(x0, -1, W - 1) + 1
    y0i = jnp.clip(y0, 0, H - 1)
    y1i = jnp.clip(y0 + 1, 0, H - 1)
    boff = (jnp.arange(B, dtype=jnp.int32) * H)[:, None, None]
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2), collapsed_slice_dims=(0,), start_index_map=(0, 1),
        operand_batching_dims=(), start_indices_batching_dims=())

    def g(yy):
        ix = jnp.stack([yy + boff, x0p], axis=-1).reshape(B * H * W, 2)
        out = jax.lax.gather(impf, ix, dn, slice_sizes=(1, 2, Cp),
                             mode=jax.lax.GatherScatterMode.CLIP)
        return out.reshape(B, H, W, 2, Cp)[..., :C]

    tt = g(y0i)
    bb = g(y1i)
    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = tt[:, :, :, 0] * (1 - wx) + tt[:, :, :, 1] * wx
    bot = bb[:, :, :, 0] * (1 - wx) + bb[:, :, :, 1] * wx
    return top * (1 - wy) + bot * wy


def main():
    # OffsetDiversity shape
    xg = jax.random.uniform(jax.random.PRNGKey(2), (32, H, W, 3))
    base = (jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 2)) - 0.5) * 8
    flows = jnp.broadcast_to(base, (32, H, W, 2)) + \
        (jax.random.uniform(jax.random.PRNGKey(3), (32, H, W, 2)) - 0.5) * 4

    ref = jax.jit(warp_naive)(xg, flows)
    for tag, pc in [("E1 rowfold OD f32", 0), ("E2 rowfold OD f32 pad8", 5)]:
        try:
            out = jax.jit(lambda v: warp_rowfold(v, flows, pc))(xg)
            d = float(jnp.max(jnp.abs(ref - out)))
            print(f"{tag}: maxdiff={d:.2e}", flush=True)
            chain(tag, jax.jit(lambda v: warp_rowfold(v, flows, pc) * 0.999), xg)
        except Exception as e:
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}", flush=True)

    chain("OD naive f32 (ref)", jax.jit(lambda v: warp_naive(v, flows) * 0.999), xg)
    chain("OD naive bf16", jax.jit(lambda v: warp_naive(v, flows) * 1),
          xg.astype(jnp.bfloat16))

    # context warp shape
    im48 = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 48))
    f1 = base
    ref48 = jax.jit(warp_naive)(im48, f1)
    out48 = jax.jit(lambda v: warp_rowfold(v, f1, 0))(im48)
    print("chk rowfold 48ch:", float(jnp.max(jnp.abs(ref48 - out48))), flush=True)
    chain("rowfold 48ch f32", jax.jit(lambda v: warp_rowfold(v, f1, 0) * 0.999), im48)
    chain("rowfold 48ch bf16", jax.jit(lambda v: warp_rowfold(v, f1, 0) * 1),
          im48.astype(jnp.bfloat16))


if __name__ == "__main__":
    main()

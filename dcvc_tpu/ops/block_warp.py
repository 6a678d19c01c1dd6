"""Pallas TPU block warp: DMA-fed approximate backward warp.

Motivation (PLAN.md cost model, RDNOTES.md): every XLA gather formulation
of the bilinear warp is capped by the TPU gather unit — ~17ns/slice issue
rate, ~10-17 GB/s byte rate — two orders of magnitude under HBM bandwidth
(~819 GB/s on v5e). The row-tile warp (ops/warp.py:tile_warp) halves the
DMC frame time but still rides the gather unit. This kernel removes the
gather unit from the path entirely:

  * the image is read with real DMAs (HBM -> VMEM) at memory bandwidth,
    one [C, BH+2Rv+2, BW+2Dh+2] window per (BH x BW) output block, whose
    position is the block's rounded median flow ("base"), double-buffered
    across grid steps;
  * per-pixel offsets are resolved INSIDE VMEM as residuals from the
    block base, clamped to a (-Dh..Dh) x (-Rv..Rv) window, via a
    shift-select accumulation over the (2Rv+1) x (2Dh+1) integer tap
    grid — each pass is a static VMEM slice + VPU FMA, and passes whose
    tap offset no pixel in the block uses are skipped with a per-block
    bitmask (smooth flow -> ~4-9 live passes).

Approximation contract (mirrors tile_warp's): EXACT (equals
ops/warp.flow_warp, i.e. the reference's grid_sample border/align_corners
semantics, DCVC-DC/src/models/video_net.py:8-38) wherever every pixel's
offset deviates from its block's base by less than (Dh, Rv); clamped to
the window edge beyond. Block bases adapt per (BH x BW) block, so global
/ smooth motion of ANY magnitude is exact; only intra-block deviation is
windowed. `block_warp_ref` is the bit-identical pure-jnp definition used
for tests and as the CPU fallback.

Scope: single-chip inference. The pallas_call is not GSPMD-partitionable,
so spatially-sharded multi-chip inference (parallel/mesh tile axis) should
use the tile or exact modes (sharded parity tested in
tests/test_sharding_dmc.py); training always uses the exact warp.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


def _prep(im, flow, BH, BW, Dh, Rv, base_mode, pad):
    """Shared prep: pad to block multiples, per-block clamped base,
    per-pixel tap indices/weights, per-block live-tap bitmasks.

    Returns (src, apl, bpl, wy, wx, sy, sx, ma, mb, dims) where
      src  [M, C, Hp, Wp]  channel-first edge-padded source (f32)
      apl  [M, Hb, Wb] int32  vertical tap index in [1, 2Rv]
      bpl  [M, Hb, Wb] int32  horizontal tap index in [1, 2Dh]
      wy/wx [M, Hb, Wb] f32   bilinear fracs
      sy/sx [M, nby, nbx] int32  window starts (padded coords)
      ma/mb [M, nby, nbx] int32  live-tap bitmasks over a / b
    """
    M, H, W, C = im.shape
    Hb, Wb = _ceil_to(H, BH), _ceil_to(W, BW)
    if (Hb, Wb) != (H, W):
        im = jnp.pad(im, ((0, 0), (0, Hb - H), (0, Wb - W), (0, 0)),
                     mode="edge")
        flow = jnp.pad(flow, ((0, 0), (0, Hb - H), (0, Wb - W), (0, 0)),
                       mode="edge")
    assert flow.dtype == jnp.float32
    nby, nbx = Hb // BH, Wb // BW
    # Mosaic constrains VMEM memref slices twice over: extents in the
    # (sublane, lane) dims must be multiples of the (8, 128) tile, AND
    # dynamic offsets must be PROVABLY tile-aligned ("Failed to prove that
    # a tile index in dimension 2 is divisible by the tiling (8)").
    # Arbitrary per-block window starts therefore become:
    #   start = tile_idx * (8|128)  (provable)  +  residual
    # with the window enlarged by one tile per axis to cover the residual.
    # The sublane residual ry in [0,8) folds into the per-pixel vertical
    # tap index; the lane residual rx in [0,128) is resolved by ONE dynamic
    # lane-rotate of the window inside VMEM (tpu.dynamic_rotate), after
    # which the tap slices are static again.
    BHD_u = BH + 2 * Rv + 2          # rows actually read from the start px
    KD_u = BW + 2 * Dh + 2
    BHD = _ceil_to(BHD_u + 7, 8)     # + sublane residual + tile alignment
    KD = _ceil_to(KD_u + 127, 128)   # + lane residual + tile alignment
    tail_y = BHD - BHD_u
    tail_x = KD - KD_u
    # Edge pad = tap reach (R+1) plus a `pad` margin: a window whose base
    # points up to `pad` px outside the image still sits unclamped inside
    # the padded array. Without the margin, ANY border block with nonzero
    # outward base gets its window clamped, which re-centers every pixel's
    # residual window and clamps pixels that were well inside +-R of the
    # base (measured: 10% of pixels wrong on N(0,0.5) flow at the border).
    # Beyond `pad`, windows clamp but their taps land in pure
    # edge-replicate rows/cols, which border semantics make exact anyway.
    Py, Px = Rv + 1 + pad, Dh + 1 + pad

    fb = flow.reshape(M, nby, BH, nbx, BW, 2).transpose(0, 1, 3, 2, 4, 5)
    if base_mode == "mean":
        base = jnp.round(jnp.mean(fb, axis=(3, 4)))
    elif base_mode == "median4":
        # median over a 4x4-strided subsample: 16x less sort work than the
        # full median (XLA median = sort; BH*BW elements per block adds up
        # to ~134M sorted elements per 1080p OD warp) at near-identical
        # robustness — the base only needs to land within +-(Dh,Rv)/2 of
        # the majority motion, and a 1/16 subsample's median does.
        sub = fb[:, :, :, ::4, ::4, :]
        sub = sub.reshape(*sub.shape[:3], -1, 2)
        base = jnp.round(jnp.median(sub, axis=3))
    else:
        base = jnp.round(jnp.median(
            fb.reshape(M, nby, nbx, BH * BW, 2), axis=3))  # [M, nby, nbx, 2]

    src = jnp.pad(im.transpose(0, 3, 1, 2),
                  ((0, 0), (0, 0), (Py, Py + tail_y), (Px, Px + tail_x)),
                  mode="edge")
    # Clamp bounds use the UNPADDED window extent so border semantics are
    # identical to the pre-alignment kernel; the residual+alignment tail
    # always has in-bounds rows/cols because src grew by exactly
    # tail_y/tail_x (worst case: residual 0, window end sy + BHD).
    Hp, Wp = Hb + 2 * Py, Wb + 2 * Px

    i0 = (jnp.arange(nby) * BH)[None, :, None]
    j0 = (jnp.arange(nbx) * BW)[None, None, :]
    sy_raw = i0 + base[..., 1].astype(jnp.int32) + pad
    sx_raw = j0 + base[..., 0].astype(jnp.int32) + pad
    sy = jnp.clip(sy_raw, 0, Hp - BHD_u)
    sx = jnp.clip(sx_raw, 0, Wp - KD_u)
    eff_by = base[..., 1] - (sy_raw - sy).astype(base.dtype)
    eff_bx = base[..., 0] - (sx_raw - sx).astype(base.dtype)

    # tile-aligned window origin + residuals (see alignment note above)
    sy_t, ry = sy // 8, (sy % 8).astype(jnp.int32)
    sx_t, rx = sx // 128, (sx % 128).astype(jnp.int32)

    def per_pixel(eff, comp, R):
        e = jnp.repeat(jnp.repeat(eff, BH, axis=1), BW, axis=2)
        r = jnp.clip(flow[..., comp] - e, -R, R - 1e-4)
        f = jnp.floor(r)
        return (f.astype(jnp.int32) + R + 1), (r - f).astype(jnp.float32)

    apl, wy = per_pixel(eff_by, 1, Rv)                    # apl in [1, 2Rv]
    bpl, wx = per_pixel(eff_bx, 0, Dh)                    # bpl in [1, 2Dh]
    # vertical tap indices are relative to the TILE-ALIGNED window origin:
    # the per-block sublane residual shifts every pixel's tap down by ry
    apl = apl + jnp.repeat(jnp.repeat(ry, BH, axis=1), BW, axis=2)

    def bitmask(pl_idx, maxbit):
        bits = (1 << pl_idx) | (1 << (pl_idx + 1))
        bb = bits.reshape(M, nby, BH, nbx, BW)
        if maxbit >= 31:
            return jnp.full((M, nby, nbx), -1, jnp.int32)
        return jax.lax.reduce(bb, np.int32(0), jax.lax.bitwise_or, (2, 4))

    ma = bitmask(apl, 2 * Rv + 9)   # apl now reaches 2Rv+8 (+1 bilinear bit)
    mb = bitmask(bpl, 2 * Dh + 2)
    dims = dict(M=M, C=C, H=H, W=W, Hb=Hb, Wb=Wb, nby=nby, nbx=nbx,
                BHD=BHD, KD=KD)
    return src, apl, bpl, wy, wx, sy_t, sx_t, rx, ma, mb, dims


def _kernel(BH, BW, Dh, Rv, Cg, depth, total, interpret,
            sy_ref, sx_ref, rx_ref, ma_ref, mb_ref,
            apl_ref, bpl_ref, wy_ref, wx_ref, src_ref, out_ref,
            scratch, sems):
    m = pl.program_id(0)
    bi = pl.program_id(1)
    bj = pl.program_id(2)
    cg = pl.program_id(3)
    nby = pl.num_programs(1)
    nbx = pl.num_programs(2)
    ncg = pl.num_programs(3)
    BHD = _ceil_to(BH + 2 * Rv + 2 + 7, 8)
    KD = _ceil_to(BW + 2 * Dh + 2 + 127, 128)
    # flat pipeline index over (block, channel-group): windows are DMA'd per
    # Cg-channel slice so wide-channel warps (mc/context sites, C=48..96)
    # stay inside the ~16 MB/core VMEM budget
    g = (m * nby + bi) * nbx + bj
    gg = g * ncg + cg
    slot = jax.lax.rem(gg, depth)

    # Scalar-prefetch arrays are FLAT (total,) — SMEM operands are padded
    # to a 128-wide last dim, so a (M, nby, nbx) layout with small nbx
    # blows the 1 MiB SMEM budget 32x at 1080p ("Allocation would exceed
    # memory (space=smem), tag='prefetched SMEM operand'").
    def start_dma(nn, sl):
        # offsets written as tile_idx * tile so Mosaic can PROVE alignment
        n = jax.lax.div(nn, ncg)
        cgn = jax.lax.rem(nn, ncg)
        mm = jax.lax.div(jax.lax.div(n, nbx), nby)
        pltpu.make_async_copy(
            src_ref.at[mm, pl.ds(cgn * Cg, Cg),
                       pl.ds(sy_ref[n] * 8, BHD),
                       pl.ds(sx_ref[n] * 128, KD)],
            scratch.at[sl], sems.at[sl]).start()

    # depth-D pipeline: keep D-1 window DMAs in flight so the per-block DMA
    # latency (measured ~114us fixed for a dynamic-offset start/wait copy,
    # tools/diag_dma.py) amortises across D-1 steps of resolve work.
    @pl.when(gg == 0)
    def _():
        for k in range(min(depth - 1, total)):  # static unroll
            start_dma(jnp.int32(k), jnp.int32(k % depth))

    @pl.when(gg + depth - 1 < total)
    def _():
        gn = gg + depth - 1
        start_dma(gn, jax.lax.rem(gn, depth))

    pltpu.make_async_copy(src_ref.at[m, pl.ds(cg * Cg, Cg),
                                     pl.ds(sy_ref[g] * 8, BHD),
                                     pl.ds(sx_ref[g] * 128, KD)],
                          scratch.at[slot], sems.at[slot]).wait()

    apl = apl_ref[0]
    bpl = bpl_ref[0]
    wy = wy_ref[0]
    wx = wx_ref[0]
    ma = ma_ref[g]
    mb = mb_ref[g]
    # one dynamic lane-rotate undoes the 128-alignment residual, making all
    # tap slices static again (the rotated-in wraparound lanes land beyond
    # BW+2Dh+1 and are never read)
    rx = rx_ref[g]
    shift = jax.lax.rem(jnp.int32(KD) - rx, jnp.int32(KD))
    window = scratch[slot].astype(jnp.float32)
    if interpret:
        window = jnp.roll(window, shift, axis=2)
    else:
        window = pltpu.roll(window, shift, 2)
    out_ref[0] = jnp.zeros((Cg, BH, BW), out_ref.dtype)
    one = jnp.float32(1.0)
    for a in range(1, 2 * Rv + 9):   # apl carries the sublane residual
        wa = (jnp.where(apl == a, one - wy, 0.0)
              + jnp.where(apl == a - 1, wy, 0.0))
        for b in range(1, 2 * Dh + 2):
            @pl.when(jnp.logical_and((ma >> a) & 1, (mb >> b) & 1) != 0)
            def _(a=a, b=b, wa=wa):
                wb = (jnp.where(bpl == b, one - wx, 0.0)
                      + jnp.where(bpl == b - 1, wx, 0.0))
                win = window[:, a:a + BH, b:b + BW]
                out_ref[0] += (wa * wb)[None] * win


def block_warp(im: jnp.ndarray, flow: jnp.ndarray, Dh: int = 8,
               Rv: int = 2, BH: int = 8, BW: int = 512,
               base_mode: str = "median", pad: int = 16,
               depth: int | None = None,
               interpret: bool = False) -> jnp.ndarray:
    """Approximate backward warp of ``im`` [M,H,W,C] by ``flow`` [M,H,W,2]
    (fx, fy in pixels), Pallas TPU kernel. See module docstring for the
    approximation contract; ``block_warp_ref`` is the semantic oracle."""
    # resolve the env default OUTSIDE the jit boundary: inside, the cache
    # key would be depth=None and an env change after the first trace would
    # be silently ignored
    if depth is None:
        depth = int(os.environ.get("DCVC_TPU_BLOCK_DEPTH", "2"))
    return _block_warp_jit(im, flow, Dh, Rv, BH, BW, base_mode, pad, depth,
                           interpret)


@functools.partial(jax.jit, static_argnames=("Dh", "Rv", "BH", "BW",
                                             "base_mode", "pad", "depth",
                                             "interpret"))
def _block_warp_jit(im, flow, Dh, Rv, BH, BW, base_mode, pad, depth,
                    interpret):
    M, H, W, C = im.shape
    BH = min(BH, _ceil_to(H, 8))
    BW = min(BW, _ceil_to(W, 128))
    if jax.default_backend() == "cpu":
        interpret = True  # no Mosaic lowering on CPU
    out_dtype = im.dtype
    # bf16 sources are DMA'd as-is (half the HBM bytes + VMEM); the
    # resolve accumulates in f32 either way. Other dtypes go through f32.
    if im.dtype not in (jnp.float32, jnp.bfloat16):
        im = im.astype(jnp.float32)
    if flow.dtype != jnp.float32:
        flow = flow.astype(jnp.float32)
    src, apl, bpl, wy, wx, sy_t, sx_t, rx, ma, mb, d = _prep(
        im, flow, BH, BW, Dh, Rv, base_mode, pad)

    # channel-group size: the window scratch must fit VMEM (~16 MB/core)
    # next to the rolled window value and the output block; wide-channel
    # warps (context/mc sites, C=48..96) are split across an extra grid dim
    win_bytes_per_ch = d["BHD"] * d["KD"] * src.dtype.itemsize
    budget = 8 * 1024 * 1024
    Cg = max(1, min(C, budget // max(1, win_bytes_per_ch * (depth + 2))))
    while C % Cg:
        Cg -= 1
    ncg = C // Cg

    grid = (d["M"], d["nby"], d["nbx"], ncg)
    total = d["M"] * d["nby"] * d["nbx"] * ncg
    depth = max(2, min(depth, total))
    blk = lambda mi, bi, bj, cgi, *_: (mi, bi, bj)
    kernel = functools.partial(_kernel, BH, BW, Dh, Rv, Cg, depth, total,
                               interpret)
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, BH, BW), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BH, BW), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BH, BW), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec((1, BH, BW), blk, memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, Cg, BH, BW),
                lambda mi, bi, bj, cgi, *_: (mi, cgi, bi, bj),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((depth, Cg, d["BHD"], d["KD"]), src.dtype),
                pltpu.SemaphoreType.DMA((depth,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((d["M"], C, d["Hb"], d["Wb"]),
                                       jnp.float32),
        interpret=interpret,
    )(sy_t.reshape(-1), sx_t.reshape(-1), rx.reshape(-1),
      ma.reshape(-1), mb.reshape(-1), apl, bpl, wy, wx, src)
    out = out.transpose(0, 2, 3, 1)[:, :H, :W]
    return out.astype(out_dtype)


def block_warp_ref(im: jnp.ndarray, flow: jnp.ndarray, Dh: int = 8,
                   Rv: int = 2, BH: int = 8, BW: int = 512,
                   base_mode: str = "median", pad: int = 16) -> jnp.ndarray:
    """Pure-jnp oracle with EXACTLY the kernel's semantics (same prep,
    per-pixel 4-tap resolve by advanced indexing). Doubles as the
    CPU/GPU fallback implementation."""
    M, H, W, C = im.shape
    BH = min(BH, _ceil_to(H, 8))
    BW = min(BW, _ceil_to(W, 128))
    out_dtype = im.dtype
    if im.dtype != jnp.float32:
        im = im.astype(jnp.float32)
    if flow.dtype != jnp.float32:
        flow = flow.astype(jnp.float32)
    src, apl, bpl, wy, wx, sy_t, sx_t, rx, _, _, d = _prep(
        im, flow, BH, BW, Dh, Rv, base_mode, pad)
    Hb, Wb, nby, nbx = d["Hb"], d["Wb"], d["nby"], d["nbx"]

    # window origins in padded coords: apl already carries the sublane
    # residual (relative to the tile-aligned origin); the lane residual is
    # explicit in rx
    syp = jnp.repeat(jnp.repeat(sy_t * 8, BH, axis=1), BW, axis=2)
    sxp = jnp.repeat(jnp.repeat(sx_t * 128 + rx, BH, axis=1), BW, axis=2)
    ii = jnp.arange(Hb)[None, :, None] % BH
    jj = jnp.arange(Wb)[None, None, :] % BW
    ya = syp + ii + apl      # floor tap row, padded coords
    xb = sxp + jj + bpl      # floor tap col

    mi = jnp.arange(M)[:, None, None]
    tl = src[mi, :, ya, xb]                # [M, Hb, Wb, C]
    tr = src[mi, :, ya, xb + 1]
    bl = src[mi, :, ya + 1, xb]
    br = src[mi, :, ya + 1, xb + 1]
    wxe = wx[..., None]
    wye = wy[..., None]
    top = tl * (1 - wxe) + tr * wxe
    bot = bl * (1 - wxe) + br * wxe
    out = top * (1 - wye) + bot * wye
    return out[:, :H, :W].astype(out_dtype)

"""Backward warping and resize primitives (jittable, NHWC).

Parity targets:
  * flow_warp / torch_warp (reference DCVC-DC/src/models/video_net.py:8-38):
    grid_sample with bilinear interpolation, border padding and
    align_corners=True. With the reference's normalized-grid construction
    this reduces to sampling at absolute pixel position (j + fx, i + fy)
    with clamped bilinear taps — implemented here directly as vectorized
    gathers (no normalized grid round-trip needed on TPU).
  * bilinearupsacling / bilineardownsacling (video_net.py:41-55):
    F.interpolate(align_corners=False) == half-pixel-centered linear resize.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# DCVC_TPU_WARP_BARRIER=1 isolates each warp's gathers behind
# optimization_barriers so XLA cannot fuse them into serial loop fusions
# with surrounding elementwise work (whole-program TPU pathology A/B knob).
_WARP_BARRIER = bool(int(os.environ.get("DCVC_TPU_WARP_BARRIER", "0")))
# warp gather formulation. The TPU gather unit issues ~1 slice per ~16
# cycles REGARDLESS of slice width (measured 17-19ns/slice for 6..384-byte
# slices on v5e), so minimizing slice count is everything:
#   "packed" (default): 1 slice per output pixel — row pairs packed into
#       channels, [1,2,2C] slices (~12x naive).
#   "rowpair": 2 slices per pixel, [1,2,C] (~6x naive).
#   "naive": 4 advanced-indexing gathers — the reference semantics
#       definition, kept for A/B.
# Rejected after measurement on v5e: [2,2,C] / flattened [2,2C] slices are
# MISCOMPILED (wrong values); [2,3,C] slices are correct but 140x slower
# (multi-row slices leave the fast path); batched (B>=2) multi-element-slice
# gathers SIGILL the compiler's layout assignment (hence the lax.map below);
# Mosaic scalar-loop gathers run ~150ns/elem (no Pallas win available).
# "auto" resolves per backend at trace time: packed on TPU, naive elsewhere
# (CPU/GPU vectorize gathers fine, and the batched lax.map makes CPU
# autodiff compiles pathologically slow).
_WARP_IMPL = os.environ.get("DCVC_TPU_WARP_IMPL", "auto")
# tile_warp bf16 inputs: compute in f32 (default) — bf16 slice widths are
# 32B-misaligned for the packed tile operand and fall off the gather fast
# path (see tile_warp docstring). DCVC_TPU_TILE_F32=0 for A/B.
_TILE_F32 = bool(int(os.environ.get("DCVC_TPU_TILE_F32", "1")))
# maps per vectorized tile-warp chunk (memory/speed trade; see tile_warp)
_TILE_CHUNK = int(os.environ.get("DCVC_TPU_TILE_CHUNK", "4"))


def _warp_indices(H, W, flow):
    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None] + flow[..., 1]
    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = (xs - x0)[..., None]
    wy = (ys - y0)[..., None]
    return x0.astype(jnp.int32), y0.astype(jnp.int32), wx, wy


def _flow_warp_naive(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    B, H, W, C = im.shape
    x0r, y0r, wx, wy = _warp_indices(H, W, flow)
    x0i = jnp.clip(x0r, 0, W - 1)
    x1i = jnp.clip(x0r + 1, 0, W - 1)
    y0i = jnp.clip(y0r, 0, H - 1)
    y1i = jnp.clip(y0r + 1, 0, H - 1)

    # border padding also clamps the interpolation weights' source positions:
    # when xs < 0 or > W-1 both taps collapse to the edge texel, so the weight
    # value is irrelevant — clamping indices alone reproduces 'border' mode.
    def gather(yy, xx):
        b = jnp.arange(B)[:, None, None]
        return im[b, yy, xx]  # [B,H,W,C]

    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = gather(y0i, x0i) * (1 - wx) + gather(y0i, x1i) * wx
    bot = gather(y1i, x0i) * (1 - wx) + gather(y1i, x1i) * wx
    return top * (1 - wy) + bot * wy


def _flow_warp_rowpair(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Both horizontal taps of each bilinear row in one gather slice:
    operand [B, H, W+2, C] (1-texel horizontal edge pad), slice [1,1,2,C]
    at (y, x0+1); two gathers (top row y0, bottom row y0+1). Start columns
    clamped to -1 before the pad shift, so out-of-range samples land on the
    duplicated edge texel and reproduce grid_sample border semantics exactly
    (both taps collapse to the edge when the source is outside the image)."""
    B, H, W, C = im.shape
    x0r, y0r, wx, wy = _warp_indices(H, W, flow)
    imp = jnp.pad(im, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    x0p = jnp.clip(x0r, -1, W - 1) + 1
    y0i = jnp.clip(y0r, 0, H - 1)
    y1i = jnp.clip(y0r + 1, 0, H - 1)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(1, 2),
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


def _flow_warp_packed(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """All FOUR bilinear taps from one single-row gather slice: the operand
    packs each row pair into channels, A[r] = concat(im[r], im[r+1]) (bottom
    row edge-clamped), after a 1-texel horizontal edge pad. A [1,2,2C] slice
    at (y0, x0+1) then carries (y0,x0),(y0,x0+1),(y0+1,x0),(y0+1,x0+1).
    Halves gather-slice count vs the rowpair form — the TPU gather unit
    issues ~1 slice per ~16 cycles regardless of slice width, so slice count
    is the only cost that matters. Border semantics: horizontal handled by
    the edge pad + clamp-to--1 (out-of-range taps collapse to the edge
    texel); vertical by clamping y0 to [0, H-1] plus forcing wy=0 when
    y0 < 0 (both torch taps collapse to row 0 there, while our packed pair
    at row 0 is (row0, row1))."""
    B, H, W, C = im.shape
    x0r, y0r, wx, wy = _warp_indices(H, W, flow)
    imp = jnp.pad(im, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="edge")
    down = jnp.concatenate([imp[:, 1:], imp[:, -1:]], axis=1)
    packed = jnp.concatenate([imp, down], axis=-1)  # [B, H, W+2, 2C]
    x0p = jnp.clip(x0r, -1, W - 1) + 1
    y0i = jnp.clip(y0r, 0, H - 1)
    wy = jnp.where(y0r[..., None] < 0, 0.0, wy)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(1, 2),
        operand_batching_dims=(), start_indices_batching_dims=())

    def g1(op, ix):
        return jax.lax.gather(op[None], ix, dn, slice_sizes=(1, 1, 2, 2 * C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    idx = jnp.stack([y0i, x0p], axis=-1).reshape(B, H * W, 2)
    taps = jax.vmap(g1)(packed, idx).reshape(B, H, W, 2, 2, C)
    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    top = taps[:, :, :, 0, 0] * (1 - wx) + taps[:, :, :, 1, 0] * wx
    bot = taps[:, :, :, 0, 1] * (1 - wx) + taps[:, :, :, 1, 1] * wx
    return top * (1 - wy) + bot * wy


def _map_batched(fn, im, flow):
    """Apply a B=1 warp formulation per batch element under lax.map.

    XLA:TPU's layout assignment SIGILLs on BATCHED multi-element-slice
    gathers (any B >= 2, any C — verified empirically on v5e), so batch
    elements go through the fast B=1 path serially. The gather issue rate
    (~17ns/slice) is the bottleneck either way, so this loses nothing."""
    if im.shape[0] == 1:
        return fn(im, flow)
    return jax.lax.map(
        lambda ab: fn(ab[0][None], ab[1][None])[0], (im, flow))


@jax.custom_jvp
def _warp_packed_naive_grad(im, flow):
    return _map_batched(_flow_warp_packed, im, flow)


@_warp_packed_naive_grad.defjvp
def _wpng_jvp(primals, tangents):
    # The naive advanced-indexing formulation computes the SAME function
    # (asserted interchangeable incl. borders in tests/test_warp_impls.py),
    # so its linearization is exact for the packed forward. Routing
    # differentiation through it matters because TPU scatter (the packed
    # gather's transpose) costs ~3.2us per multi-element slice vs ~17ns per
    # gather slice: the naive element-scatter VJP runs ~17x faster
    # (measured 0.84s vs 14.1s for the 64-map OffsetDiversity backward at
    # 256px; 32.5s -> 2.03s full train step). A custom_jvp (not custom_vjp)
    # keeps forward-mode AD working too — reverse mode falls out of XLA
    # transposing this (linear) tangent rule, i.e. the naive VJP.
    out = _map_batched(_flow_warp_packed, *primals)
    _, t_out = jax.jvp(_flow_warp_naive, primals, tangents)
    return out, t_out


def flow_warp(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``im`` [B,H,W,C] by ``flow`` [B,H,W,2] (fx, fy) pixels."""
    if _WARP_BARRIER:
        im, flow = jax.lax.optimization_barrier((im, flow))
    impl = _WARP_IMPL
    if impl == "auto":
        # any accelerator backend gets the packed single-slice form; only
        # CPU/GPU (which vectorize advanced-indexing gathers fine) keep the
        # naive form. Matched by name-exclusion because remote/plugin TPU
        # platforms report their own names (e.g. the axon tunnel).
        impl = ("naive" if jax.default_backend() in ("cpu", "gpu", "cuda",
                                                     "rocm") else "packed")
    if impl == "naive":
        out = _flow_warp_naive(im, flow)
    elif impl == "rowpair":
        out = _map_batched(_flow_warp_rowpair, im, flow)
    else:
        out = _warp_packed_naive_grad(im, flow)
    if _WARP_BARRIER:
        out = jax.lax.optimization_barrier(out)
    return out


# RD-gated row-tile default for OffsetDiversity at INFERENCE time on TPU
# backends. Evidence (RDNOTES.md): on reference-trained dynamics
# (tools/train_torch_proxy.py -> port -> od_warp_study dmc) all tile modes
# hold |dPSNR| <= 0.005 dB and |dbpp| <= 0.15% vs the exact warp — 20x+
# inside the 0.1 dB / 1% gate — while roughly halving the DMC frame time
# (the OffsetDiversity warp is ~70% of it, gather-issue-bound; see
# PLAN.md cost model). Training keeps the exact warp (custom-VJP packed
# path): the trained dynamics remain the reference semantics
# (DCVC-DC/src/models/video_model.py:26-63).
#
# tile:32,2 over tile:16,2: family accuracy stats put 32,2 in the SAME
# class as 16,2 (RDNOTES.md §2) with half the gather-slice count, and the
# 2026-08-18 on-chip 1080p in-model A/B (out/warp_gate/s6_queue.log)
# measured 0.905 fps vs 0.863 — the wall-clock tiebreak the candidate was
# pending. tile:32,1 (1.007 fps) stays opt-in: its zoom/turbulence
# accuracy class (43-48 dB) is below "visually exact".
RD_GATED_TILE_MODE = "tile:32,2,median"

# The Pallas DMA block warp (ops/block_warp.py) is the shipped TPU
# inference default at the OffsetDiversity site ONLY (round 5): the
# round-5 converged-proxy gate at eval resolution (out/r5_gate.log,
# RDNOTES.md §6: 16 pairs x 3 rate points x 2 datasets) passes od-only
# block with 10-60x margin everywhere (worst dPSNR -0.010 dB, worst dbpp
# 0.088%), while the all-sites variant FAILS the |dPSNR| <= 0.1 dB gate
# (worst -0.326 dB on motion pairs at q=0.6, +0.14 dB on synthetic at
# q=1.0) — the earlier §3b "identical to od-only" reading was a property
# of under-trained dynamics. Wall-clock (out/r3_inmodel_ab2.log): exact
# 0.632 fps, tile:32,2 0.905, block od-only 1.43, od+mc 1.62, all 1.73;
# the faster all-sites modes remain opt-in (--mc_warp/--me_warp or
# DCVC_TPU_{MC,ME}_WARP) for users who accept the measured RD delta.
RD_GATED_BLOCK_MODE = "block:4,4,64,128,median4"


def _default_warp_mode(env_var: str, tpu_default=RD_GATED_BLOCK_MODE):
    env = os.environ.get(env_var)
    if env:
        return env
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        return "exact"
    return tpu_default


def default_od_warp_mode() -> str:
    """The OffsetDiversity warp mode inference harnesses should use:
    the RD-gated Pallas block warp on TPU-class backends (where the exact
    warp is gather-issue-bound), the exact warp on cpu/gpu (which
    vectorize advanced-indexing gathers fine). Override per-run with
    DCVC_TPU_OD_WARP or the CLIs' --od_warp flag."""
    return _default_warp_mode("DCVC_TPU_OD_WARP")


def default_mc_warp_mode():
    """Default for the motion-compensation warps (warpframe + context1/2/3,
    video_dc.py:motion_compensation and the HEM/TCM/gen-1 analogues):
    EXACT since round 5 — the converged-proxy gate failed the block mode
    at the mc/me sites (see RD_GATED_BLOCK_MODE note; worst -0.326 dB),
    overturning the §3b under-trained-proxy result that showed them free.
    Opt back in with DCVC_TPU_MC_WARP or --mc_warp (1.62 vs 1.43 fps)."""
    return _default_warp_mode("DCVC_TPU_MC_WARP", tpu_default="exact")


def default_me_warp_mode():
    """Default for the SPyNet motion-estimation pyramid warps
    (video_net.py:MESpynet): EXACT since round 5 (same gate evidence as
    default_mc_warp_mode). Opt in with DCVC_TPU_ME_WARP or --me_warp
    (all-sites measured 1.73 vs 1.43 fps od-only)."""
    return _default_warp_mode("DCVC_TPU_ME_WARP", tpu_default="exact")


def default_coding_warp_modes() -> tuple:
    """(od, mc, me) warp modes for the WRITE-STREAM runtimes on TPU
    backends: block at the OD site, exact mc/me — the same RD-gated shape
    as the estimated-bits default since round 5. The round-3 finding that
    Pallas-bearing programs slow tunnel roundtrips 3-4x (which made the
    coding path ship the row-tile mode) no longer reproduces after the
    round-5 dispatch-count reductions (decode 13 -> 9 programs, traced
    step via lax.switch): back-to-back median-protocol children measure
    block 1.06/1.38 enc/dec fps vs tile 0.64/0.78 (out/r5_real_ab2.log).
    env overrides win here too."""
    env = [os.environ.get(v) for v in ("DCVC_TPU_OD_WARP",
                                       "DCVC_TPU_MC_WARP",
                                       "DCVC_TPU_ME_WARP")]
    if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm"):
        base = ("exact", None, None)
    else:
        base = (RD_GATED_BLOCK_MODE, None, None)
    return tuple(e if e else b for e, b in zip(env, base))


def resolve_warp_fn(mode: str):
    """Map a warp-mode string to a `(im, flow) -> warped` callable.

    Modes: "exact" (flow_warp);
    "tile[:T[,R[,mean|median]]]" — row-tile approximation (tile_warp);
    "block[:Dh[,Rv[,BH[,BW[,mean|median]]]]]" — Pallas DMA block warp
    (ops/block_warp.py; jnp oracle on cpu/gpu backends, where the Pallas
    TPU lowering does not apply and the gather-unit bottleneck the kernel
    exists to dodge is absent anyway).
    """
    if mode.startswith("tile"):
        spec = mode.split(":", 1)[1].split(",") if ":" in mode else []
        T = int(spec[0]) if len(spec) >= 1 and spec[0] else 16
        R = int(spec[1]) if len(spec) >= 2 else 2
        base = spec[2] if len(spec) >= 3 else "median"
        return lambda a, b: tile_warp(a, b, T, R, base)
    if mode.startswith("block"):
        from dcvc_tpu.ops import block_warp as bw

        spec = mode.split(":", 1)[1].split(",") if ":" in mode else []
        Dh = int(spec[0]) if len(spec) >= 1 and spec[0] else 8
        Rv = int(spec[1]) if len(spec) >= 2 else 2
        BH = int(spec[2]) if len(spec) >= 3 else 8
        BW = int(spec[3]) if len(spec) >= 4 else 512
        base = spec[4] if len(spec) >= 5 else "median"
        fn = (bw.block_warp_ref
              if jax.default_backend() in ("cpu", "gpu", "cuda", "rocm")
              else bw.block_warp)
        return lambda a, b: fn(a, b, Dh, Rv, BH, BW, base)
    return flow_warp


def _tile_warp_batched(im: jnp.ndarray, flow: jnp.ndarray, T: int, R: int,
                       base_mode: str = "median"):
    """Batched row-tile warp core. im [M,H,W,C], flow [M,H,W,2].

    Everything except the gather itself — base selection, residual weights,
    the packed operand — is computed VECTORIZED over all M maps up front;
    only the gather+combine runs per map under lax.map (batched
    multi-element-slice gathers SIGILL TPU layout assignment). Wrapping the
    whole computation per map instead serializes M large materializations
    and measured SLOWER than the exact warp in-model at 1080p, while this
    split reproduces the standalone diag numbers (~2x exact)."""
    M, H, W, C = im.shape
    A = 2 * R + 2               # packed row-channel count (floor(ry) in
    # [-R, R-1] plus the +1 bilinear tap)
    K = T + 2 * R + 2           # slice width; kept EVEN — odd slice widths
    # fall off the TPU gather fast path (measured 9.7us/slice at width 21
    # vs 183ns at width 22 on v5e)

    nt = W // T
    offt = flow.reshape(M, H, nt, T, 2)
    if base_mode == "mean":
        base = jnp.round(jnp.mean(offt, axis=3))         # [M, H, nt, 2]
    else:
        # median base: at motion boundaries the run spans two motions; the
        # median sits on the majority motion so the majority of pixels stay
        # within +-R (exact), while a mean drifts toward the minority and
        # can push EVERY pixel off base. Sort-of-T vector op, no gathers.
        base = jnp.round(jnp.median(offt, axis=3))

    # slice starts (with border clamping folded back into the residual)
    pads = R + 1
    Wp = W + pads + K
    ys_raw = jnp.arange(H)[None, :, None] + base[..., 1].astype(jnp.int32)
    xs_raw = (jnp.arange(nt)[None, None, :] * T
              + base[..., 0].astype(jnp.int32) - R + pads)
    ys = jnp.clip(ys_raw, 0, H - 1)
    xs = jnp.clip(xs_raw, 0, Wp - K)
    # effective base after clamping; the clamp delta shifts the residual so
    # interior pixels near borders still resolve to the right source texel
    eff = jnp.stack([base[..., 0] - (xs_raw - xs).astype(base.dtype),
                     base[..., 1] - (ys_raw - ys).astype(base.dtype)], -1)
    res = offt - eff[:, :, :, None, :]
    res = jnp.clip(res, -R, R - 1e-4)                    # [M, H, nt, T, 2]

    rx, ry = res[..., 0], res[..., 1]
    fx0 = jnp.floor(rx)
    fy0 = jnp.floor(ry)
    wx = (rx - fx0)[..., None]
    wy = (ry - fy0)[..., None]
    bx = (fx0 + R).astype(jnp.int32)
    ay = (fy0 + R).astype(jnp.int32)
    one_x = jax.nn.one_hot(bx, A - 1, dtype=im.dtype)
    one_y = jax.nn.one_hot(ay, A - 1, dtype=im.dtype)
    wx = wx.astype(im.dtype)
    wy = wy.astype(im.dtype)
    pad_hi = ((0, 0),) * 4 + ((0, 1),)
    pad_lo = ((0, 0),) * 4 + ((1, 0),)
    Wxw = jnp.pad(one_x * (1 - wx), pad_hi) + jnp.pad(one_x * wx, pad_lo)
    Wyw = jnp.pad(one_y * (1 - wy), pad_hi) + jnp.pad(one_y * wy, pad_lo)

    # packed operand: rows r-R .. r+R+1 folded into channels, edge-clamped
    srcp = jnp.pad(im, ((0, 0), (R, R + 1), (pads, K), (0, 0)), mode="edge")
    packed = jnp.concatenate([srcp[:, a:a + H] for a in range(A)], axis=-1)

    idx = jnp.stack([ys, xs], axis=-1).reshape(M, H * nt, 2)
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(1, 2),
        operand_batching_dims=(), start_indices_batching_dims=())

    def g1(op3, ix2):
        return jax.lax.gather(op3[None], ix2, dn,
                              slice_sizes=(1, 1, K, A * C),
                              mode=jax.lax.GatherScatterMode.CLIP)

    def per_map(args):
        op, ix, wxm, wym = args
        # vmap form (operand_batching_dims lowering) — the plain
        # collapsed_slice_dims form SIGILLs TPU layout assignment
        sl = jax.vmap(g1)(op[None], ix[None])[0].reshape(H, nt, K, A, C)
        # separable residual resolve: horizontal window combine, then
        # packed-row combine
        out_h = jnp.zeros((H, nt, T, A, C), sl.dtype)
        for b in range(A):
            out_h = out_h + wxm[..., b, None, None] * jax.lax.slice_in_dim(
                sl, b, b + T, axis=2)
        return jnp.sum(wym[..., None] * out_h, axis=3)

    if M == 1:
        out = per_map((packed[0], idx[0], Wxw[0], Wyw[0]))[None]
    elif M <= 8:
        # static unroll: XLA can overlap the per-map gathers
        out = jnp.stack([per_map((packed[i], idx[i], Wxw[i], Wyw[i]))
                         for i in range(M)])
    else:
        out = jax.lax.map(per_map, (packed, idx, Wxw, Wyw))
    return out.reshape(M, H, nt * T, C)


def tile_warp(im: jnp.ndarray, flow: jnp.ndarray, tile: int = 16,
              residual: int = 2, base_mode: str = "median",
              chunk: int | None = None) -> jnp.ndarray:
    """APPROXIMATE backward warp: one gather slice per 1x``tile`` run.

    Decomposes per-pixel offsets into a per-run integer base (rounded
    median by default, ``base_mode="mean"`` for the round-1 behavior) plus
    a per-pixel residual clamped to [-residual, residual). EXACT (matches
    flow_warp) whenever every pixel's offset deviates from its run's base
    by less than ``residual`` in both axes; otherwise the residual clamps
    (bounded approximation). Cuts gather-slice count ``tile``-fold: the
    exact warp is issue-rate-bound at ~17ns per pixel per map (DCVC-DC
    OffsetDiversity = 71%% of the DMC frame), this form is byte-bound at
    ~10-17GB/s (measured ~1.9x for G*O=32 3-channel maps at 720p, T=16 R=2
    f32).
    """
    B, H, W, _ = im.shape
    out_dtype = im.dtype
    if im.dtype == jnp.bfloat16 and _TILE_F32:
        # bf16 wide gather slices with 32B-misaligned channel widths fall
        # off the v5e gather fast path (measured: bf16 tile mode SLOWER
        # than the exact warp at 1080p, while f32 tile is ~2x faster);
        # compute the tile warp in f32 and cast back
        im = im.astype(jnp.float32)
        flow = flow.astype(jnp.float32)
    pad_w = (-W) % tile
    if pad_w:
        im = jnp.pad(im, ((0, 0), (0, 0), (0, pad_w), (0, 0)), mode="edge")
        flow = jnp.pad(flow, ((0, 0), (0, 0), (0, pad_w), (0, 0)),
                       mode="edge")
    M = im.shape[0]
    if chunk is None:
        chunk = _TILE_CHUNK
    if chunk and M > chunk and M % chunk == 0:
        # chunked: vectorized prep per chunk of maps, lax.map over chunks —
        # the all-maps-at-once packed operand (~5GB for 32 maps @1080p f32)
        # OOMs HBM alongside the model's activations; fully per-map
        # serializes 32 large materializations and ran slower than the
        # exact warp in-model. ~chunk x less peak memory than full
        # vectorization at near-vectorized speed.
        Hp, Wt = im.shape[1], im.shape[2]
        imc = im.reshape(M // chunk, chunk, Hp, Wt, im.shape[3])
        flc = flow.reshape(M // chunk, chunk, Hp, Wt, 2)
        out = jax.lax.map(
            lambda ab: _tile_warp_batched(ab[0], ab[1], tile, residual,
                                          base_mode), (imc, flc))
        out = out.reshape(M, Hp, Wt, im.shape[3])
    else:
        out = _tile_warp_batched(im, flow, tile, residual, base_mode)
    out = out.astype(out_dtype)
    return out[:, :, :W] if pad_w else out


def bilinear_resize(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Half-pixel-centered bilinear resize, NHWC (align_corners=False)."""
    B, _, _, C = x.shape
    # antialias=False matches F.interpolate(align_corners=False) for both
    # up- and down-sampling (torch never antialiases by default)
    return jax.image.resize(x, (B, out_h, out_w, C), method="linear",
                            antialias=False)


def bilinear_up2(x: jnp.ndarray) -> jnp.ndarray:
    return bilinear_resize(x, x.shape[1] * 2, x.shape[2] * 2)


def bilinear_down2(x: jnp.ndarray) -> jnp.ndarray:
    return bilinear_resize(x, x.shape[1] // 2, x.shape[2] // 2)


def pixel_shuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """NHWC pixel shuffle with torch channel ordering.

    out[b, h*r+i, w*r+j, c] = in[b, h, w, c*r*r + i*r + j] — matches
    nn.PixelShuffle on NCHW up to layout, so ported weights stay valid.
    """
    B, H, W, C = x.shape
    c_out = C // (r * r)
    x = x.reshape(B, H, W, c_out, r, r)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, r, W, r, c_out
    return x.reshape(B, H * r, W * r, c_out)


def pixel_unshuffle(x: jnp.ndarray, r: int) -> jnp.ndarray:
    B, H, W, C = x.shape
    x = x.reshape(B, H // r, r, W // r, r, C)
    x = x.transpose(0, 1, 3, 5, 2, 4)
    return x.reshape(B, H // r, W // r, C * r * r)


def replicate_pad(x: jnp.ndarray, pad_lrtb) -> jnp.ndarray:
    """Edge-replicate pad, NHWC; pad = (left, right, top, bottom)."""
    l, r, t, b = pad_lrtb
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)), mode="edge")


def crop_lrtb(x: jnp.ndarray, pad_lrtb) -> jnp.ndarray:
    """Inverse of replicate_pad given the same (l, r, t, b)."""
    l, r, t, b = pad_lrtb
    H, W = x.shape[1], x.shape[2]
    return x[:, t:H - b if b else H, l:W - r if r else W, :]


def get_padding_size(height: int, width: int, p: int = 64):
    """Pad-to-multiple amounts (left, right, top, bottom); pad right/bottom."""
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return 0, new_w - width, 0, new_h - height


def get_downsampled_shape(height: int, width: int, p: int):
    new_h = (height + p - 1) // p * p
    new_w = (width + p - 1) // p * p
    return new_h // p, new_w // p

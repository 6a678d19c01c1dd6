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


def flow_warp(im: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp ``im`` [B,H,W,C] by ``flow`` [B,H,W,2] (fx, fy) pixels."""
    if _WARP_BARRIER:
        im, flow = jax.lax.optimization_barrier((im, flow))
    B, H, W, C = im.shape
    xs = jnp.arange(W, dtype=flow.dtype)[None, None, :] + flow[..., 0]
    ys = jnp.arange(H, dtype=flow.dtype)[None, :, None] + flow[..., 1]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0

    x0r = x0.astype(jnp.int32)
    y0r = y0.astype(jnp.int32)
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

    wx = wx[..., None]
    wy = wy[..., None]
    top = gather(y0i, x0i) * (1 - wx) + gather(y0i, x1i) * wx
    bot = gather(y1i, x0i) * (1 - wx) + gather(y1i, x1i) * wx
    out = top * (1 - wy) + bot * wy
    if _WARP_BARRIER:
        out = jax.lax.optimization_barrier(out)
    return out


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

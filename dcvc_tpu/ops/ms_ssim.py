"""Differentiable MS-SSIM in jnp — the fork's training distortion criterion.

Parity target: the fork selects ``pytorch_msssim.MS_SSIM(data_range=1.,
size_average=True, channel=3)`` as the distortion criterion when ``--ssim``
is set (DCVC-HEM/src/train_CANFVC_DMC.py:74) and trains on
``(1 - msssim) / 64`` (train_CANFVC_DMC.py:199-200). This module follows the
published pytorch_msssim algorithm (VALID-padded separable 11x11 sigma-1.5
Gaussian, avg-pool-2 downsampling, relu-ed per-level cs, weighted
geometric mean) so the same lambdas produce the same RD trade-off.

TPU-first notes: the Gaussian window is applied as two depthwise 1-D convs
(feature_group_count=C) which XLA lowers to the MXU; everything is jittable
and differentiable (used inside the train step under jit).

The inference-side HM-variant metric stays in utils/metrics.py (numpy);
this one exists for gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# pytorch_msssim defaults
_MS_WEIGHTS = (0.0448, 0.2856, 0.3001, 0.2363, 0.1333)


def _gauss_kernel_1d(size: int, sigma: float) -> np.ndarray:
    coords = np.arange(size, dtype=np.float64) - size // 2
    g = np.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).astype(np.float32)


def _blur_valid(x: jnp.ndarray, win: jnp.ndarray) -> jnp.ndarray:
    """Separable depthwise Gaussian, VALID padding. x: [B, H, W, C]."""
    C = x.shape[-1]
    size = win.shape[0]
    kh = jnp.tile(win.reshape(size, 1, 1, 1), (1, 1, 1, C))
    kw = jnp.tile(win.reshape(1, size, 1, 1), (1, 1, 1, C))
    dn = jax.lax.conv_dimension_numbers(x.shape, kh.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    x = jax.lax.conv_general_dilated(x, kh.astype(x.dtype), (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    x = jax.lax.conv_general_dilated(x, kw.astype(x.dtype), (1, 1), "VALID",
                                     dimension_numbers=dn,
                                     feature_group_count=C)
    return x


def _ssim_per_channel(x, y, win, data_range, k1=0.01, k2=0.03):
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    mu1 = _blur_valid(x, win)
    mu2 = _blur_valid(y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _blur_valid(x * x, win) - mu1_sq
    sigma2_sq = _blur_valid(y * y, win) - mu2_sq
    sigma12 = _blur_valid(x * y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    # mean over spatial dims -> [B, C]
    return ssim_map.mean(axis=(1, 2)), cs_map.mean(axis=(1, 2))


def _avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    """2x2 stride-2 average pool; odd dims zero-padded at the bottom/right
    with count_include_pad semantics (pytorch_msssim downsample).

    Reshape-mean instead of lax.reduce_window: the generic reduce_window
    primitive has no transpose rule (reverse-mode AD fails under jit), and
    this must stay differentiable — it sits inside the training loss."""
    pad_h = x.shape[1] % 2
    pad_w = x.shape[2] % 2
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    B, H, W, C = x.shape
    return x.reshape(B, H // 2, 2, W // 2, 2, C).mean(axis=(2, 4))


def ms_ssim(x: jnp.ndarray, y: jnp.ndarray, data_range: float = 1.0,
            win_size: int = 11, win_sigma: float = 1.5,
            weights=_MS_WEIGHTS) -> jnp.ndarray:
    """MS-SSIM over NHWC batches -> [B] (channel-averaged), differentiable.

    Smallest spatial dim must exceed (win_size-1) * 2**(levels-1), i.e.
    161 for the default 5-level configuration (pytorch_msssim's assert).
    """
    levels = len(weights)
    min_side = min(x.shape[1], x.shape[2])
    need = (win_size - 1) * 2 ** (levels - 1)
    if min_side <= need:
        raise ValueError(
            f"image too small for {levels}-level MS-SSIM: min side {min_side}"
            f" must exceed {need}")
    win = jnp.asarray(_gauss_kernel_1d(win_size, win_sigma))
    w = jnp.asarray(weights, x.dtype)
    mcs = []
    ssim_pc = None
    for lvl in range(levels):
        ssim_pc, cs = _ssim_per_channel(x, y, win, data_range)
        if lvl < levels - 1:
            mcs.append(jax.nn.relu(cs))
            x, y = _avg_pool2(x), _avg_pool2(y)
    stack = jnp.stack(mcs + [jax.nn.relu(ssim_pc)], axis=0)  # [L, B, C]
    out = jnp.prod(stack ** w[:, None, None], axis=0)  # [B, C]
    return out.mean(axis=-1)


def ms_ssim_distortion(x: jnp.ndarray, x_hat: jnp.ndarray) -> jnp.ndarray:
    """The fork's SSIM-mode distortion: (1 - msssim) / 64 per batch element
    (train_CANFVC_DMC.py:199-200).

    At the fork's training crop (256px) this is the exact 5-level criterion;
    for smaller inputs (tiny-config tests) levels are dropped to what fits
    and the truncated weights renormalized, where pytorch_msssim would
    assert out instead.
    """
    weights = list(_MS_WEIGHTS)
    min_side = min(x.shape[1], x.shape[2])
    while len(weights) > 1 and min_side <= 10 * 2 ** (len(weights) - 1):
        weights.pop()
    w = np.asarray(weights) / np.sum(weights)
    return (1.0 - ms_ssim(x, x_hat, data_range=1.0, weights=tuple(w))) / 64.0

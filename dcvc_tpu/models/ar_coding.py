"""Wavefront autoregressive entropy coding (gen-1 DCVC / CompressAI JointAR).

The reference decodes pixel-AR latents with a per-pixel Python double loop
(DCVC/src/models/DCVC_net.py:257-328) — 8160 serial iterations at 1080p.
TPU-native reformulation (SURVEY.md §7 hard part 4): with a type-A 5x5
causal mask, pixel (h, w) depends only on pixels (h', w') with h' < h or
(h' == h, w' < w); scheduling pixel (h, w) at wavefront t = 3h + w respects
every dependency in the kernel's reach (the deepest one, (h-1, w+2), lands
at t-1). All pixels of a wavefront are coded simultaneously, so the serial
chain shrinks from H*W to 3H+W steps and each step is a dense batched
matmul. Symbols are therefore written in wavefront order — a deliberate
bitstream-format change vs the reference's raster order.

The loop itself runs on the host in numpy (the rANS decoder is host-side
anyway); each step is vectorized over the wavefront's pixels and channels.
"""

from __future__ import annotations

import numpy as np


def masked_conv_mask_a(kernel: int = 5) -> np.ndarray:
    """Type-A causal mask [kh, kw]: strictly-before-center in raster order."""
    m = np.zeros((kernel, kernel), np.float32)
    c = kernel // 2
    m[:c, :] = 1
    m[c, :c] = 1
    return m


def wavefronts(H: int, W: int, reach: int = 2):
    """Yield lists of (h, w) per wavefront t = (reach+1)*h + w."""
    k = reach + 1
    for t in range(k * (H - 1) + W):
        pixels = []
        h0 = max(0, (t - W + 1 + k - 1) // k)
        for h in range(h0, min(H, t // k + 1)):
            w = t - k * h
            if 0 <= w < W:
                pixels.append((h, w))
        if pixels:
            yield np.asarray(pixels, dtype=np.int64)


class ArNets:
    """Host-side weights for the AR context + entropy-parameter nets.

    ctx_w: masked conv kernel [kh, kw, C, 2C] (HWIO, mask pre-applied),
    ctx_b: [2C]; ep_ws/ep_bs: list of 1x1-conv weights [Cin, Cout] / biases
    with LeakyReLU (slope ``ep_slope``) between layers (not after the last).
    """

    def __init__(self, ctx_w, ctx_b, ep_ws, ep_bs, ep_slope: float = 0.01,
                 means_first: bool = True):
        self.means_first = means_first
        mask = masked_conv_mask_a(ctx_w.shape[0])[:, :, None, None]
        self.kernel = ctx_w.shape[0]
        self.ctx_w = (np.asarray(ctx_w, np.float64) * mask).reshape(
            -1, ctx_w.shape[-1])  # [(kh*kw*C), 2C]
        self.ctx_b = np.asarray(ctx_b, np.float64)
        self.ep_ws = [np.asarray(w, np.float64) for w in ep_ws]
        self.ep_bs = [np.asarray(b, np.float64) for b in ep_bs]
        self.ep_slope = ep_slope

    def entropy_params(self, feats: np.ndarray) -> np.ndarray:
        x = feats
        for i, (w, b) in enumerate(zip(self.ep_ws, self.ep_bs)):
            x = x @ w + b
            if i + 1 < len(self.ep_ws):
                x = np.where(x >= 0, x, self.ep_slope * x)
        return x

    def split(self, gp: np.ndarray):
        a, b = np.split(gp, 2, axis=-1)
        return (a, b) if self.means_first else (b, a)  # -> (means, scales)


def _gather_windows(y_hat_pad: np.ndarray, pixels: np.ndarray, k: int):
    """y_hat_pad: [H+2p, W+2p, C]; returns [n, k*k*C] context windows."""
    n = pixels.shape[0]
    C = y_hat_pad.shape[-1]
    out = np.empty((n, k, k, C), y_hat_pad.dtype)
    for i, (h, w) in enumerate(pixels):
        out[i] = y_hat_pad[h:h + k, w:w + k]
    return out.reshape(n, -1)


def ar_encode(y: np.ndarray, hyper_params: np.ndarray, nets: ArNets,
              gaussian, coder):
    """Wavefront AR encode. y, hyper_params: [H, W, C*] host arrays.

    Per wavefront: context matmul -> entropy params -> quantize -> rANS
    symbols appended in wavefront order. Returns y_hat [H, W, C].
    """
    H, W, C = y.shape
    k = nets.kernel
    p = k // 2
    y = y.astype(np.float64)
    y_hat_pad = np.zeros((H + 2 * p, W + 2 * p, C), np.float64)
    hyper_params = hyper_params.astype(np.float64)

    all_syms, all_idx = [], []
    for pixels in wavefronts(H, W, p):
        ctx = _gather_windows(y_hat_pad, pixels, k) @ nets.ctx_w + nets.ctx_b
        hp = hyper_params[pixels[:, 0], pixels[:, 1]]
        gp = nets.entropy_params(np.concatenate([hp, ctx], axis=-1))
        means, scales = nets.split(gp)
        yv = y[pixels[:, 0], pixels[:, 1]]
        y_q = np.round(yv - means)
        y_hat_pad[pixels[:, 0] + p, pixels[:, 1] + p] = y_q + means
        all_syms.append(y_q.reshape(-1))
        all_idx.append(gaussian.build_indexes_np(scales).reshape(-1))

    coder.encode_with_indexes(
        np.concatenate(all_syms), np.concatenate(all_idx), gaussian.table)
    return y_hat_pad[p:H + p, p:W + p]


def ar_decode(shape_hwc, hyper_params: np.ndarray, nets: ArNets,
              gaussian, coder) -> np.ndarray:
    """Wavefront AR decode; mirrors ar_encode's symbol order exactly."""
    H, W, C = shape_hwc
    k = nets.kernel
    p = k // 2
    y_hat_pad = np.zeros((H + 2 * p, W + 2 * p, C), np.float64)
    hyper_params = hyper_params.astype(np.float64)

    for pixels in wavefronts(H, W, p):
        ctx = _gather_windows(y_hat_pad, pixels, k) @ nets.ctx_w + nets.ctx_b
        hp = hyper_params[pixels[:, 0], pixels[:, 1]]
        gp = nets.entropy_params(np.concatenate([hp, ctx], axis=-1))
        means, scales = nets.split(gp)
        idx = gaussian.build_indexes_np(scales)
        y_q = coder.decode_stream(idx.reshape(-1), gaussian.table)
        y_q = y_q.reshape(means.shape).astype(np.float64)
        y_hat_pad[pixels[:, 0] + p, pixels[:, 1] + p] = y_q + means
    return y_hat_pad[p:H + p, p:W + p]

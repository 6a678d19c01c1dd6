"""Visualization / debug utilities.

Parity target: the fork's vis tools (DCVC-HEM/src/utils/vision.py): optical
flow to color wheel, heatmaps, pad-to-multiple alignment helpers.
"""

from __future__ import annotations

import numpy as np


def _make_color_wheel() -> np.ndarray:
    """Middlebury flow color wheel (55 x 3)."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3))
    col = 0
    wheel[:RY, 0] = 255
    wheel[:RY, 1] = np.floor(255 * np.arange(RY) / RY)
    col += RY
    wheel[col:col + YG, 0] = 255 - np.floor(255 * np.arange(YG) / YG)
    wheel[col:col + YG, 1] = 255
    col += YG
    wheel[col:col + GC, 1] = 255
    wheel[col:col + GC, 2] = np.floor(255 * np.arange(GC) / GC)
    col += GC
    wheel[col:col + CB, 1] = 255 - np.floor(255 * np.arange(CB) / CB)
    wheel[col:col + CB, 2] = 255
    col += CB
    wheel[col:col + BM, 2] = 255
    wheel[col:col + BM, 0] = np.floor(255 * np.arange(BM) / BM)
    col += BM
    wheel[col:col + MR, 2] = 255 - np.floor(255 * np.arange(MR) / MR)
    wheel[col:col + MR, 0] = 255
    return wheel


def flow_to_color(flow: np.ndarray, max_flow: float | None = None) -> np.ndarray:
    """[H, W, 2] flow -> [H, W, 3] uint8 color-wheel visualization."""
    u, v = flow[..., 0], flow[..., 1]
    rad = np.sqrt(u ** 2 + v ** 2)
    maxrad = max_flow if max_flow else max(rad.max(), 1e-6)
    u, v = u / maxrad, v / maxrad
    rad = np.sqrt(u ** 2 + v ** 2)
    a = np.arctan2(-v, -u) / np.pi
    wheel = _make_color_wheel()
    ncols = wheel.shape[0]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(int)
    k1 = (k0 + 1) % ncols
    f = fk - k0
    img = np.zeros((*u.shape, 3), np.uint8)
    for c in range(3):
        col0 = wheel[k0, c] / 255
        col1 = wheel[k1, c] / 255
        col = (1 - f) * col0 + f * col1
        idx = rad <= 1
        col[idx] = 1 - rad[idx] * (1 - col[idx])
        col[~idx] = col[~idx] * 0.75
        img[..., c] = np.floor(255 * col)
    return img


def heatmap(x: np.ndarray) -> np.ndarray:
    """[H, W] scalar map -> [H, W, 3] uint8 blue->red heatmap."""
    x = x.astype(np.float64)
    x = (x - x.min()) / max(x.max() - x.min(), 1e-9)
    r = np.clip(1.5 - np.abs(4 * x - 3), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1), 0, 1)
    return (np.stack([r, g, b], -1) * 255).astype(np.uint8)


def ctu_crop(x_hwc: np.ndarray, ctu_size: int = 64,
             pad_if_needed: bool = False,
             padding_mode: str = "constant") -> np.ndarray:
    """CTU-align a frame: crop to a multiple of ``ctu_size`` (top-left
    anchored), or pad up to one when ``pad_if_needed`` (fork's CTUCrop
    transform, DCVC-HEM/src/utils/vision.py:74-137 — used to feed test
    sequences whose dims aren't codec-aligned into training/eval)."""
    h, w = x_hwc.shape[:2]
    if pad_if_needed:
        ph = (-h) % ctu_size
        pw = (-w) % ctu_size
        if not (ph or pw):
            return x_hwc
        mode = {"constant": "constant", "edge": "edge",
                "reflect": "reflect", "symmetric": "symmetric"}[padding_mode]
        pad = ((0, ph), (0, pw)) + ((0, 0),) * (x_hwc.ndim - 2)
        return np.pad(x_hwc, pad, mode=mode)
    return x_hwc[:h - h % ctu_size, :w - w % ctu_size]


class Alignment:
    """Pad-to-multiple align/resume (fork's Alignment util)."""

    def __init__(self, divisor: int = 64):
        self.divisor = divisor
        self._shape = None

    def align(self, x_hwc: np.ndarray) -> np.ndarray:
        h, w = x_hwc.shape[:2]
        self._shape = (h, w)
        d = self.divisor
        ph = (h + d - 1) // d * d - h
        pw = (w + d - 1) // d * d - w
        return np.pad(x_hwc, ((0, ph), (0, pw), (0, 0)), mode="edge")

    def resume(self, x_hwc: np.ndarray) -> np.ndarray:
        h, w = self._shape
        return x_hwc[:h, :w]

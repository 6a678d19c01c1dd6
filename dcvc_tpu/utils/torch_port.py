"""Torch -> flax weight conversion primitives.

Used to port reference checkpoints (torch, NCHW) into this framework's
NHWC flax modules, and by the parity tests that validate our layer
re-implementations against the reference's torch code with identical
weights (SURVEY.md §7 hard part 3).
"""

from __future__ import annotations

import numpy as np


def conv_kernel(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight [O, I/g, kh, kw] -> flax [kh, kw, I/g, O]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def depthwise_kernel(w: np.ndarray) -> np.ndarray:
    """torch depthwise [C, 1, kh, kw] -> flax feature_group_count=C kernel
    [kh, kw, 1, C]."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def conv_transpose_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [I, O, kh, kw] -> flax ConvTranspose
    [kh, kw, I, O].

    flax's ConvTranspose does NOT mirror the kernel while torch's is the
    gradient of a conv (mirrored taps), so the spatial dims must be flipped.
    """
    w = np.asarray(w)[:, :, ::-1, ::-1]
    return np.transpose(w, (2, 3, 0, 1))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    """torch Linear [O, I] -> flax Dense [I, O]."""
    return np.transpose(np.asarray(w), (1, 0))


def channel_param(p: np.ndarray) -> np.ndarray:
    """torch (1, C, 1, 1) broadcast parameter -> NHWC (1, 1, 1, C)."""
    return np.asarray(p).reshape(1, 1, 1, -1)

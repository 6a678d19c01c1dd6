"""Learned factorized prior over hyper-latents (BitEstimator).

Parity target: Bitparm/BitEstimator (reference
DCVC-DC/src/models/entropy_models.py:58-200): four stacked monotone layers
``x * softplus(h) + b (+ tanh(x) * tanh(a))`` with a sigmoid CDF head, plus
``update()`` which scans the per-channel support and bakes quantized CDF
tables for the rANS coder.

TPU-first re-design: the module is a flax.linen Module over NHWC tensors;
table baking is a pure function (params -> CdfTable) with the support scan
fully vectorized instead of the reference's 2x49 Python loops.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rans import pmf_to_quantized_cdf
from .coder import CdfTable, EntropyCoder


class BitEstimator(nn.Module):
    """CDF of a per-channel learned univariate density. Input NHWC [..., C]."""

    channels: int
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return jax.nn.sigmoid(self.logits_cdf(x))

    @nn.compact
    def logits_cdf(self, x: jnp.ndarray) -> jnp.ndarray:
        init = nn.initializers.normal(stddev=0.01)
        for i in range(4):
            final = i == 3
            h = self.param(f"h{i}", init, (self.channels,), self.param_dtype)
            b = self.param(f"b{i}", init, (self.channels,), self.param_dtype)
            x = x * jax.nn.softplus(h) + b
            if not final:
                a = self.param(f"a{i}", init, (self.channels,), self.param_dtype)
                x = x + jnp.tanh(x) * jnp.tanh(a)
        return x


def _apply_cdf_channelwise(params, samples: jnp.ndarray) -> jnp.ndarray:
    """Evaluate the factorized CDF at ``samples`` of shape [C, L].

    Channel axis is leading so the (C,)-shaped layer parameters broadcast as
    [:, None].
    """
    p = params["params"] if "params" in params else params
    x = samples
    for i in range(4):
        h = p[f"h{i}"][:, None]
        b = p[f"b{i}"][:, None]
        x = x * jax.nn.softplus(h) + b
        if i < 3:
            a = p[f"a{i}"][:, None]
            x = x + jnp.tanh(x) * jnp.tanh(a)
    return jax.nn.sigmoid(x)


def build_factorized_tables(params, channels: int, precision: int = 16) -> CdfTable:
    """Bake quantized CDF tables from BitEstimator params (the update() step).

    Support scan semantics follow the reference (entropy_models.py:124-178):
    minima_c = smallest i in [2, 50] with CDF(-i) < 1e-4 (else 50), maxima_c =
    smallest i in [2, 50] with CDF(i) > 0.9999 (else 50); pmf over
    [-minima, maxima] with tail mass folded into one escape slot.
    """
    iis = jnp.arange(2, 51, dtype=jnp.float32)  # [49]
    neg = _apply_cdf_channelwise(params, -jnp.broadcast_to(iis[None, :], (channels, 49)))
    pos = _apply_cdf_channelwise(params, jnp.broadcast_to(iis[None, :], (channels, 49)))

    big = jnp.full((channels,), 50.0)
    minima = jnp.min(jnp.where(neg < 1e-4, iis[None, :], big[:, None]), axis=1)
    maxima = jnp.min(jnp.where(pos > 0.9999, iis[None, :], big[:, None]), axis=1)
    minima = np.asarray(minima, dtype=np.int32)
    maxima = np.asarray(maxima, dtype=np.int32)

    offset = -minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())

    samples = (jnp.arange(max_length, dtype=jnp.float32)[None, :]
               - jnp.asarray(minima, dtype=jnp.float32)[:, None])  # [C, L]
    lower = _apply_cdf_channelwise(params, samples - 0.5)
    upper = _apply_cdf_channelwise(params, samples + 0.5)
    pmf = np.asarray(upper - lower, dtype=np.float64)                    # [C, L]
    tail = np.asarray(lower[:, :1] + (1.0 - upper[:, -1:]), np.float64)  # [C, 1]

    quantized = np.zeros((channels, max_length + 2), dtype=np.int32)
    for c in range(channels):
        n = int(pmf_length[c])
        prob = np.concatenate([pmf[c, :n], tail[c]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(prob, precision)
        quantized[c, : cdf.size] = cdf
    return CdfTable(quantized_cdf=quantized,
                    cdf_length=(pmf_length + 2).astype(np.int32),
                    offset=offset.astype(np.int32))


def factorized_indexes(shape_nhwc) -> np.ndarray:
    """Per-element cdf index = channel id, NHWC layout."""
    n, h, w, c = shape_nhwc
    idx = np.arange(c, dtype=np.int16).reshape(1, 1, 1, c)
    return np.broadcast_to(idx, (n, h, w, c))


def encode_factorized(coder: EntropyCoder, z_hat, table: CdfTable):
    z = np.asarray(z_hat)
    coder.encode_with_indexes(z.reshape(-1), factorized_indexes(z.shape).reshape(-1),
                              table)


def decode_factorized(coder: EntropyCoder, shape_nhwc, table: CdfTable) -> np.ndarray:
    idx = factorized_indexes(shape_nhwc)
    out = coder.decode_stream(idx.reshape(-1), table)
    return out.reshape(shape_nhwc).astype(np.float32)

"""EntropyBottleneck: trainable univariate density with quantile anchoring.

Parity target: the CompressAI EntropyBottleneck vendored by the reference
(DCVC-TCM/src/entropy_models/entropy_models.py:212-394): stacked monotone
MLP CDF per channel (filters (3,3,3,3)), learnable quantiles with an aux
loss pinning tail mass, median-offset quantization, and baked CDF tables.

Used by the gen-1 / TCM intra image codecs; the newer generations use the
simpler BitEstimator (bit_estimator.py).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.rans import pmf_to_quantized_cdf
from .coder import CdfTable, EntropyCoder


class EntropyBottleneck(nn.Module):
    channels: int
    filters: tuple = (3, 3, 3, 3)
    init_scale: float = 10.0
    tail_mass: float = 1e-9

    def setup(self):
        filters = (1,) + tuple(self.filters) + (1,)
        scale = self.init_scale ** (1 / (len(self.filters) + 1))
        C = self.channels
        matrices, biases, factors = [], [], []
        for i in range(len(self.filters) + 1):
            init_m = math.log(math.expm1(1 / scale / filters[i + 1]))
            matrices.append(self.param(
                f"matrix{i}",
                lambda key, shape, v=init_m: jnp.full(shape, v, jnp.float32),
                (C, filters[i + 1], filters[i])))
            biases.append(self.param(
                f"bias{i}",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32,
                                                      -0.5, 0.5),
                (C, filters[i + 1], 1)))
            if i < len(self.filters):
                factors.append(self.param(
                    f"factor{i}", nn.initializers.zeros,
                    (C, filters[i + 1], 1)))
        self.matrices, self.biases, self.factors = matrices, biases, factors
        self.quantiles = self.param(
            "quantiles",
            lambda key, shape: jnp.tile(
                jnp.asarray([[-self.init_scale, 0.0, self.init_scale]]),
                (C, 1, 1)).reshape(shape),
            (C, 1, 3))

    def logits_cumulative(self, inputs):
        """inputs: [C, 1, N] -> logits [C, 1, N]."""
        logits = inputs
        for i in range(len(self.filters) + 1):
            logits = jnp.matmul(jax.nn.softplus(self.matrices[i]), logits)
            logits = logits + self.biases[i]
            if i < len(self.filters):
                logits = logits + jnp.tanh(self.factors[i]) * jnp.tanh(logits)
        return logits

    def medians(self):
        return self.quantiles[:, 0, 1]

    def aux_loss(self):
        target = math.log(2 / self.tail_mass - 1)
        targets = jnp.asarray([-target, 0.0, target])
        logits = self.logits_cumulative(self.quantiles)
        return jnp.sum(jnp.abs(logits - targets[None, None, :]))

    def likelihood(self, x):
        """x: [B, H, W, C] (quantized values); returns per-element probs."""
        # evaluate per channel: reshape to [C, 1, B*H*W]
        B, H, W, C = x.shape
        v = x.transpose(3, 0, 1, 2).reshape(C, 1, -1)
        lower = self.logits_cumulative(v - 0.5)
        upper = self.logits_cumulative(v + 0.5)
        sign = -jnp.sign(lower + upper)
        sign = jax.lax.stop_gradient(sign)
        likelihood = jnp.abs(jax.nn.sigmoid(sign * upper)
                             - jax.nn.sigmoid(sign * lower))
        return likelihood.reshape(C, B, H, W).transpose(1, 2, 3, 0)

    def __call__(self, x, quant):
        medians = self.medians().reshape(1, 1, 1, -1)
        x_hat = quant(x - medians) + medians
        return x_hat, self.likelihood(x_hat - medians)


def build_bottleneck_tables(params, module: EntropyBottleneck,
                            precision: int = 16):
    """Bake quantized CDF tables (the CompressAI update() step)."""

    def apply_logits(v):
        return module.apply(params, v, method=EntropyBottleneck.logits_cumulative)

    q = np.asarray(module.apply(params, method=EntropyBottleneck.medians))
    quantiles = np.asarray(params["params"]["quantiles"])
    minima = np.ceil(q - quantiles[:, 0, 0]).astype(np.int32)
    maxima = np.ceil(quantiles[:, 0, 2] - q).astype(np.int32)
    minima = np.maximum(minima, 0)
    maxima = np.maximum(maxima, 0)

    offset = -minima
    pmf_length = maxima + minima + 1
    max_length = int(pmf_length.max())
    C = q.shape[0]

    samples = (np.arange(max_length, dtype=np.float32)[None, :]
               - minima[:, None] + q[:, None])  # absolute values per channel
    v = jnp.asarray(samples.reshape(C, 1, -1))
    lower = np.asarray(apply_logits(v - 0.5)).reshape(C, -1)
    upper = np.asarray(apply_logits(v + 0.5)).reshape(C, -1)
    sign = -np.sign(lower + upper)
    pmf = np.abs(_sigmoid(sign * upper) - _sigmoid(sign * lower))
    tail = (_sigmoid(lower[np.arange(C), 0])
            + _sigmoid(-upper[np.arange(C), pmf_length - 1]))

    quantized = np.zeros((C, max_length + 2), dtype=np.int32)
    for c in range(C):
        n = int(pmf_length[c])
        prob = np.concatenate([pmf[c, :n], [tail[c]]]).astype(np.float32)
        cdf = pmf_to_quantized_cdf(prob, precision)
        quantized[c, : cdf.size] = cdf
    return CdfTable(quantized_cdf=quantized,
                    cdf_length=(pmf_length + 2).astype(np.int32),
                    offset=offset.astype(np.int32))


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def bottleneck_encode(coder: EntropyCoder, z, medians, table: CdfTable):
    """Symbols = round(z - medians); channel-indexed factorized coding."""
    z = np.asarray(z)
    symbols = np.round(z - medians.reshape(1, 1, 1, -1))
    n, h, w, c = z.shape
    idx = np.broadcast_to(np.arange(c, dtype=np.int16), z.shape)
    coder.encode_with_indexes(symbols.reshape(-1), idx.reshape(-1), table)


def bottleneck_decode(coder: EntropyCoder, shape_nhwc, medians,
                      table: CdfTable) -> np.ndarray:
    n, h, w, c = shape_nhwc
    idx = np.broadcast_to(np.arange(c, dtype=np.int16), shape_nhwc)
    out = coder.decode_stream(idx.reshape(-1), table).reshape(shape_nhwc)
    return out.astype(np.float32) + medians.reshape(1, 1, 1, -1)

"""Generalized Divisive Normalization (TCM / DCVC gen-1 codecs).

Parity target: DCVC-TCM/src/layers/gdn.py:22-96 with CompressAI's
NonNegativeParametrizer (DCVC-TCM/src/ops/parametrizers.py:21): parameters
are stored as sqrt(value + pedestal) and lower-bounded on use, so ported
checkpoints keep their reparametrized form.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..ops.math import lower_bound

_PEDESTAL = 2.0 ** -18


def _reparam_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, (value + _PEDESTAL) ** 0.5, dtype)
    return init


def _reparam_get(param, minimum: float):
    bound = (minimum + _PEDESTAL) ** 0.5
    return lower_bound(param, bound) ** 2 - _PEDESTAL


class GDN(nn.Module):
    """y = x / sqrt(beta + gamma * x^2) (or * sqrt(...) if inverse)."""

    channels: int
    inverse: bool = False
    beta_min: float = 1e-6
    gamma_init: float = 0.1

    @nn.compact
    def __call__(self, x):
        C = self.channels
        beta_p = self.param("beta", _reparam_init(1.0), (C,))
        gamma_p = self.param(
            "gamma",
            lambda key, shape: jnp.sqrt(
                self.gamma_init * jnp.eye(C) + _PEDESTAL).astype(jnp.float32),
            (C, C))
        beta = _reparam_get(beta_p, self.beta_min)
        gamma = _reparam_get(gamma_p, 0.0)  # [C_out, C_in]
        norm = jnp.einsum("bhwc,oc->bhwo", x * x, gamma) + beta
        norm = jnp.sqrt(norm)
        return x * norm if self.inverse else x / norm


class GDN1(GDN):
    """Simplified GDN: |x| instead of x^2, no sqrt."""

    @nn.compact
    def __call__(self, x):
        C = self.channels
        beta_p = self.param("beta", _reparam_init(1.0), (C,))
        gamma_p = self.param(
            "gamma",
            lambda key, shape: jnp.sqrt(
                self.gamma_init * jnp.eye(C) + _PEDESTAL).astype(jnp.float32),
            (C, C))
        beta = _reparam_get(beta_p, self.beta_min)
        gamma = _reparam_get(gamma_p, 0.0)
        norm = jnp.einsum("bhwc,oc->bhwo", jnp.abs(x), gamma) + beta
        return x * norm if self.inverse else x / norm

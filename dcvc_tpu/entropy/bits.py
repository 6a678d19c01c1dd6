"""Differentiable bit-cost estimators (the write_stream=0 path).

Parity target: CompressionModel.get_y_gaussian_bits / get_y_laplace_bits /
get_z_bits (reference DCVC-DC/src/models/common_model.py:39-61). All
functions are jittable and operate on NHWC tensors.
"""

import math

import jax
import jax.numpy as jnp

_LOG2 = math.log(2.0)


def probs_to_bits(probs: jnp.ndarray) -> jnp.ndarray:
    bits = -jnp.log(probs + 1e-5) / _LOG2
    return jnp.maximum(bits, 0.0)


def laplace_cdf(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    return 0.5 - 0.5 * jnp.sign(x) * jnp.expm1(-jnp.abs(x) / scale)


def gaussian_cdf(x: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    # ndtr rejects bf16, and tail probabilities need f32 anyway; the caller
    # gets back its own dtype
    z = (x / scale).astype(jnp.float32)
    return jax.scipy.special.ndtr(z).astype(x.dtype)


def y_laplace_bits(y: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Bits for residual y under a zero-mean Laplace with scale sigma."""
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    probs = laplace_cdf(y + 0.5, sigma) - laplace_cdf(y - 0.5, sigma)
    return probs_to_bits(probs)


def y_gaussian_bits(y: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """Bits for residual y under a zero-mean Gaussian with std sigma."""
    sigma = jnp.clip(sigma, 1e-5, 1e10)
    probs = gaussian_cdf(y + 0.5, sigma) - gaussian_cdf(y - 0.5, sigma)
    return probs_to_bits(probs)


def z_bits(z: jnp.ndarray, cdf_fn) -> jnp.ndarray:
    """Bits for hyper-latent z under a learned factorized prior.

    ``cdf_fn`` maps values to CDF in [0, 1] (e.g. a bound BitEstimator).
    """
    probs = cdf_fn(z + 0.5) - cdf_fn(z - 0.5)
    return probs_to_bits(probs)

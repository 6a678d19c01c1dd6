"""L1 entropy-model tests: table baking, round-trips, estimated-vs-real bits.

The estimated-vs-real cross-check is the reference's built-in consistency
oracle (SURVEY.md §4 item 2: overhead < 0.5% at 1080p-scale payloads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.entropy import (
    BitEstimator,
    EntropyCoder,
    bits,
    build_factorized_tables,
    build_gaussian_tables,
)
from dcvc_tpu.entropy.bit_estimator import decode_factorized, encode_factorized


@pytest.fixture(scope="module")
def bit_estimator():
    C = 16
    m = BitEstimator(channels=C)
    params = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 4, C)))
    return m, params, C


def test_bit_estimator_cdf_monotone(bit_estimator):
    m, params, C = bit_estimator
    xs = jnp.linspace(-30, 30, 61)[None, :, None, None]
    xs = jnp.broadcast_to(xs, (1, 61, 1, C))
    cdf = m.apply(params, xs)
    assert np.all(np.diff(np.asarray(cdf), axis=1) >= -1e-6)


def test_factorized_roundtrip(bit_estimator):
    m, params, C = bit_estimator
    table = build_factorized_tables(params, C)
    assert table.quantized_cdf.shape[0] == C

    rng = np.random.default_rng(0)
    z_hat = rng.integers(-8, 8, size=(1, 6, 10, C)).astype(np.float32)
    coder = EntropyCoder()
    coder.reset()
    encode_factorized(coder, z_hat, table)
    coder.flush()
    stream = coder.get_encoded_stream()
    coder.set_stream(stream)
    out = decode_factorized(coder, z_hat.shape, table)
    np.testing.assert_array_equal(z_hat, out)


@pytest.mark.parametrize("distribution", ["laplace", "gaussian"])
def test_gaussian_conditional_roundtrip(distribution):
    g = build_gaussian_tables(distribution)
    rng = np.random.default_rng(1)
    scales = rng.uniform(0.05, 16.0, size=(1, 8, 8, 32)).astype(np.float32)
    y_q = np.round(rng.laplace(0, 2.0, size=scales.shape)).astype(np.float32)

    coder = EntropyCoder(stream_part=2)
    coder.reset()
    g.encode(coder, y_q, scales)
    coder.flush()
    coder.set_stream(coder.get_encoded_stream())
    out = g.decode_stream(coder, scales)
    np.testing.assert_array_equal(y_q, out)


@pytest.mark.parametrize("distribution", ["laplace", "gaussian"])
def test_estimated_bits_match_real_stream(distribution):
    """Differentiable bit estimate must be close to the real rANS stream size."""
    g = build_gaussian_tables(distribution)
    rng = np.random.default_rng(2)
    shape = (1, 32, 32, 64)
    scales = rng.uniform(0.3, 8.0, size=shape).astype(np.float32)
    # sample y from the model distribution so the code is actually matched
    if distribution == "laplace":
        y = rng.laplace(0, scales)
    else:
        y = rng.normal(0, scales)
    y_q = np.round(y).astype(np.float32)

    est_fn = bits.y_laplace_bits if distribution == "laplace" else bits.y_gaussian_bits
    est = float(jnp.sum(est_fn(jnp.asarray(y_q), jnp.asarray(scales))))

    coder = EntropyCoder()
    coder.reset()
    g.encode(coder, y_q, scales)
    coder.flush()
    real = len(coder.get_encoded_stream()) * 8
    # scale-table discretization + stream flush overhead: allow 5% + 128 bits
    assert real < est * 1.05 + 128
    assert real > est * 0.85


def test_build_indexes_truncation():
    g = build_gaussian_tables("laplace")
    scales = jnp.asarray([1e-9, 0.01, 0.5, 64.0, 1e5])
    idx = np.asarray(g.build_indexes(scales))
    assert idx[0] == 0 and idx[1] == 0
    assert idx[3] == 255 and idx[4] == 255
    assert 0 < idx[2] < 255

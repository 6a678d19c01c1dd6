"""Scalable EVC tests: scalable_add, RD encoder selection, coding roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.evc_scalable import ScalableEVC, scalable_add
from dcvc_tpu.models.runtime import ScalableEvcRuntime


def test_scalable_add_running_mean():
    ys = jnp.asarray(np.random.default_rng(0).normal(0, 1, (3, 1, 4, 4, 2)),
                     jnp.float32)
    out = scalable_add(ys)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ys[0]), atol=1e-6)
    np.testing.assert_allclose(np.asarray(out[2]),
                               np.asarray(ys.sum(0) / 3), atol=1e-6)
    # gradient flows only through the current layer (prefix detached)
    g = jax.grad(lambda y: jnp.sum(scalable_add(y)[1]))(ys)
    assert float(jnp.abs(g[2]).max()) == 0.0
    assert float(jnp.abs(g[0]).max()) == 0.0  # detached prefix
    np.testing.assert_allclose(np.asarray(g[1]), 0.5, atol=1e-6)


@pytest.fixture(scope="module")
def scalable():
    module = ScalableEVC(enc_num=2, enc_channels=(8, 8, 16, 32),
                         dec_channels=(8, 8, 16, 32), N=32)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         jnp.ones(()))
    rt = ScalableEvcRuntime(module, params, rate_idx=1)
    rt.update(force=True)
    return rt


def _img(seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, 8, 8, 3))
    return jnp.clip(jax.image.resize(jnp.asarray(base), (1, 64, 64, 3),
                                     "linear"), 0, 1).astype(jnp.float32)


def test_scalable_forward_selects_encoder(scalable):
    out = scalable.forward(_img(1), jnp.ones(()))
    assert out["enc_id"] in (0, 1)
    assert out["x_hat"].shape == (1, 64, 64, 3)


def test_scalable_roundtrip(scalable):
    x = _img(2)
    comp = scalable.compress(x, jnp.asarray(0.9))
    dec = scalable.decompress(comp["bit_stream"], 64, 64, jnp.asarray(0.9))
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)

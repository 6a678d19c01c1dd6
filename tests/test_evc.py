"""End-to-end slice test: EVC intra codec (SURVEY.md §7 minimum slice).

Exercises layers zoo -> enc/dec -> hyper + dual prior -> entropy models ->
rANS -> decode. Checks:
  * decompress(compress(x)) reproduces the encoder-side reconstruction
    exactly (the reference's built-in round-trip oracle, §4 item 3),
  * estimated bits (forward) vs real stream size stay close (§4 item 2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.evc import EVCIntra
from dcvc_tpu.models.runtime import EvcCodecRuntime


@pytest.fixture(scope="module")
def evc_ss():
    # miniature channel grid (c16x == N) keeps the CPU test fast
    module = EVCIntra(enc_channels=(16, 16, 32, 64),
                      dec_channels=(16, 16, 32, 64), N=64)
    rng = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 64, 64, 3))
    params = module.init(rng, x, jnp.ones((1, 1, 1, 1)))
    rt = EvcCodecRuntime(module, params)
    rt.update(force=True)
    return module, params, rt


def _test_image(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    # smooth-ish synthetic image: random low-freq + noise
    base = rng.random((1, h // 8, w // 8, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h, w, 3), "linear")
    img = img + rng.normal(0, 0.02, (1, h, w, 3))
    return jnp.clip(img, 0, 1).astype(jnp.float32)


def test_forward_shapes(evc_ss):
    module, params, rt = evc_ss
    x = _test_image()
    out = rt.forward(x, jnp.ones((1, 1, 1, 1)))
    assert out["x_hat"].shape == x.shape
    assert float(out["bpp"][0]) > 0


def test_compress_decompress_roundtrip(evc_ss):
    module, params, rt = evc_ss
    x = _test_image()
    q = jnp.ones((1, 1, 1, 1)) * 0.8
    comp = rt.compress(x, q)
    assert len(comp["bit_stream"]) > 0
    dec = rt.decompress(comp["bit_stream"], 64, 64, q)
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)


def test_estimated_vs_real_bits(evc_ss):
    module, params, rt = evc_ss
    x = _test_image(seed=1)
    q = jnp.ones((1, 1, 1, 1))
    est = float(rt.forward(x, q)["bit"])
    real = len(rt.compress(x, q)["bit_stream"]) * 8
    assert real < est * 1.10 + 1024, (est, real)


def test_quant_ste_gradient():
    from dcvc_tpu.models.priors import quant_ste

    g = jax.grad(lambda v: jnp.sum(quant_ste(v) ** 2))(jnp.asarray([1.2, -0.7]))
    np.testing.assert_allclose(np.asarray(g), [2.0, -2.0])

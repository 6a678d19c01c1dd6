"""IntraNoAR (DCVC-DC I-frame codec) tests: four-part prior + e2e roundtrip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models import priors
from dcvc_tpu.models.intra_dc import IntraNoAR
from dcvc_tpu.models.runtime import IntraDcRuntime


@pytest.fixture(scope="module")
def intra():
    module = IntraNoAR(N=32, ch_a=16, ch_b=24)  # miniature for CPU tests
    x = jnp.zeros((1, 64, 64, 3))
    params = module.init(jax.random.PRNGKey(0), x, jnp.ones(()), jnp.ones(()))
    rt = IntraDcRuntime(module, params)
    rt.update(force=True)
    return module, params, rt


def _img(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8, w // 8, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h, w, 3), "linear")
    return jnp.clip(img + rng.normal(0, 0.02, (1, h, w, 3)), 0, 1).astype(jnp.float32)


def test_four_part_masks_partition():
    masks = [np.asarray(priors.spatial_phase_mask(6, 6, p)) for p in range(4)]
    total = sum(masks)
    np.testing.assert_array_equal(total, np.ones_like(total))
    # odd sizes must also partition
    masks = [np.asarray(priors.spatial_phase_mask(5, 7, p)) for p in range(4)]
    np.testing.assert_array_equal(sum(masks), np.ones((1, 5, 7, 1)))


def test_four_part_write_planes_cover_everything(intra):
    """The 4 write planes must jointly carry every latent symbol exactly once."""
    y = jnp.asarray(np.random.default_rng(1).normal(0, 3, (1, 8, 8, 32)),
                    jnp.float32)
    params = jnp.asarray(
        np.random.default_rng(2).normal(0, 1, (1, 8, 8, 96)), jnp.float32)

    def prior_fn(p):
        # deterministic mock: derive 8 chunks from input statistics
        base = jnp.mean(p, axis=-1, keepdims=True)
        return [base + i for i in range(8)]

    y_res, y_q, y_hat, scales_hat = priors.forward_four_part_prior(
        y, params, [prior_fn] * 3)
    w_q, w_s, y_hat_w = priors.forward_four_part_prior(
        y, params, [prior_fn] * 3, write=True)
    np.testing.assert_allclose(np.asarray(y_hat), np.asarray(y_hat_w), atol=1e-6)
    # sum of per-step plane L1 mass == full y_q L1 mass (partition, no overlap)
    total_w = sum(float(jnp.sum(jnp.abs(p))) for p in w_q)
    assert np.isclose(total_w, float(jnp.sum(jnp.abs(y_q))), rtol=1e-6)


def test_forward(intra):
    module, params, rt = intra
    out = rt.forward(_img(), q_in_ckpt=True, q_index=0)
    assert out["x_hat"].shape == (1, 64, 64, 3)
    assert float(out["bpp"][0]) > 0


def test_compress_decompress_roundtrip(intra):
    module, params, rt = intra
    x = _img(seed=3)
    comp = rt.compress(x, q_in_ckpt=False, q_index=31)
    dec = rt.decompress(comp["bit_stream"], 64, 64, q_in_ckpt=False, q_index=31)
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)


def test_estimated_vs_real_bits(intra):
    module, params, rt = intra
    x = _img(seed=4)
    est = float(rt.forward(x, True, 0)["bit"])
    real = len(rt.compress(x, True, 0)["bit_stream"]) * 8
    assert real < est * 1.10 + 1024, (est, real)


def test_non_multiple_of_64_padding(intra):
    """y at /16 of a 80x112 input is 5x7 — exercises pad_for_y (4-alignment)."""
    module, params, rt = intra
    x = _img(80, 112, seed=5)
    comp = rt.compress(x, True, 1)
    dec = rt.decompress(comp["bit_stream"], 80, 112, True, 1)
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)

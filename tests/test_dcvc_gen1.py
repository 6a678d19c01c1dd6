"""Gen-1 DCVC tests: pixel-AR wavefront coding correctness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models import ar_coding
from dcvc_tpu.models.video_dcvc import DCVCNet
from dcvc_tpu.models.runtime import DcvcGen1Runtime


def test_wavefront_schedule_covers_all_pixels():
    H, W = 7, 11
    seen = np.zeros((H, W), bool)
    prev_max = -1
    for pixels in ar_coding.wavefronts(H, W, 2):
        for h, w in pixels:
            assert not seen[h, w]
            seen[h, w] = True
            # causality: all kernel dependencies already coded
            for dh in range(-2, 1):
                for dw in range(-2, 3):
                    if dh == 0 and dw >= 0:
                        continue
                    hh, ww = h + dh, w + dw
                    if 0 <= hh < H and 0 <= ww < W and (dh < 0 or dw < 0):
                        if dh < 0 or (dh == 0 and dw < 0):
                            assert seen[hh, ww], (h, w, hh, ww)
    assert seen.all()


def test_mask_a():
    m = ar_coding.masked_conv_mask_a(5)
    assert m[2, 2] == 0 and m[2, 1] == 1 and m[1, 4] == 1 and m[2, 3] == 0
    assert m.sum() == 12


def _img(h=64, w=64, seed=0, shift=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8 + 2, w // 8 + 2, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h + 16, w + 16, 3), "linear")
    return jnp.clip(img[:, shift:shift + h, shift:shift + w, :], 0, 1
                    ).astype(jnp.float32)


@pytest.fixture(scope="module")
def gen1():
    module = DCVCNet(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    params = module.init(jax.random.PRNGKey(0), x, x)
    rt = DcvcGen1Runtime(module, params)
    rt.update(force=True)
    return rt


def test_gen1_forward(gen1):
    ref, x = _img(seed=1), _img(seed=1, shift=1)
    out = gen1.forward(ref, x)
    assert out["recon_image"].shape == x.shape
    assert np.isfinite(float(out["bpp"]))


def test_gen1_roundtrip(gen1):
    ref, x = _img(seed=2), _img(seed=2, shift=1)
    comp = gen1.compress(ref, x)
    dec = gen1.decompress(ref, comp["mv_y_string"], comp["mv_z_string"],
                          comp["y_string"], comp["z_string"], 64, 64)
    np.testing.assert_allclose(np.asarray(comp["recon_image"]),
                               np.asarray(dec["recon_image"]), atol=1e-5)

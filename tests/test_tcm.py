"""TCM generation tests: temporal-context-mining P-frame codec."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.video_tcm import DMCTcm
from dcvc_tpu.models.runtime import TcmVideoRuntime


def _img(h=64, w=64, seed=0, shift=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8 + 2, w // 8 + 2, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h + 16, w + 16, 3), "linear")
    return jnp.clip(img[:, shift:shift + h, shift:shift + w, :], 0, 1
                    ).astype(jnp.float32)


@pytest.fixture(scope="module")
def tcm():
    module = DMCTcm(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    params = module.init(jax.random.PRNGKey(0), x, x, None)
    rt = TcmVideoRuntime(module, params)
    rt.update(force=True)
    return rt


def test_tcm_forward_chain(tcm):
    ref = _img(seed=1)
    feature = None
    for i in range(2):
        out = tcm.forward_one_frame(_img(seed=1, shift=i + 1), ref, feature)
        ref, feature = out["recon_image"], out["feature"]
        assert np.isfinite(float(out["bpp"]))


def test_tcm_roundtrip(tcm):
    ref = _img(seed=2)
    x = _img(seed=2, shift=1)
    comp = tcm.compress(x, ref, None)
    dec = tcm.decompress(ref, None, comp["bit_stream"], 64, 64)
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(comp["feature"]),
                               np.asarray(dec["feature"]), atol=1e-5)


def test_tcm_aligned_enc_stream_identity(tcm):
    """DCVC_TPU_ALIGNED_ENC replays the DECODER'S executables on the
    encode side (bf16 fusion-divergence guard — see
    TcmVideoRuntime._aligned_indexes). On f32 both index paths are
    deterministic and must produce BYTE-IDENTICAL streams; the aligned
    stream must also still decode to the encoder recon."""
    rt = tcm
    ref = _img(seed=7)
    x = _img(seed=7, shift=1)
    comp = rt.compress(x, ref, None)
    rt.aligned_enc = True
    try:
        comp2 = rt.compress(x, ref, None)
        assert comp["bit_stream"] == comp2["bit_stream"]
        dec = rt.decompress(ref, None, comp2["bit_stream"], 64, 64)
        np.testing.assert_allclose(np.asarray(comp2["x_hat"]),
                                   np.asarray(dec["x_hat"]), atol=1e-5)
    finally:
        rt.aligned_enc = False

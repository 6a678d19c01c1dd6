"""HEM generation tests: intra (dual prior) + video (latent temporal prior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.intra_hem import IntraNoARHem
from dcvc_tpu.models.video_hem import DMCHem
from dcvc_tpu.models.runtime import EvcCodecRuntime, HemVideoRuntime


def _img(h=64, w=64, seed=0, shift=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8 + 2, w // 8 + 2, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h + 16, w + 16, 3), "linear")
    return jnp.clip(img[:, shift:shift + h, shift:shift + w, :], 0, 1
                    ).astype(jnp.float32)


@pytest.fixture(scope="module")
def hem_intra():
    module = IntraNoARHem(N=32)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         jnp.ones(()))
    rt = EvcCodecRuntime(module, params)
    rt.update(force=True)
    return rt


def test_hem_intra_roundtrip(hem_intra):
    x = _img(seed=1)
    q = jnp.asarray(0.73)
    comp = hem_intra.compress(x, q)
    dec = hem_intra.decompress(comp["bit_stream"], 64, 64, q)
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)


def test_hem_intra_estimated_vs_real(hem_intra):
    x = _img(seed=2)
    q = jnp.asarray(1.0)
    est = float(hem_intra.forward(x, q)["bit"])
    real = len(hem_intra.compress(x, q)["bit_stream"]) * 8
    assert real < est * 1.10 + 1024


@pytest.fixture(scope="module")
def hem_video():
    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None, "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))
    rt = HemVideoRuntime(module, params)
    rt.update(force=True)
    return rt


def test_hem_video_forward_chain(hem_video):
    ref = _img(seed=3)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    for i in range(2):
        out = hem_video.forward_one_frame(_img(seed=3, shift=i + 1), dpb,
                                          1.0, 1.0)
        dpb = out["dpb"]
        assert np.isfinite(float(out["bpp"][0]))
    assert dpb["ref_y"].shape[-1] == 24


def test_hem_video_roundtrip(hem_video):
    ref = _img(seed=4)
    x = _img(seed=4, shift=1)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    comp = hem_video.compress(x, dpb, 0.9, 0.8)
    dec = hem_video.decompress(dpb, comp["bit_stream"], 64, 64, 0.9, 0.8)
    for key in ("ref_frame", "ref_feature", "ref_y", "ref_mv_y"):
        np.testing.assert_allclose(np.asarray(comp["dpb"][key]),
                                   np.asarray(dec["dpb"][key]),
                                   atol=1e-5, err_msg=key)


def test_hem_aligned_enc_stream_identity(hem_video):
    """DCVC_TPU_ALIGNED_ENC replays the DECODER'S executables on the
    encode side (bf16 fusion-divergence guard — see
    HemVideoRuntime._aligned_indexes). On f32 both index paths are
    deterministic and must produce BYTE-IDENTICAL streams; the aligned
    stream must also still decode to the encoder-side DPB."""
    rt = hem_video
    ref = _img(seed=6)
    x = _img(seed=6, shift=1)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    comp = rt.compress(x, dpb, 0.9, 0.8)
    rt.aligned_enc = True
    try:
        comp2 = rt.compress(x, dpb, 0.9, 0.8)
        assert comp["bit_stream"] == comp2["bit_stream"]
        dec = rt.decompress(dpb, comp2["bit_stream"], 64, 64, 0.9, 0.8)
        np.testing.assert_allclose(np.asarray(comp2["dpb"]["ref_frame"]),
                                   np.asarray(dec["dpb"]["ref_frame"]),
                                   atol=1e-5)
    finally:
        rt.aligned_enc = False

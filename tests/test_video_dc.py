"""DMC (DCVC-DC P-frame codec) tests: forward, roundtrip, DPB chaining."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.video_dc import DMC
from dcvc_tpu.models.runtime import DmcRuntime


def _frame(h=64, w=64, seed=0, shift=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8 + 2, w // 8 + 2, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h + 16, w + 16, 3), "linear")
    img = img[:, shift:shift + h, shift:shift + w, :]
    return jnp.clip(img, 0, 1).astype(jnp.float32)


def _initial_dpb(ref_frame):
    return {"ref_frame": ref_frame, "ref_feature": None,
            "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}


@pytest.fixture(scope="module")
def dmc():
    module = DMC()
    x = jnp.zeros((1, 64, 64, 3))
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    params = module.init(jax.random.PRNGKey(0), x, _initial_dpb(x), qs, 0)
    rt = DmcRuntime(module, params)
    rt.update(force=True)
    return module, params, rt


def test_forward_first_p_frame(dmc):
    module, params, rt = dmc
    ref = _frame(seed=1)
    x = _frame(seed=1, shift=2)  # shifted version: motion should help
    out = rt.forward_one_frame(x, _initial_dpb(ref), q_in_ckpt=True, q_index=0)
    assert out["dpb"]["ref_frame"].shape == x.shape
    assert out["dpb"]["ref_feature"].shape[-1] == 48
    assert out["dpb"]["ref_y"].shape[-1] == 128
    assert float(out["bpp"][0]) > 0


def test_forward_chained_p_frames(dmc):
    module, params, rt = dmc
    ref = _frame(seed=2)
    dpb = _initial_dpb(ref)
    for idx in (1, 2):
        out = rt.forward_one_frame(_frame(seed=2, shift=idx), dpb,
                                   q_in_ckpt=True, q_index=0, frame_idx=idx)
        dpb = out["dpb"]
        assert np.isfinite(float(out["bpp"][0]))


def test_compress_decompress_roundtrip(dmc):
    module, params, rt = dmc
    ref = _frame(seed=3)
    x = _frame(seed=3, shift=1)
    dpb = _initial_dpb(ref)
    comp = rt.compress(x, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    assert len(comp["bit_stream"]) > 0
    dec = rt.decompress(dpb, comp["bit_stream"], 64, 64,
                        q_in_ckpt=True, q_index=0, frame_idx=1)
    for key in ("ref_frame", "ref_feature", "ref_mv_feature", "ref_y", "ref_mv_y"):
        np.testing.assert_allclose(np.asarray(comp["dpb"][key]),
                                   np.asarray(dec["dpb"][key]),
                                   atol=1e-5, err_msg=key)


def test_roundtrip_with_tile_warp_mode():
    """Bitstream consistency is warp-mode-independent: encoder and decoder
    share the tile warp, so decode still reproduces the encoder recon (the
    RD gate for defaulting tile mode on TPU, VERDICT round-1 item #1)."""
    module = DMC(od_warp_mode="tile:16,2")
    x0 = jnp.zeros((1, 64, 64, 3))
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    params = module.init(jax.random.PRNGKey(0), x0, _initial_dpb(x0), qs, 0)
    rt = DmcRuntime(module, params)
    rt.update(force=True)
    ref = _frame(seed=4)
    x = _frame(seed=4, shift=1)
    dpb = _initial_dpb(ref)
    comp = rt.compress(x, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    dec = rt.decompress(dpb, comp["bit_stream"], 64, 64,
                        q_in_ckpt=True, q_index=0, frame_idx=1)
    for key in ("ref_frame", "ref_feature", "ref_mv_feature", "ref_y",
                "ref_mv_y"):
        np.testing.assert_allclose(np.asarray(comp["dpb"][key]),
                                   np.asarray(dec["dpb"][key]),
                                   atol=1e-5, err_msg=key)


def test_aligned_enc_stream_identity(dmc):
    """DCVC_TPU_ALIGNED_ENC replays the DECODER'S executables on the
    encode side to derive coding indexes (bf16 fusion-divergence guard,
    runtime.py:_aligned_indexes). On f32 the two index paths are
    deterministic and must produce BYTE-IDENTICAL streams; the aligned
    stream must also still decode to the encoder recon."""
    module, params, rt = dmc
    ref = _frame(seed=6)
    x = _frame(seed=6, shift=1)
    dpb = _initial_dpb(ref)
    comp = rt.compress(x, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    rt.aligned_enc = True
    try:
        comp2 = rt.compress(x, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
        assert comp["bit_stream"] == comp2["bit_stream"]
        dec = rt.decompress(dpb, comp2["bit_stream"], 64, 64,
                            q_in_ckpt=True, q_index=0, frame_idx=1)
        np.testing.assert_allclose(np.asarray(comp2["dpb"]["ref_frame"]),
                                   np.asarray(dec["dpb"]["ref_frame"]),
                                   atol=1e-5)
    finally:
        rt.aligned_enc = False

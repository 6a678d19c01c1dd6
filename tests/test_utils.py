"""Harness utility tests: color transforms, metrics, stream headers, results."""

import numpy as np
import pytest

from dcvc_tpu.utils import color, metrics
from dcvc_tpu.utils.results import summarize_sequence
from dcvc_tpu.utils.stream import (
    decode_i,
    decode_i_ushort_q,
    decode_p,
    encode_i,
    encode_i_ushort_q,
    encode_p,
    get_rounded_q,
)


def test_rgb_ycbcr_roundtrip():
    rng = np.random.default_rng(0)
    rgb = rng.random((32, 48, 3)).astype(np.float32)
    yuv = color.rgb_to_ycbcr(rgb)
    back = color.ycbcr_to_rgb(yuv)
    np.testing.assert_allclose(back, rgb, atol=2e-3)


def test_420_roundtrip_shapes():
    rng = np.random.default_rng(1)
    rgb = rng.random((32, 48, 3)).astype(np.float32)
    y, uv = color.rgb_to_ycbcr420(rgb)
    assert y.shape == (32, 48) and uv.shape == (2, 16, 24)
    rec = color.ycbcr420_to_rgb(y, uv)
    assert rec.shape == (32, 48, 3)
    # smooth image should survive chroma subsampling well
    smooth = np.broadcast_to(np.linspace(0, 1, 48)[None, :, None],
                             (32, 48, 3)).astype(np.float32)
    y, uv = color.rgb_to_ycbcr420(smooth)
    rec = color.ycbcr420_to_rgb(y, uv)
    assert metrics.calc_psnr(smooth, rec, data_range=1) > 38


def test_psnr_identity_and_msssim():
    rng = np.random.default_rng(2)
    img = rng.random((192, 192)).astype(np.float64)
    assert metrics.calc_psnr(img, img) == 999.9
    assert metrics.calc_msssim(img, img, data_range=1) > 0.999
    noisy = img + rng.normal(0, 0.1, img.shape)
    assert metrics.calc_msssim(img, noisy, data_range=1) < 0.999


def test_msssim_level_drop_small_image():
    rng = np.random.default_rng(3)
    img = rng.random((100, 100))
    v = metrics.calc_msssim(img, img, data_range=1)  # 4-level path
    assert v > 0.999
    with pytest.raises(ValueError):
        metrics.calc_msssim(img[:80], img[:80], data_range=1)


def test_stream_headers_roundtrip(tmp_path):
    payload = b"\x01\x02\x03\x04payload"
    p = tmp_path / "i.bin"
    encode_i(1080, 1920, True, 21, payload, p)
    h, w, q_in_ckpt, q_index, stream = decode_i(p)
    assert (h, w, q_in_ckpt, q_index) == (1080, 1920, True, 21)
    assert stream == payload

    p2 = tmp_path / "p.bin"
    encode_p(payload, False, 13, 3, p2)
    q_in_ckpt, q_index, frame_idx, stream = decode_p(p2)
    assert (q_in_ckpt, q_index, frame_idx) == (False, 13, 3)
    assert stream == payload

    p3 = tmp_path / "iu.bin"
    encode_i_ushort_q(720, 1280, 154, payload, p3)
    h, w, qi, stream = decode_i_ushort_q(p3)
    assert (h, w, qi) == (720, 1280, 154)


def test_get_rounded_q():
    q, qi = get_rounded_q(1.5417)
    assert qi == 154 and abs(q - 1.54) < 1e-9


def test_summarize_sequence():
    frames = [{"bpp": 0.1, "psnr": 30.0}, {"bpp": 0.02, "psnr": 35.0},
              {"bpp": 0.03, "psnr": 34.0}]
    s = summarize_sequence(frames, [True, False, False])
    assert s["frame_num"] == 3
    assert abs(s["ave_i_frame_bpp"] - 0.1) < 1e-9
    assert abs(s["ave_p_frame_bpp"] - 0.025) < 1e-9
    assert abs(s["ave_all_frame_psnr"] - 33.0) < 1e-9


def test_bd_metrics():
    """Bjontegaard deltas: identical curves -> 0; a +1dB-everywhere curve
    -> BD-PSNR +1dB and negative BD-rate."""
    from dcvc_tpu.utils.rd_numbers import EVC_KODAK, bd_psnr, bd_rate

    a = EVC_KODAK["EncL_DecL"]
    assert abs(bd_rate(a["bpp"], a["psnr"], a["bpp"], a["psnr"])) < 1e-9
    assert abs(bd_psnr(a["bpp"], a["psnr"], a["bpp"], a["psnr"])) < 1e-9
    up = [p + 1.0 for p in a["psnr"]]
    assert abs(bd_psnr(a["bpp"], a["psnr"], a["bpp"], up) - 1.0) < 1e-6
    assert bd_rate(a["bpp"], a["psnr"], a["bpp"], up) < -10

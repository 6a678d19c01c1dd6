"""Sequence harness tests: GOP loop, write_stream round trip, results JSON."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from dcvc_tpu.models.intra_dc import IntraNoAR
from dcvc_tpu.models.runtime import IntraDcRuntime
from dcvc_tpu.runner.video import EvalConfig, SequenceSpec, run_sequence


@pytest.fixture(scope="module")
def seq_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("seq")
    rng = np.random.default_rng(0)
    base = rng.random((10, 14, 3))
    for i in range(1, 4):
        img = np.kron(np.roll(base, i, axis=1), np.ones((8, 8, 1)))[:64, :96]
        Image.fromarray((np.clip(img, 0, 1) * 255).astype(np.uint8)).save(
            d / f"im{i}.png")
    return str(d)


@pytest.fixture(scope="module")
def intra_rt():
    module = IntraNoAR(N=32, ch_a=16, ch_b=24)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 96, 3)),
                         jnp.ones(()), jnp.ones(()))
    rt = IntraDcRuntime(module, params)
    rt.update(force=True)
    return rt


def test_run_sequence_estimated_bits(seq_dir, intra_rt, tmp_path):
    spec = SequenceSpec("testseq", seq_dir, 96, 64, 3, gop=32)
    cfg = EvalConfig(intra_period=1, frame_num=3, write_stream=False,
                     stream_path=str(tmp_path / "streams"))
    summary = run_sequence(intra_rt, None, spec, cfg, q_index_i=0)
    assert summary["frame_num"] == 3
    assert summary["ave_all_frame_bpp"] > 0
    assert np.isfinite(summary["ave_all_frame_psnr"])


def test_run_sequence_write_stream(seq_dir, intra_rt, tmp_path):
    spec = SequenceSpec("testseq", seq_dir, 96, 64, 3, gop=32)
    cfg = EvalConfig(intra_period=1, frame_num=2, write_stream=True,
                     stream_path=str(tmp_path / "streams"),
                     decoded_path=str(tmp_path / "decoded"))
    summary = run_sequence(intra_rt, None, spec, cfg, q_index_i=1)
    bins = os.listdir(tmp_path / "streams")
    assert len(bins) == 2
    # estimated and real bits should be in the same ballpark
    est = run_sequence(intra_rt, None, spec,
                       EvalConfig(intra_period=1, frame_num=2,
                                  stream_path=str(tmp_path / "s2")),
                       q_index_i=1)
    assert summary["ave_all_frame_bpp"] < est["ave_all_frame_bpp"] * 1.2 + 0.01
    # decoded frames written
    assert len(os.listdir(tmp_path / "decoded" / "testseq")) == 2


@pytest.mark.parametrize("gen", ["hem", "tcm", "gen1", "zoo_i"])
def test_run_sequence_adapters(gen, seq_dir, tmp_path):
    """Every non-DC generation drives the same GOP runner through the
    adapters (runner/adapters.py), estimated-bits + write_stream."""
    from dcvc_tpu.models.registry import build
    from dcvc_tpu.runner.adapters import adapt_i_runtime, adapt_p_runtime

    if gen == "hem":
        _, _, i_rt = build("intra_hem", N=16)
        _, _, p_rt = build("dmc_hem", channel_mv=16, channel_N=16,
                           channel_M=24)
    elif gen == "tcm":
        _, _, i_rt = build("mbt2018-mean", N=16, M=24)
        _, _, p_rt = build("dmc_tcm", channel_mv=16, channel_N=16,
                           channel_M=24)
    elif gen == "gen1":
        _, _, i_rt = build("bmshj2018-factorized", N=16, M=24)
        _, _, p_rt = build("dcvc_gen1", channel_mv=16, channel_N=16,
                           channel_M=24)
    else:  # intra-only with a zoo model
        _, _, i_rt = build("bmshj2018-hyperprior", N=16, M=24)
        p_rt = None
    i_rt.update(force=True)
    i_rt = adapt_i_runtime(i_rt)
    if p_rt is not None:
        p_rt.update(force=True)
        p_rt = adapt_p_runtime(p_rt)

    spec = SequenceSpec("testseq", seq_dir, 96, 64, 3, gop=32)
    intra_period = 1 if p_rt is None else 3
    est = run_sequence(i_rt, p_rt, spec,
                       EvalConfig(intra_period=intra_period, frame_num=3,
                                  pad_multiple=64,
                                  stream_path=str(tmp_path / "s_est")),
                       q_index_i=0, q_index_p=0)
    assert est["frame_num"] == 3
    assert est["ave_all_frame_bpp"] > 0
    assert np.isfinite(est["ave_all_frame_psnr"])

    ws = run_sequence(i_rt, p_rt, spec,
                      EvalConfig(intra_period=intra_period, frame_num=3,
                                 pad_multiple=64, write_stream=True,
                                 stream_path=str(tmp_path / "s_ws")),
                      q_index_i=0, q_index_p=0)
    assert len(os.listdir(tmp_path / "s_ws")) == 3
    assert ws["ave_all_frame_bpp"] > 0


def test_run_sequence_yuv420_metrics(tmp_path, intra_rt):
    """YUV420 source: metrics per plane in the 420 domain, (6Y+U+V)/8
    weighting, source chroma reproduced exactly through the order-0
    up/down round trip (DCVC-DC/test_video.py:110-186 contract)."""
    rng = np.random.default_rng(0)
    H, W, n = 192, 192, 1  # chroma >= 88: the HM MS-SSIM rule asserts below
    yuv_path = tmp_path / "seq.yuv"
    with open(yuv_path, "wb") as f:
        for _ in range(n):
            f.write(rng.integers(0, 256, H * W, dtype=np.uint8).tobytes())
            f.write(rng.integers(0, 256, H * W // 2, dtype=np.uint8).tobytes())

    spec = SequenceSpec("yuvseq", str(yuv_path), W, H, n, gop=32,
                        src_type="yuv420")
    cfg = EvalConfig(intra_period=1, frame_num=n, yuv420_metrics=True,
                     calc_ssim=True, stream_path=str(tmp_path / "s"))
    summary = run_sequence(intra_rt, None, spec, cfg, q_index_i=0)
    for k in ("psnr_y", "psnr_u", "psnr_v", "msssim_y", "msssim"):
        assert f"ave_all_frame_{k}" in summary
    yuv = (6 * summary["ave_all_frame_psnr_y"]
           + summary["ave_all_frame_psnr_u"]
           + summary["ave_all_frame_psnr_v"]) / 8
    assert abs(yuv - summary["ave_all_frame_psnr"]) < 1e-6


def test_fine_q_table_log_interp():
    """q_index -> q_scale: ckpt anchors when q_in_ckpt, 64-point
    log-interpolated fine table otherwise (EVC interpolate_log)."""
    from dcvc_tpu.runner.adapters import _QTable, fine_q_table

    anchors = np.asarray([0.5, 1.0, 2.0, 4.0])
    q = _QTable(lambda: anchors)
    assert q(True, 0) == 0.5 and q(True, 3) == 4.0
    fine = fine_q_table(anchors)
    assert len(fine) == 64
    assert abs(fine[0] - 0.5) < 1e-9 and abs(fine[-1] - 4.0) < 1e-9
    # log-spaced: ratios constant
    r = fine[1:] / fine[:-1]
    np.testing.assert_allclose(r, r[0], rtol=1e-9)
    assert abs(q(False, 0) - 0.5) < 1e-9 and abs(q(False, 63) - 4.0) < 1e-9

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

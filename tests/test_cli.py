"""CLI end-to-end smoke tests (subprocess, tiny inputs).

The CLIs are the user-facing surface (reference test_image.py /
test_video.py semantics); these catch arg-wiring and container regressions
that unit tests miss.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, timeout=600):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    return subprocess.run([sys.executable] + args, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    img = (np.kron(rng.random((8, 12, 3)), np.ones((8, 8, 1))) * 255)
    Image.fromarray(img.astype(np.uint8)).save(d / "im.png")
    return str(d)


def test_image_cli_write_stream(img_dir, tmp_path):
    out = tmp_path / "res.json"
    r = _run(["tools/test_image.py", "--model", "evc_SS",
              "--img_folder", img_dir, "--rate_num", "1",
              "--write_stream", "1",
              "--stream_path", str(tmp_path / "streams"),
              "--output_path", str(out)])
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    fr = res["average"]["rate_0"]
    assert fr["bpp"] > 0 and np.isfinite(fr["psnr"])
    assert len(os.listdir(tmp_path / "streams")) == 1


def test_video_cli_pair_and_results(img_dir, tmp_path):
    # build a 2-frame sequence + config
    seq = tmp_path / "seqs" / "s1"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(1)
    base = (np.kron(rng.random((8, 12, 3)), np.ones((8, 8, 1))) * 255)
    for i in (1, 2):
        Image.fromarray(np.roll(base, i, axis=1).astype(np.uint8)).save(
            seq / f"im{i:05d}.png")
    cfg = {"root_path": str(tmp_path / "seqs"),
           "test_classes": {"t": {"test": 1, "base_path": "",
                                  "src_type": "png",
                                  "sequences": {"s1": {"width": 96,
                                                       "height": 64,
                                                       "frames": 2,
                                                       "gop": 32}}}}}
    cfg_path = tmp_path / "cfg.json"
    json.dump(cfg, open(cfg_path, "w"))
    out = tmp_path / "res.json"
    r = _run(["tools/test_video.py", "--test_config", str(cfg_path),
              "--i_frame_model", "intra_hem", "--p_frame_model", "dmc_hem",
              "--rate_num", "1", "--q_indexes", "0",
              "--force_frame_num", "2",
              "--output_path", str(out)], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    summary = res["s1"]["rate_0"]
    assert summary["frame_num"] == 2
    assert summary["i_frame_num"] == 1 and summary["p_frame_num"] == 1
    assert summary["ave_all_frame_bpp"] > 0


def test_video_cli_worker_pool(tmp_path):
    """--worker_num process pool (reference test_video.py:276-338): two
    sequences fan out to two workers, results merge into one JSON."""
    rng = np.random.default_rng(3)
    for s in ("s1", "s2"):
        seq = tmp_path / "seqs" / s
        seq.mkdir(parents=True)
        base = (np.kron(rng.random((8, 12, 3)), np.ones((8, 8, 1))) * 255)
        Image.fromarray(base.astype(np.uint8)).save(seq / "im00001.png")
    cfg = {"root_path": str(tmp_path / "seqs"),
           "test_classes": {"t": {"test": 1, "base_path": "",
                                  "src_type": "png",
                                  "sequences": {
                                      s: {"width": 96, "height": 64,
                                          "frames": 1, "gop": 32}
                                      for s in ("s1", "s2")}}}}
    cfg_path = tmp_path / "cfg.json"
    json.dump(cfg, open(cfg_path, "w"))
    out = tmp_path / "res.json"
    r = _run(["tools/test_video.py", "--test_config", str(cfg_path),
              "--i_frame_model", "intra_hem", "--force_intra",
              "--rate_num", "1", "--q_indexes", "0",
              "--worker_num", "2",
              "--output_path", str(out)], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    for s in ("s1", "s2"):
        assert res[s]["rate_0"]["ave_all_frame_bpp"] > 0, res[s]


def test_video_cli_aligned_enc_write_stream(tmp_path):
    """--aligned_enc 1 drives the decoder-aligned P-frame encode through
    the CLI (runtime.py _aligned_indexes); on CPU/f32 the stream must
    decode with matching metrics, proving the flag wiring end-to-end."""
    seq = tmp_path / "seqs" / "s1"
    seq.mkdir(parents=True)
    rng = np.random.default_rng(5)
    base = (np.kron(rng.random((8, 12, 3)), np.ones((8, 8, 1))) * 255)
    for i in (1, 2):
        Image.fromarray(np.roll(base, i, axis=1).astype(np.uint8)).save(
            seq / f"im{i:05d}.png")
    cfg = {"root_path": str(tmp_path / "seqs"),
           "test_classes": {"t": {"test": 1, "base_path": "",
                                  "src_type": "png",
                                  "sequences": {"s1": {"width": 96,
                                                       "height": 64,
                                                       "frames": 2,
                                                       "gop": 32}}}}}
    cfg_path = tmp_path / "cfg.json"
    json.dump(cfg, open(cfg_path, "w"))
    out = tmp_path / "res.json"
    r = _run(["tools/test_video.py", "--test_config", str(cfg_path),
              "--i_frame_model", "intra_hem", "--p_frame_model", "dmc_hem",
              "--rate_num", "1", "--q_indexes", "0",
              "--force_frame_num", "2", "--write_stream", "1",
              "--aligned_enc", "1",
              "--stream_path", str(tmp_path / "streams"),
              "--output_path", str(out)], timeout=900)
    assert r.returncode == 0, r.stderr[-2000:]
    res = json.load(open(out))
    summary = res["s1"]["rate_0"]
    assert summary["frame_num"] == 2
    assert summary["ave_all_frame_bpp"] > 0
    assert np.isfinite(summary["ave_all_frame_psnr"])


def test_video_cli_rejects_mixed_padding(tmp_path):
    cfg = {"root_path": str(tmp_path), "test_classes": {}}
    cfg_path = tmp_path / "cfg.json"
    json.dump(cfg, open(cfg_path, "w"))
    r = _run(["tools/test_video.py", "--test_config", str(cfg_path),
              "--i_frame_model", "intra_dc", "--p_frame_model", "dmc_hem",
              "--write_stream", "1"], timeout=120)
    assert r.returncode != 0
    assert "padding generation" in (r.stderr + r.stdout)

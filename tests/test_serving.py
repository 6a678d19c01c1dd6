"""Warm codec server (dcvc_tpu/serving): end-to-end over a Unix socket.

Spawns tools/serve.py in a subprocess (CPU), then drives it with
CodecClient: image encode/decode roundtrip (container interops with the
CLI's .bin format), and a DMC video session whose decoder-side recons
match the encoder-side recons bit-exactly (the server refreshes the
encode DPB from a real decompress, mirroring runner/video.py).
"""

import os
import subprocess
import sys

import numpy as np
import pytest

from dcvc_tpu.serving import CodecClient

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _spawn_server(tmp_path, *args):
    sock = str(tmp_path / "dcvc.sock")
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH="")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "tools", "serve.py"),
         "--socket", sock, *args],
        env=env, cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    return proc, sock


@pytest.fixture(scope="module")
def video_server(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("serve")
    proc, sock = _spawn_server(tmp_path, "--i_frame_model", "intra_dc",
                               "--p_frame_model", "dmc_dc")
    yield sock, proc
    if proc.poll() is None:
        proc.kill()
    proc.wait()


def test_image_and_video_serving(video_server):
    sock, proc = video_server
    rng = np.random.default_rng(0)
    with CodecClient(sock, connect_timeout=300.0) as c:
        info = c.ping()
        assert info["i_model"] == "intra_dc" and info["p_model"] == "dmc_dc"

        # --- image path: container interop + decode == want_recon recon ---
        img = (rng.random((40, 56, 3)) * 255).astype(np.uint8)
        container, recon_enc, bpp = c.encode_image(img, q_index=1,
                                                   want_recon=True)
        assert bpp > 0
        from dcvc_tpu.utils.stream import unpack_i

        h, w, q_in_ckpt, q_index, stream = unpack_i(container)
        assert (h, w, q_in_ckpt, q_index) == (40, 56, True, 1)
        recon_dec = c.decode_image(container)
        np.testing.assert_array_equal(recon_enc, recon_dec)

        # --- video session: encoder-side and decoder-side recons match ---
        frames = [(rng.random((40, 56, 3)) * 255).astype(np.uint8)
                  for _ in range(3)]
        enc_sid = c.open_video()
        streams, enc_recons = [], []
        for idx, f in enumerate(frames):
            kind = "i" if idx == 0 else "p"
            s, r, bpp = c.encode_frame(enc_sid, f, kind=kind, frame_idx=idx,
                                       want_recon=True)
            assert bpp > 0
            streams.append(s)
            enc_recons.append(r)
        dec_sid = c.open_video()
        for idx, s in enumerate(streams):
            kind = "i" if idx == 0 else "p"
            r = c.decode_frame(dec_sid, s, kind=kind)
            np.testing.assert_array_equal(enc_recons[idx], r)
        c.close_video(enc_sid)
        c.close_video(dec_sid)

        # --- error path: bad op reported, server keeps serving ---
        from dcvc_tpu.serving import ServerError

        with pytest.raises(ServerError):
            c._call({"op": "nope"})
        assert c.ping()["pad"] == 16

        c.shutdown()
    assert proc.wait(timeout=60) == 0


def test_serving_is_generation_agnostic(tmp_path):
    """The adapters normalize every generation to the DC-shaped protocol;
    a HEM I/P pair must serve video sessions unchanged (pad contract 64)."""
    proc, sock = _spawn_server(tmp_path, "--i_frame_model", "intra_hem",
                               "--p_frame_model", "dmc_hem")
    try:
        rng = np.random.default_rng(1)
        with CodecClient(sock, connect_timeout=300.0) as c:
            assert c.ping()["pad"] == 64
            frames = [(rng.random((40, 56, 3)) * 255).astype(np.uint8)
                      for _ in range(2)]
            sid = c.open_video()
            streams, recons = [], []
            for idx, f in enumerate(frames):
                s, r, _ = c.encode_frame(sid, f, kind="i" if idx == 0
                                         else "p", frame_idx=idx,
                                         want_recon=True)
                streams.append(s)
                recons.append(r)
            did = c.open_video()
            for idx, s in enumerate(streams):
                r = c.decode_frame(did, s, kind="i" if idx == 0 else "p")
                np.testing.assert_array_equal(recons[idx], r)
            c.shutdown()
        assert proc.wait(timeout=60) == 0
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.wait()

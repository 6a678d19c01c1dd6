"""VideoTestData (per-GOP test items) + raw RGB I/O (VERDICT items #4/#9).

Parity targets: DCVC-HEM/dataloader.py:110-215 (VideoTestData),
DCVC-DC/src/utils/video_reader.py:83-120 / video_writer.py:51-79 (RGB raw).
"""

import json
import os

import numpy as np
from PIL import Image

from dcvc_tpu.training.data import CodedIFrameData, VideoTestData
from dcvc_tpu.utils.video_io import RGBReader, RGBWriter


def _make_png_seq(root, name, frames=6, w=64, h=48):
    d = os.path.join(root, "seqs", name)
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(hash(name) % 2 ** 31)
    for i in range(1, frames + 1):
        arr = (rng.random((h, w, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(d, f"im{i:05d}.png"))


def _cfg(root, frames=6, gop=3):
    return {
        "root_path": str(root),
        "test_classes": {
            "B": {"test": 1, "base_path": "seqs", "src_type": "png",
                  "sequences": {
                      "seqA": {"width": 64, "height": 48, "frames": frames,
                               "gop": gop},
                      "seqB": {"width": 64, "height": 48, "frames": frames,
                               "gop": gop}}},
        },
    }


class TestVideoTestData:
    def test_gop_enumeration(self, tmp_path):
        _make_png_seq(tmp_path, "seqA")
        _make_png_seq(tmp_path, "seqB")
        ds = VideoTestData(_cfg(tmp_path))
        # 2 sequences x (6 frames / gop 3) = 4 items
        assert len(ds) == 4
        cls, name, clip, start = ds[0]
        assert cls == "B" and name == "seqA" and start == 0
        assert clip.shape == (3, 48, 64, 3)
        assert clip.dtype == np.float32
        _, _, _, start2 = ds[1]
        assert start2 == 3

    def test_first_gop_protocol(self, tmp_path):
        """first_gop=True = the fork's per-epoch validation protocol."""
        _make_png_seq(tmp_path, "seqA")
        _make_png_seq(tmp_path, "seqB")
        ds = VideoTestData(_cfg(tmp_path), first_gop=True)
        assert len(ds) == 2
        assert all(start == 0 for (_, _, _, start) in
                   (ds[i] for i in range(len(ds))))

    def test_frames_match_source(self, tmp_path):
        _make_png_seq(tmp_path, "seqA")
        _make_png_seq(tmp_path, "seqB")
        ds = VideoTestData(_cfg(tmp_path))
        _, _, clip, start = ds[1]  # seqA frames 3..5
        ref = np.asarray(Image.open(
            tmp_path / "seqs" / "seqA" / "im00004.png"),
            dtype=np.float32) / 255.0
        np.testing.assert_allclose(clip[0], ref)

    def test_coded_iframe_data(self, tmp_path):
        """BitstreamData(load_Iframe=True) equivalent: I-frame comes from
        the supplied intra coder, cached on disk; P-frames pristine."""
        _make_png_seq(tmp_path, "seqA")
        _make_png_seq(tmp_path, "seqB")
        calls = []

        def coder(frame):
            calls.append(1)
            return np.clip(frame + 0.125, 0, 1)  # fake codec artifact

        ds = CodedIFrameData(_cfg(tmp_path), coder, tag="q2",
                             cache_root=str(tmp_path / "cache"),
                             classes=("B",), first_gop=False)
        plain = VideoTestData(_cfg(tmp_path))
        _, name, clip, start = ds[0]
        _, _, ref_clip, _ = [plain[i] for i in range(len(plain))
                             if plain[i][1] == name][0]
        assert len(calls) == 1
        # I-frame differs by the coder artifact (8-bit rounded)
        np.testing.assert_allclose(
            clip[0], np.round(np.clip(ref_clip[0] + 0.125, 0, 1) * 255)
            / 255.0, atol=1 / 255)
        # P-frames untouched
        np.testing.assert_allclose(clip[1:], ref_clip[1:])
        # cache hit: no second coder call, bit-identical frame
        clip2 = ds[0][2]
        assert len(calls) == 1
        np.testing.assert_array_equal(clip, clip2)
        assert (tmp_path / "cache" / "q2" / name /
                f"frame_{start}.png").is_file()

    def test_batches_surface(self, tmp_path):
        _make_png_seq(tmp_path, "seqA")
        _make_png_seq(tmp_path, "seqB")
        ds = VideoTestData(_cfg(tmp_path), first_gop=True)
        batches = list(ds.batches(batch_size=4, steps=10))
        assert len(batches) == 2  # capped at the item count
        assert batches[0].shape == (1, 3, 48, 64, 3)

    def test_trainer_validates_on_test_data(self, tmp_path):
        """PFrameTrainer.validate consumes first-GOP test items (fork
        protocol, train_CANFVC_DMC.py:241-320)."""
        import jax
        import jax.numpy as jnp

        from dcvc_tpu.models.video_hem import DMCHem
        from dcvc_tpu.training.trainer import (PFrameTrainer, Stage,
                                               hem_adapter)

        _make_png_seq(tmp_path, "seqA", frames=3, w=64, h=64)
        _make_png_seq(tmp_path, "seqB", frames=3, w=64, h=64)
        cfg = _cfg(tmp_path, frames=3, gop=3)
        for s in cfg["test_classes"]["B"]["sequences"].values():
            s["height"] = 64
        ds = VideoTestData(cfg, first_gop=True)

        module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
        x = jnp.zeros((1, 64, 64, 3))
        dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
               "ref_mv_y": None}
        params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                             jnp.ones(()))
        trainer = PFrameTrainer(
            module, params, schedule=[Stage("s", 1, cascade_frames=1)],
            workdir=str(tmp_path / "wd"), apply_adapter=hem_adapter)
        val = trainer.validate(ds, batch_size=1, steps=2)
        assert np.isfinite(val)


class TestRgbRaw:
    def test_roundtrip_8bit(self, tmp_path):
        path = str(tmp_path / "clip.rgb")
        rng = np.random.default_rng(0)
        frames = rng.random((3, 24, 32, 3)).astype(np.float32)
        w = RGBWriter(path, 32, 24, bit_depth=8)
        for f in frames:
            w.write_one_frame(f)
        w.close()
        r = RGBReader(path, 32, 24, bit_depth=8)
        for f in frames:
            got = r.read_one_frame()
            np.testing.assert_allclose(got, np.rint(f * 255) / 255,
                                       atol=1e-7)
        assert r.read_one_frame() is None and r.eof
        r.close()

    def test_roundtrip_16bit(self, tmp_path):
        path = str(tmp_path / "clip16.rgb")
        rng = np.random.default_rng(1)
        frame = rng.random((16, 16, 3)).astype(np.float32)
        w = RGBWriter(path, 16, 16, bit_depth=16)
        w.write_one_frame(frame)
        w.close()
        # 16-bit quantization error bound: 1/(2^16-1)
        r = RGBReader(path, 16, 16, bit_depth=16)
        got = r.read_one_frame()
        np.testing.assert_allclose(got, frame, atol=1.0 / 65535 + 1e-7)
        r.close()

    def test_byte_format_matches_reference_layout(self, tmp_path):
        """Planar 3xHxW per frame, u8 — decodable by reshape(3, H, W)."""
        path = str(tmp_path / "layout.rgb")
        frame = np.zeros((2, 4, 3), np.float32)
        frame[..., 0] = 1.0  # R plane all ones
        w = RGBWriter(path, 4, 2, bit_depth=8)
        w.write_one_frame(frame)
        w.close()
        raw = np.fromfile(path, np.uint8).reshape(3, 2, 4)
        assert (raw[0] == 255).all() and (raw[1:] == 0).all()

    def test_runner_accepts_rgb_config(self, tmp_path):
        from dcvc_tpu.runner.video import load_dataset_config

        cfg = {"root_path": str(tmp_path),
               "test_classes": {"RGB": {
                   "test": 1, "base_path": ".", "src_type": "rgb",
                   "bit_depth": 10,
                   "sequences": {"s1": {"width": 8, "height": 8,
                                        "frames": 2}}}}}
        specs = load_dataset_config(cfg)
        assert specs[0].src_type == "rgb"
        assert specs[0].bit_depth == 10
        assert specs[0].base_path.endswith("s1.rgb")


def test_motion_clips_flow_is_exact_interior():
    """MotionClips ground-truth contract: f1(x) == f0(x + v(x)) away from
    borders, for layered (discontinuous) velocity fields."""
    from scipy import ndimage

    from dcvc_tpu.training.data import MotionClips

    d = MotionClips(crop=64, frames=3, max_v=4.0, pool=6, seed=1)
    clips, flows = next(d.batches_with_flow(2, 1))
    assert clips.shape == (2, 3, 64, 64, 3)
    assert flows.shape == (2, 64, 64, 2)
    # non-trivial motion somewhere in the pool (per-clip draws can be small)
    assert max(np.abs(v).max() for _, v in d._pool_items()) > 1.0
    ys, xs = np.mgrid[0:64, 0:64].astype(np.float32)
    for b in range(2):
        c, v = clips[b], flows[b]
        warped = np.stack(
            [ndimage.map_coordinates(c[0, ..., ch],
                                     [ys + v[..., 1], xs + v[..., 0]],
                                     order=1, mode="nearest")
             for ch in range(3)], -1)
        m = int(np.ceil(np.abs(v).max())) + 1
        err = np.abs(warped[m:-m, m:-m] - c[1][m:-m, m:-m]).max()
        assert err < 1e-5


def test_motion_clips_batches_deterministic_pool():
    from dcvc_tpu.training.data import MotionClips

    a = list(MotionClips(crop=32, pool=2, seed=7).batches(2, 2))
    b = list(MotionClips(crop=32, pool=2, seed=7).batches(2, 2))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)

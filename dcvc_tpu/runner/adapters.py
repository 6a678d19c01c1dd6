"""Per-generation runtime adapters for the GOP runner protocol.

The reference ships one test_video.py per codec generation, each driving its
own model signature: DC (q_in_ckpt/q_index/frame_idx, test_video.py:140-165),
HEM/CANF (continuous mv/y q_scales, DCVC-HEM/test_video.py), TCM (per-rate
checkpoints, bare (ref_frame, ref_feature) state, DCVC-TCM/test_video.py),
gen-1 (four substreams, ref_frame-only state, DCVC/test_video.py). Our single
CLI drives every generation through the DC-shaped protocol used by
runner/video.py:

    i.forward(x, q_in_ckpt, q_index)            -> {x_hat, bit}
    i.compress(x, q_in_ckpt, q_index)           -> {bit_stream}
    i.decompress(stream, h, w, q_in_ckpt, q_index) -> {x_hat}
    p.forward_one_frame(x, dpb, q_in_ckpt, q_index, frame_idx) -> {dpb, bit}
    p.compress(x, dpb, q_in_ckpt, q_index, frame_idx)          -> {bit_stream}
    p.decompress(dpb, stream, h, w, q_in_ckpt, q_index, frame_idx) -> {dpb}

q_index maps to a q_scale through the checkpoint anchors (q_in_ckpt=True,
reference get_q_scales_from_ckpt) or a 64-point log-interpolated fine table
(EVC interpolate_log semantics, EVC/src/utils/common.py). Generation-exact
bitstream headers (HEM ushort-q, gen-1 multi-substream) remain available in
utils/stream.py; the runner's container carries the q_index instead.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..models.intra_dc import build_fine_q_tables as fine_q_table
from ..ops.warp import get_padding_size
from ..utils.stream import pack_strings, unpack_strings

__all__ = ["adapt_i_runtime", "adapt_p_runtime", "fine_q_table"]


class _QTable:
    """q_index -> q_scale via ckpt anchors / 64-pt log-interp fine table.

    Built LAZILY from a params getter so a later `adapter.params = ...`
    (checkpoint load) invalidates the cached anchors."""

    def __init__(self, get_anchors):
        self._get = get_anchors
        self._anchors = None

    def invalidate(self):
        self._anchors = None

    @property
    def anchors(self):
        if self._anchors is None:
            self._anchors = np.asarray(self._get()).reshape(-1)
            self.fine = fine_q_table(self._anchors)
        return self._anchors

    def __call__(self, q_in_ckpt: bool, q_index: int) -> float:
        anchors = self.anchors
        return float(anchors[q_index] if q_in_ckpt else self.fine[q_index])


class _Adapter:
    _q_tables: tuple = ()

    def __init__(self, rt):
        self.rt = rt

    def update(self, force: bool = False):
        self.rt.update(force)

    @property
    def params(self):
        return self.rt.params

    @params.setter
    def params(self, value):
        self.rt.params = value
        for q in self._q_tables:
            q.invalidate()


class QScaleIntraAdapter(_Adapter):
    """EVC / HEM intra: single continuous q_scale argument."""

    def __init__(self, rt):
        super().__init__(rt)
        self._q = _QTable(lambda: self.rt.params["params"]["q_scale"])
        self._q_tables = (self._q,)

    def forward(self, x, q_in_ckpt, q_index):
        return self.rt.forward(x, jnp.asarray(self._q(q_in_ckpt, q_index)))

    def compress(self, x, q_in_ckpt, q_index):
        return self.rt.compress(x, jnp.asarray(self._q(q_in_ckpt, q_index)))

    def decompress(self, stream, height, width, q_in_ckpt, q_index):
        return self.rt.decompress(stream, height, width,
                                  jnp.asarray(self._q(q_in_ckpt, q_index)))


class ZooIntraAdapter(_Adapter):
    """CompressAI-zoo intra (TCM / gen-1 I-frames): per-rate models, no q;
    the (possibly several) substreams are packed into one payload."""

    def forward(self, x, q_in_ckpt, q_index):
        del q_in_ckpt, q_index
        return self.rt.forward(x)

    def compress(self, x, q_in_ckpt, q_index):
        del q_in_ckpt, q_index
        comp = self.rt.compress(x)
        return {"bit_stream": pack_strings(comp["strings"]),
                "x_hat": comp.get("x_hat")}

    def decompress(self, stream, height, width, q_in_ckpt, q_index):
        del q_in_ckpt, q_index
        strings = unpack_strings(stream)
        pl, pr, pt, pb = get_padding_size(height, width, 64)
        ds = 16 if self.rt.kind == "factorized" else 64
        shape_hw = ((height + pt + pb) // ds, (width + pl + pr) // ds)
        return self.rt.decompress(strings, shape_hw)


_HEM_DPB_KEYS = ("ref_frame", "ref_feature", "ref_y", "ref_mv_y")


class HemPFrameAdapter(_Adapter):
    """DMC (HEM) / CANFVC_DMC: separate mv/y q_scales, 4-key DPB."""

    def __init__(self, rt):
        super().__init__(rt)
        self._mv_q = _QTable(
            lambda: self.rt.params["params"]["mv_y_q_scale"])
        self._y_q = _QTable(lambda: self.rt.params["params"]["y_q_scale"])
        self._q_tables = (self._mv_q, self._y_q)

    @staticmethod
    def _dpb(dpb):
        return {k: dpb.get(k) for k in _HEM_DPB_KEYS}

    def forward_one_frame(self, x, dpb, q_in_ckpt, q_index, frame_idx):
        del frame_idx
        return self.rt.forward_one_frame(
            x, self._dpb(dpb), self._mv_q(q_in_ckpt, q_index),
            self._y_q(q_in_ckpt, q_index))

    def compress(self, x, dpb, q_in_ckpt, q_index, frame_idx):
        del frame_idx
        return self.rt.compress(x, self._dpb(dpb),
                                self._mv_q(q_in_ckpt, q_index),
                                self._y_q(q_in_ckpt, q_index))

    def decompress(self, dpb, stream, height, width, q_in_ckpt, q_index,
                   frame_idx):
        del frame_idx
        return self.rt.decompress(self._dpb(dpb), stream, height, width,
                                  self._mv_q(q_in_ckpt, q_index),
                                  self._y_q(q_in_ckpt, q_index))


class TcmPFrameAdapter(_Adapter):
    """DMC (TCM): per-rate checkpoints (q ignored), (frame, feature) state."""

    def forward_one_frame(self, x, dpb, q_in_ckpt, q_index, frame_idx):
        del q_in_ckpt, q_index, frame_idx
        out = self.rt.forward_one_frame(x, dpb["ref_frame"],
                                        dpb["ref_feature"])
        out["dpb"] = {"ref_frame": jnp.clip(out["recon_image"], 0.0, 1.0),
                      "ref_feature": out["feature"]}
        return out

    def compress(self, x, dpb, q_in_ckpt, q_index, frame_idx):
        del q_in_ckpt, q_index, frame_idx
        return self.rt.compress(x, dpb["ref_frame"], dpb["ref_feature"])

    def decompress(self, dpb, stream, height, width, q_in_ckpt, q_index,
                   frame_idx):
        del q_in_ckpt, q_index, frame_idx
        out = self.rt.decompress(dpb["ref_frame"], dpb["ref_feature"],
                                 stream, height, width)
        return {"dpb": {"ref_frame": out["x_hat"],
                        "ref_feature": out["feature"]}}


class Gen1PFrameAdapter(_Adapter):
    """DCVC_net (gen-1): ref_frame-only state; mv_z/mv_y/z/y substreams
    packed into the payload (DCVC/src/utils/stream_helper.py:127-163)."""

    def forward_one_frame(self, x, dpb, q_in_ckpt, q_index, frame_idx):
        del q_in_ckpt, q_index, frame_idx
        out = self.rt.forward(dpb["ref_frame"], x)
        out["dpb"] = {"ref_frame": out["recon_image"]}
        return out

    def compress(self, x, dpb, q_in_ckpt, q_index, frame_idx):
        del q_in_ckpt, q_index, frame_idx
        comp = self.rt.compress(dpb["ref_frame"], x)
        payload = pack_strings([comp["mv_z_string"], comp["mv_y_string"],
                                comp["z_string"], comp["y_string"]])
        return {"bit_stream": payload}

    def decompress(self, dpb, stream, height, width, q_in_ckpt, q_index,
                   frame_idx):
        del q_in_ckpt, q_index, frame_idx
        mv_z, mv_y, z, y = unpack_strings(stream)
        out = self.rt.decompress(dpb["ref_frame"], mv_y, mv_z, y, z,
                                 height, width)
        return {"dpb": {"ref_frame": out["recon_image"]}}


def pad_for_model(model: str) -> int:
    """Pad-to-multiple contract per generation: DC pads to 16, older
    generations to 64 (reference test_video.py per-repo padding). The
    single source of truth for the CLI and the serving layer — real-coding
    containers desync if the two disagree."""
    return 16 if model in ("intra_dc", "dmc_dc") else 64


def adapt_i_runtime(rt):
    from ..models.runtime import IntraDcRuntime, IntraZooRuntime

    if isinstance(rt, IntraDcRuntime):
        return rt
    if isinstance(rt, IntraZooRuntime):
        return ZooIntraAdapter(rt)
    return QScaleIntraAdapter(rt)


def adapt_p_runtime(rt):
    from ..models.runtime import (DcvcGen1Runtime, DmcRuntime,
                                  HemVideoRuntime, TcmVideoRuntime)

    if rt is None or isinstance(rt, DmcRuntime):
        return rt
    if isinstance(rt, HemVideoRuntime):
        return HemPFrameAdapter(rt)
    if isinstance(rt, TcmVideoRuntime):
        return TcmPFrameAdapter(rt)
    if isinstance(rt, DcvcGen1Runtime):
        return Gen1PFrameAdapter(rt)
    raise TypeError(f"no adapter for {type(rt).__name__}")

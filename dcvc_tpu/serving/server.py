"""Warm codec server: compile once, serve many encode/decode requests.

A persistent process owning one accelerator. It builds the requested
codec(s) (any registry model, same surface as tools/test_video.py), warms
the jit executables, then serves length-prefixed requests over a Unix
socket (serving/protocol.py). Containers on the wire are byte-identical to
the CLI's .bin files (utils/stream.pack_i/pack_p), so server streams and
tools/test_video.py / test_image.py streams interoperate.

Ops (header["op"]):
  ping                                    -> server/model info
  encode_image  {q_index,q_in_ckpt,height,width,[want_recon]}
                payload [rgb u8/f32 HWC]  -> {bpp}, payloads [container,
                                              (recon u8)]
  decode_image  payload [container]       -> {height,width}, payload [u8]
  open_video    {}                        -> {session}
  encode_frame  {session,kind:"i"|"p",frame_idx,q_index,q_in_ckpt,
                 height,width,[want_recon]} payload [rgb]
                                          -> {bpp}, payloads [container,
                                              (recon u8)]
  decode_frame  {session} payload [container(i|p as written)]
                kind is taken from the header the client supplies
                                          -> {height,width}, payload [u8]
  close_video   {session}                 -> {}
  shutdown      {}                        -> {} then exits the serve loop

Video sessions mirror runner/video.py's GOP recurrence exactly: the
encoder-side DPB is refreshed from a real decompress of the just-written
stream (so encoder and decoder DPBs stay bit-identical), ref_frame is
clamped like the reference (DCVC-DC/test_video.py decode path), frames are
padded to the generation's multiple and recons cropped back.
"""

from __future__ import annotations

import os
import socket
import traceback

import numpy as np

from .protocol import recv_msg, send_msg


def _pad_hwc(x: np.ndarray, mult: int):
    h, w = x.shape[:2]
    ph = -h % mult
    pw = -w % mult
    if ph or pw:
        x = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
    return x


class CodecServer:
    def __init__(self, i_frame_model: str = "evc_SS",
                 p_frame_model: str | None = None,
                 model_path_i: str | None = None,
                 model_path_p: str | None = None,
                 ec_thread: bool = False, stream_part: int = 1,
                 od_warp: str = "auto"):
        import jax.numpy as jnp

        from ..models.registry import build
        from ..runner.adapters import (adapt_i_runtime, adapt_p_runtime,
                                       pad_for_model)
        from ..utils.checkpoint import load_params

        self._jnp = jnp
        self.i_model = i_frame_model
        self.p_model = p_frame_model
        self.pad = pad_for_model(i_frame_model)
        if p_frame_model:
            if pad_for_model(p_frame_model) != self.pad:
                raise ValueError(
                    "I/P models must share a padding generation for real "
                    "coding (see tools/test_video.py)")

        _, _, i_rt = build(i_frame_model)
        if model_path_i:
            i_rt.params = load_params(model_path_i, i_rt.params,
                                      model=i_frame_model)
        i_rt.ec_thread, i_rt.stream_part = ec_thread, stream_part
        i_rt.update(force=True)
        self.i_rt = adapt_i_runtime(i_rt)

        self.p_rt = None
        if p_frame_model:
            p_kwargs = {}
            # serving drives the WRITE-STREAM path (compress/decompress),
            # so the coding warp defaults apply, not the forward defaults
            from ..ops.warp import default_coding_warp_modes

            od_d, mc_d, me_d = default_coding_warp_modes()
            if p_frame_model == "dmc_dc":
                p_kwargs["od_warp_mode"] = (od_d if od_warp == "auto"
                                            else od_warp)
                if me_d and me_d != "exact":
                    p_kwargs["me_warp_mode"] = me_d
            if p_frame_model in ("dmc_dc", "dmc_hem", "dmc_tcm",
                                 "dcvc_gen1"):
                if mc_d and mc_d != "exact":
                    p_kwargs["mc_warp_mode"] = mc_d
            _, _, p_rt = build(p_frame_model, **p_kwargs)
            if model_path_p:
                p_rt.params = load_params(model_path_p, p_rt.params,
                                          model=p_frame_model)
            p_rt.ec_thread, p_rt.stream_part = ec_thread, stream_part
            p_rt.update(force=True)
            self.p_rt = adapt_p_runtime(p_rt)

        self.sessions: dict[int, dict] = {}
        self._next_session = 1

    # -- image payload conversion ------------------------------------------

    def _to_float_hwc(self, payload: bytes, h: int, w: int, dtype: str):
        if dtype == "f32":
            x = np.frombuffer(payload, np.float32).reshape(h, w, 3).copy()
        else:
            x = (np.frombuffer(payload, np.uint8).reshape(h, w, 3)
                 .astype(np.float32) / 255.0)
        return x

    @staticmethod
    def _to_u8(x: np.ndarray) -> bytes:
        return (np.clip(x, 0.0, 1.0) * 255.0 + 0.5).astype(np.uint8).tobytes()

    def _device_in(self, x_hwc: np.ndarray):
        return self._jnp.asarray(_pad_hwc(x_hwc, self.pad))[None]

    # -- handlers ------------------------------------------------------------

    def warmup(self, height: int = 64, width: int = 64) -> None:
        """Pay the jit compiles up front (I and, if present, P paths)."""
        from ..utils.stream import pack_i, pack_p, unpack_i, unpack_p

        h = -(-height // self.pad) * self.pad
        w = -(-width // self.pad) * self.pad
        x = np.zeros((h, w, 3), np.float32)
        comp = self.i_rt.compress(self._device_in(x), True, 0)
        c = pack_i(h, w, True, 0, comp["bit_stream"])
        dec = self.i_rt.decompress(unpack_i(c)[4], h, w, True, 0)
        if self.p_rt is not None:
            x_hat = self._jnp.clip(dec["x_hat"], 0.0, 1.0)
            dpb = {"ref_frame": x_hat, "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            comp = self.p_rt.compress(self._device_in(x), dpb, True, 0, 1)
            c = pack_p(comp["bit_stream"], True, 0, 1)
            dec = self.p_rt.decompress(dpb, unpack_p(c)[3], h, w, True, 0, 1)
            # second structural variant: P-frame DPB carries features
            self.p_rt.compress(self._device_in(x), dec["dpb"], True, 0, 2)

    def handle(self, header: dict, payloads: list):
        from ..utils.stream import pack_i, pack_p, unpack_i, unpack_p

        jnp = self._jnp
        op = header.get("op")
        if op == "ping":
            return {"i_model": self.i_model, "p_model": self.p_model,
                    "pad": self.pad}, []

        if op == "encode_image":
            h, w = header["height"], header["width"]
            x = self._to_float_hwc(payloads[0], h, w,
                                   header.get("dtype", "u8"))
            q_in_ckpt = bool(header.get("q_in_ckpt", True))
            q_index = int(header.get("q_index", 0))
            comp = self.i_rt.compress(self._device_in(x), q_in_ckpt, q_index)
            container = pack_i(h, w, q_in_ckpt, q_index, comp["bit_stream"])
            out_payloads = [container]
            if header.get("want_recon"):
                dec = self.i_rt.decompress(comp["bit_stream"], h, w,
                                           q_in_ckpt, q_index)
                recon = np.asarray(dec["x_hat"][0])[:h, :w]
                out_payloads.append(self._to_u8(recon))
            return {"bpp": len(container) * 8 / (h * w)}, out_payloads

        if op == "decode_image":
            h, w, q_in_ckpt, q_index, stream = unpack_i(payloads[0])
            dec = self.i_rt.decompress(stream, h, w, q_in_ckpt, q_index)
            recon = np.asarray(dec["x_hat"][0])[:h, :w]
            return {"height": h, "width": w}, [self._to_u8(recon)]

        if op == "open_video":
            if self.p_rt is None:
                raise ValueError("server built without a p_frame_model")
            sid = self._next_session
            self._next_session += 1
            self.sessions[sid] = {"dpb": None}
            return {"session": sid}, []

        if op == "encode_frame":
            sess = self.sessions[header["session"]]
            h, w = header["height"], header["width"]
            kind = header.get("kind", "p")
            frame_idx = int(header.get("frame_idx", 0))
            q_in_ckpt = bool(header.get("q_in_ckpt", True))
            q_index = int(header.get("q_index", 0))
            x = self._device_in(self._to_float_hwc(
                payloads[0], h, w, header.get("dtype", "u8")))
            if kind == "i":
                comp = self.i_rt.compress(x, q_in_ckpt, q_index)
                container = pack_i(h, w, q_in_ckpt, q_index,
                                   comp["bit_stream"])
                dec = self.i_rt.decompress(comp["bit_stream"], h, w,
                                           q_in_ckpt, q_index)
                x_hat = jnp.clip(dec["x_hat"], 0.0, 1.0)
                sess["dpb"] = {"ref_frame": x_hat, "ref_feature": None,
                               "ref_mv_feature": None, "ref_y": None,
                               "ref_mv_y": None}
            else:
                comp = self.p_rt.compress(x, sess["dpb"], q_in_ckpt,
                                          q_index, frame_idx)
                container = pack_p(comp["bit_stream"], q_in_ckpt, q_index,
                                   frame_idx % 4)
                dec = self.p_rt.decompress(sess["dpb"], comp["bit_stream"],
                                           h, w, q_in_ckpt, q_index,
                                           frame_idx % 4)
                dpb = dict(dec["dpb"])
                dpb["ref_frame"] = jnp.clip(dpb["ref_frame"], 0.0, 1.0)
                sess["dpb"] = dpb
            out_payloads = [container]
            if header.get("want_recon"):
                recon = np.asarray(sess["dpb"]["ref_frame"][0])[:h, :w]
                out_payloads.append(self._to_u8(recon))
            return {"bpp": len(container) * 8 / (h * w)}, out_payloads

        if op == "decode_frame":
            sess = self.sessions[header["session"]]
            kind = header.get("kind", "p")
            if kind == "i":
                h, w, q_in_ckpt, q_index, stream = unpack_i(payloads[0])
                dec = self.i_rt.decompress(stream, h, w, q_in_ckpt, q_index)
                x_hat = jnp.clip(dec["x_hat"], 0.0, 1.0)
                sess["dpb"] = {"ref_frame": x_hat, "ref_feature": None,
                               "ref_mv_feature": None, "ref_y": None,
                               "ref_mv_y": None}
                sess["hw"] = (h, w)
            else:
                q_in_ckpt, q_index, fi, stream = unpack_p(payloads[0])
                h, w = sess["hw"]
                dec = self.p_rt.decompress(sess["dpb"], stream, h, w,
                                           q_in_ckpt, q_index, fi)
                dpb = dict(dec["dpb"])
                dpb["ref_frame"] = jnp.clip(dpb["ref_frame"], 0.0, 1.0)
                sess["dpb"] = dpb
            recon = np.asarray(sess["dpb"]["ref_frame"][0])[:h, :w]
            return {"height": h, "width": w}, [self._to_u8(recon)]

        if op == "close_video":
            self.sessions.pop(header["session"], None)
            return {}, []

        raise ValueError(f"unknown op {op!r}")

    # -- serve loop ------------------------------------------------------------

    def serve(self, socket_path: str) -> None:
        if os.path.exists(socket_path):
            os.unlink(socket_path)
        srv = socket.socket(socket.AF_UNIX, socket.SOCK_STREAM)
        srv.bind(socket_path)
        srv.listen(4)
        try:
            stop = False
            while not stop:
                conn, _ = srv.accept()
                with conn:
                    while True:
                        # a misbehaving/killed client must never take down
                        # the warm process (the whole point is the kept jit
                        # investment): any socket error drops THIS
                        # connection and returns to accept()
                        try:
                            msg = recv_msg(conn)
                        except (ConnectionError, OSError):
                            break
                        if msg is None:
                            break
                        header, payloads = msg
                        if header.get("op") == "shutdown":
                            try:
                                send_msg(conn, {"ok": True})
                            except OSError:
                                pass
                            stop = True
                            break
                        try:
                            resp, out = self.handle(header, payloads)
                            resp["ok"] = True
                            send_msg(conn, resp, out)
                        except (ConnectionError, BrokenPipeError):
                            break
                        except Exception as e:  # noqa: BLE001 — report to
                            # the client, keep serving
                            traceback.print_exc()
                            try:
                                send_msg(conn, {"ok": False,
                                                "error": repr(e)})
                            except OSError:
                                break
        finally:
            srv.close()
            if os.path.exists(socket_path):
                os.unlink(socket_path)

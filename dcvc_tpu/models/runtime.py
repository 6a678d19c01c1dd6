"""Codec runtimes: device (jit) compute + host rANS entropy coding.

This is the layer the reference spreads across CompressionModel.update /
compress / decompress (DCVC-DC/src/models/common_model.py:63-68,
image_model.py:198-252). TPU-first split: all CNN work runs in a handful of
jitted functions; only int16 symbol planes and scale-index planes cross the
host boundary; the serial rANS loop runs in native code between jitted steps.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..entropy.bit_estimator import (
    build_factorized_tables,
    decode_factorized,
    encode_factorized,
)
from ..entropy.coder import EntropyCoder
from ..entropy.gaussian import GaussianConditionalCoder
from ..ops.warp import get_downsampled_shape
from . import priors


def _build_indexes_i16(g: "GaussianConditionalCoder"):
    """Jittable log-scale bucketing emitting int16 (minimal readback bytes)."""

    def fn(scales):
        s = jnp.maximum(scales.astype(jnp.float32), 1e-5)
        idx = (jnp.log(s) - g.log_scale_min) / g.log_scale_step
        return jnp.clip(idx, 0, g.scale_level - 1).astype(jnp.int16)

    return fn


class _RuntimeBase:
    """Shared machinery: entropy coder + baked tables."""

    y_distribution = "gaussian"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        self.module = module
        self.params = params
        self.ec_thread = ec_thread
        self.stream_part = stream_part
        self.entropy_coder: EntropyCoder | None = None
        self.gaussian: GaussianConditionalCoder | None = None
        self._z_tables = {}

    def _bit_estimator_params(self, name: str):
        return {"params": self.params["params"][name]}

    def update(self, force: bool = False):
        from ..entropy.coder import AsyncEntropyCoder

        if self.entropy_coder is not None and not force:
            return
        # ec_thread: encode work runs on a background thread, overlapping the
        # device compute of subsequent frames (reference X5 / rans.cpp:174-263)
        self.entropy_coder = (AsyncEntropyCoder(self.stream_part)
                              if self.ec_thread
                              else EntropyCoder(False, self.stream_part))
        self.gaussian = GaussianConditionalCoder(distribution=self.y_distribution)
        self.gaussian.update(force=True)
        for name, channels in self._z_estimators():
            self._z_tables[name] = build_factorized_tables(
                self._bit_estimator_params(name), channels)

    def _z_estimators(self):
        raise NotImplementedError

    # host-side helpers -----------------------------------------------------

    def _encode_z(self, name, z_hat):
        encode_factorized(self.entropy_coder, np.asarray(z_hat),
                          self._z_tables[name])

    def _decode_z(self, name, shape_nhwc):
        return decode_factorized(self.entropy_coder, shape_nhwc,
                                 self._z_tables[name])

    def _encode_y_plane(self, y_q, indexes):
        self.gaussian.encode_with_indexes(self.entropy_coder,
                                          np.asarray(y_q), np.asarray(indexes))

    def _decode_y_plane(self, indexes) -> np.ndarray:
        return self.gaussian.decode_with_indexes(self.entropy_coder,
                                                 np.asarray(indexes))


class EvcCodecRuntime(_RuntimeBase):
    """Runtime for the EVC intra family (dual-part checkerboard prior).

    Parity: EVC/src/models/image_model.py:131-181 compress/decompress.
    """

    y_distribution = "gaussian"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        super().__init__(module, params, ec_thread, stream_part)
        m = module
        mt = type(module)

        self._fwd = jax.jit(
            lambda p, x, q: m.apply(p, x, q),
        )
        self._compress_dev = jax.jit(
            lambda p, x, q: m.apply(p, x, q, method=mt.compress_device))
        self._prior = jax.jit(
            lambda p, z: m.apply(p, z, method=mt.prior_params))
        self._scales1 = jax.jit(
            lambda p, qs, s, mu, h0, h1: m.apply(
                p, qs, s, mu, h0, h1, method=mt.dual_scales_step1))
        self._scales0 = jax.jit(
            lambda qs, s, mu: priors.dual_decode_scales(mu, s, qs, None, None,
                                                        None, 0))
        self._update0 = jax.jit(
            lambda yq, m0, m1: priors.dual_decode_update(
                yq, (m0, m1), yq.shape[1], yq.shape[2], 0, yq.dtype))
        self._update1 = jax.jit(
            lambda yq, m0, m1: priors.dual_decode_update(
                yq, (m0, m1), yq.shape[1], yq.shape[2], 1, yq.dtype))

        def _synth(p, h0, h1, q_step, q_scale):
            y_hat = jnp.concatenate([h0, h1], axis=-1) * jnp.maximum(q_step, 0.5)
            x_hat = m.apply(p, y_hat, q_scale, method=mt.synthesize)
            return jnp.clip(x_hat, 0.0, 1.0)

        self._synth = jax.jit(_synth)
        _g = GaussianConditionalCoder(distribution=self.y_distribution)
        self._indexes = jax.jit(_g.build_indexes)
        # f32 view of the bucket indexes: int16 readbacks hit a
        # pathological transfer path on remote platforms (round-1 model);
        # small ints are exact in f32 and decode_stream re-casts.
        self._indexes_f32 = jax.jit(
            lambda s: _g.build_indexes(s).astype(jnp.float32))

        def compress_packed(p, x, q):
            """One f32 readback for the whole encode: [z | symbol planes]
            (each int16 symbol pair-packs with its plane id's slot; the
            coding INDEXES are deliberately NOT computed here — see
            compress())."""
            out = m.apply(p, x, q, method=mt.compress_device)
            sym = jnp.concatenate(
                [jnp.round(jnp.clip(yq.astype(jnp.float32), -30000, 30000))
                 .astype(jnp.float32).reshape(-1)
                 for yq in out["y_q_planes"]])
            packed = jnp.concatenate(
                [out["z_hat"].astype(jnp.float32).reshape(-1), sym])
            # y_q_planes are returned UN-transferred purely so the host
            # can read their .shape metadata (no device->host copy)
            return {"x_hat": out["x_hat"], "z_hat": out["z_hat"],
                    "packed": packed, "plane_shapes": out["y_q_planes"]}

        self._compress_pack = jax.jit(compress_packed)

    def _z_estimators(self):
        return [("bit_estimator_z", self.module.N)]

    def forward(self, x, q_scale):
        return self._fwd(self.params, jnp.asarray(x), jnp.asarray(q_scale))

    def compress(self, x, q_scale):
        """Encode path. The coding INDEXES are recomputed with the SAME
        jitted stage executables the decoder runs (same input avals: z and
        plane-0 symbols re-uploaded as f32, exactly as decompress receives
        them from host rANS). bf16 conv outputs are not bitwise-
        reproducible across differently-fused XLA programs, so indexes
        derived inside the monolithic compress program can disagree with
        the decoder's at scale-bucket boundaries -> rANS desync (measured
        at 1080p bf16 before this fix: 6447/783k plane-1 index mismatches,
        3.7M corrupted recon values). Sharing the executables makes
        encoder and decoder buckets equal by construction."""
        x = jnp.asarray(x)
        out = self._compress_pack(self.params, x, jnp.asarray(q_scale))
        packed = np.asarray(out["packed"])
        zh, zw = get_downsampled_shape(x.shape[1], x.shape[2], 64)
        n_z = zh * zw * self.module.N
        sizes = [int(np.prod(p.shape)) for p in out["plane_shapes"]]
        shapes = [tuple(p.shape) for p in out["plane_shapes"]]
        z_np = packed[:n_z].reshape(1, zh, zw, self.module.N)
        sym = packed[n_z:]

        return {
            "bit_stream": self._encode_decoder_aligned(z_np, sym, sizes,
                                                       shapes),
            "x_hat": out["x_hat"],
        }

    def _encode_decoder_aligned(self, z_np, sym, sizes, shapes) -> bytes:
        """Write the stream with indexes from the decoder's own
        executables (see compress() docstring): z and plane-0 symbols are
        re-uploaded exactly as decompress receives them from host rANS."""
        z_hat = jnp.asarray(z_np)
        q_step, scales, means = self._prior(self.params, z_hat)
        scales_r0, (m0, m1) = self._scales0(q_step, scales, means)
        idx0 = np.asarray(self._indexes_f32(scales_r0))
        y_q_r0 = jnp.asarray(sym[:sizes[0]].reshape(shapes[0]))
        h0, h1 = self._update0(y_q_r0, m0, m1)
        scales_r1, _ = self._scales1(self.params, q_step, scales, means,
                                     h0, h1)
        idx1 = np.asarray(self._indexes_f32(scales_r1))

        self.entropy_coder.reset()
        self._encode_z("bit_estimator_z", z_np)
        for s, i in ((sym[:sizes[0]], idx0), (sym[sizes[0]:], idx1)):
            self.gaussian.encode_with_indexes(self.entropy_coder, s, i)
        self.entropy_coder.flush()
        return self.entropy_coder.get_encoded_stream()

    def decompress(self, bit_stream, height, width, q_scale):
        q_scale = jnp.asarray(q_scale)
        self.entropy_coder.set_stream(bit_stream)
        zh, zw = get_downsampled_shape(height, width, 64)
        z_hat = jnp.asarray(self._decode_z("bit_estimator_z",
                                           (1, zh, zw, self.module.N)))
        q_step, scales, means = self._prior(self.params, z_hat)

        scales_r0, (m0, m1) = self._scales0(q_step, scales, means)
        y_q_r0 = jnp.asarray(
            self._decode_y_plane(self._indexes_f32(scales_r0))
            .reshape(scales_r0.shape))
        h0, h1 = self._update0(y_q_r0, m0, m1)

        scales_r1, (m0, m1) = self._scales1(self.params, q_step, scales, means,
                                            h0, h1)
        y_q_r1 = jnp.asarray(
            self._decode_y_plane(self._indexes_f32(scales_r1))
            .reshape(scales_r1.shape))
        d0, d1 = self._update1(y_q_r1, m0, m1)

        x_hat = self._synth(self.params, h0 + d0, h1 + d1, q_step, q_scale)
        return {"x_hat": x_hat}


class IntraZooRuntime:
    """Runtime for the CompressAI-style intra zoo (models/intra_zoo.py).

    Parity: DCVC/src/models/priors.py compress/decompress per model family —
    separate strings per latent, z via EntropyBottleneck, y via
    GaussianConditional (one-shot or wavefront-AR for mbt2018/cheng2020).
    """

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        del ec_thread
        self.module = module
        self.params = params
        self.kind = {
            "FactorizedPrior": "factorized",
            "ScaleHyperprior": "scale",
            "MeanScaleHyperprior": "meanscale",
            "JointAutoregressiveHierarchicalPriors": "joint",
            "Cheng2020Anchor": "joint",
        }[type(module).__name__]
        self.stream_part = 1 if self.kind == "joint" else stream_part
        self.entropy_coder = None
        self.gaussian = None
        self._eb_tables = {}
        self._ar_nets = None

        m, mt = module, type(module)
        self._fwd = jax.jit(lambda p, x: m.apply(p, x))
        self._analyze = jax.jit(lambda p, x: m.apply(p, x, method=mt.analyze))
        self._synth = jax.jit(lambda p, y: m.apply(p, y, method=mt.synthesize))
        if self.kind == "scale":
            self._scales = jax.jit(
                lambda p, z: m.apply(p, z, method=mt.scales_from_z))
        elif self.kind == "meanscale":
            self._params_z = jax.jit(
                lambda p, z: m.apply(p, z, method=mt.params_from_z))
        elif self.kind == "joint":
            self._hyper = jax.jit(
                lambda p, z: m.apply(p, z, method=mt.hyper_from_z))

    def _eb_medians(self):
        mt = type(self.module)
        return np.asarray(self.module.apply(
            self.params,
            method=lambda m: m.entropy_bottleneck.medians()))

    def update(self, force: bool = False):
        from ..entropy.bottleneck import EntropyBottleneck, build_bottleneck_tables
        from ..entropy.gaussian_conditional import GaussianConditional

        if self.entropy_coder is not None and not force:
            return
        self.entropy_coder = EntropyCoder(False, self.stream_part)
        self.gaussian = GaussianConditional()
        self.gaussian.update(force=True)
        eb_params = {"params": self.params["params"]["entropy_bottleneck"]}
        channels = (self.module.M if self.kind == "factorized"
                    else self.module.N)
        eb_module = EntropyBottleneck(channels)
        self._eb_tables["eb"] = build_bottleneck_tables(eb_params, eb_module)
        self._medians = self._eb_medians()
        if self.kind == "joint":
            p = self.params["params"]
            from .ar_coding import ArNets

            ar = p["context_prediction"]
            ep = p["entropy_parameters"]
            ep_ws = [np.asarray(ep[f"c{i}"]["kernel"]).reshape(
                ep[f"c{i}"]["kernel"].shape[-2], -1) for i in (1, 2, 3)]
            ep_bs = [np.asarray(ep[f"c{i}"]["bias"]) for i in (1, 2, 3)]
            self._ar_nets = ArNets(np.asarray(ar["kernel"]),
                                   np.asarray(ar["bias"]), ep_ws, ep_bs,
                                   means_first=False)

    def forward(self, x):
        return self._fwd(self.params, jnp.asarray(x))

    def _flush(self):
        self.entropy_coder.flush()
        return self.entropy_coder.get_encoded_stream()

    def compress(self, x):
        from ..entropy.bottleneck import bottleneck_encode
        from .ar_coding import ar_encode

        x = jnp.asarray(x)
        coder, table = self.entropy_coder, self._eb_tables["eb"]
        if self.kind == "factorized":
            y = self._analyze(self.params, x)
            coder.reset()
            bottleneck_encode(coder, y, self._medians, table)
            y_string = self._flush()
            medians = self._medians.reshape(1, 1, 1, -1)
            y_hat = jnp.asarray(np.round(np.asarray(y) - medians) + medians,
                                jnp.float32)
            return {"strings": [y_string], "shape": y.shape[1:3],
                    "x_hat": self._synth(self.params, y_hat)}

        y, z = self._analyze(self.params, x)
        coder.reset()
        bottleneck_encode(coder, z, self._medians, table)
        z_string = self._flush()
        medians = self._medians.reshape(1, 1, 1, -1)
        z_hat = jnp.asarray(np.round(np.asarray(z) - medians) + medians,
                            jnp.float32)

        coder.reset()
        if self.kind == "scale":
            scales = self._scales(self.params, z_hat)
            self.gaussian.encode(coder, np.asarray(y), np.asarray(scales))
            y_hat = jnp.round(y)
        elif self.kind == "meanscale":
            scales, means = self._params_z(self.params, z_hat)
            self.gaussian.encode(coder, np.asarray(y), np.asarray(scales),
                                 np.asarray(means))
            y_hat = jnp.round(y - means) + means
        else:  # joint (wavefront AR)
            hyper = self._hyper(self.params, z_hat)
            y_hat = ar_encode(np.asarray(y[0]), np.asarray(hyper[0]),
                              self._ar_nets, self.gaussian, coder)
            y_hat = jnp.asarray(y_hat[None], jnp.float32)
        y_string = self._flush()
        return {"strings": [y_string, z_string], "shape": z.shape[1:3],
                "x_hat": self._synth(self.params, y_hat)}

    def decompress(self, strings, shape_hw):
        from ..entropy.bottleneck import bottleneck_decode
        from .ar_coding import ar_decode

        coder, table = self.entropy_coder, self._eb_tables["eb"]
        if self.kind == "factorized":
            coder.set_stream(strings[0])
            C = self.module.M
            y_hat = bottleneck_decode(coder, (1, *shape_hw, C), self._medians,
                                      table)
            return {"x_hat": self._synth(self.params,
                                         jnp.asarray(y_hat, jnp.float32))}

        y_string, z_string = strings
        coder.set_stream(z_string)
        z_hat = bottleneck_decode(coder, (1, *shape_hw, self.module.N),
                                  self._medians, table)
        z_hat = jnp.asarray(z_hat, jnp.float32)

        coder.set_stream(y_string)
        if self.kind == "scale":
            scales = np.asarray(self._scales(self.params, z_hat))
            y_hat = self.gaussian.decode(coder, scales)
        elif self.kind == "meanscale":
            scales, means = self._params_z(self.params, z_hat)
            y_hat = self.gaussian.decode(coder, np.asarray(scales),
                                         np.asarray(means))
        else:
            hyper = self._hyper(self.params, z_hat)
            yh, yw = shape_hw[0] * 4, shape_hw[1] * 4
            y_hat = ar_decode((yh, yw, self.module.M), np.asarray(hyper[0]),
                              self._ar_nets, self.gaussian, coder)[None]
        return {"x_hat": self._synth(self.params,
                                     jnp.asarray(y_hat, jnp.float32))}


class DcvcGen1Runtime(_RuntimeBase):
    """Runtime for DCVCNet (gen-1): hyper + pixel-AR entropy models.

    Parity: DCVC/src/models/DCVC_net.py:234-420 compress/decompress with four
    separate substreams (mv_z, mv_y, z, y). The AR loops run as host
    wavefronts (ar_coding.py); AR substreams use stream_part=1 by
    construction (symbol order must match between encode and decode).
    """

    y_distribution = "laplace"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        # AR interleaving requires a single-part stream
        super().__init__(module, params, ec_thread, stream_part=1)
        m, mt = module, type(module)
        self._fwd = jax.jit(lambda p, ref, x: m.apply(p, ref, x))
        self._enc_analysis = jax.jit(
            lambda p, ref, x: m.apply(p, ref, x, method=mt.encode_analysis))
        self._motion_ctx = jax.jit(
            lambda p, ref, mvy: m.apply(p, ref, mvy,
                                        method=mt.motion_and_context))
        self._res_analysis = jax.jit(
            lambda p, x, ctx: m.apply(p, x, ctx, method=mt.residual_analysis))
        self._mv_prior_dec = jax.jit(
            lambda p, z: m.apply(p, z, method=mt.mv_prior_decoder))
        self._prior_dec = jax.jit(
            lambda p, z: m.apply(p, z, method=mt.prior_decoder))
        self._synth = jax.jit(
            lambda p, yh, ctx: m.apply(p, yh, ctx, method=mt.synthesis))
        self._ar_nets = None

    def _z_estimators(self):
        return [("bit_estimator_z", self.module.channel_N),
                ("bit_estimator_z_mv", self.module.channel_N)]

    def update(self, force: bool = False):
        super().update(force)
        from .video_dcvc import extract_ar_nets

        if self._ar_nets is None or force:
            self._ar_nets = {w: extract_ar_nets(self.params, w)
                             for w in ("mv", "y")}

    def forward(self, referframe, input_image):
        return self._fwd(self.params, jnp.asarray(referframe),
                         jnp.asarray(input_image))

    def _flush_stream(self) -> bytes:
        self.entropy_coder.flush()
        return self.entropy_coder.get_encoded_stream()

    def compress(self, referframe, input_image):
        from .ar_coding import ar_encode

        ref = jnp.asarray(referframe)
        x = jnp.asarray(input_image)
        mv_feature, mv_z_hat, params_mv = self._enc_analysis(self.params, ref, x)

        self.entropy_coder.reset()
        self._encode_z("bit_estimator_z_mv", mv_z_hat)
        mv_z_string = self._flush_stream()

        self.entropy_coder.reset()
        mv_y_hat = ar_encode(np.asarray(mv_feature[0]),
                             np.asarray(params_mv[0]), self._ar_nets["mv"],
                             self.gaussian, self.entropy_coder)
        mv_y_string = self._flush_stream()

        mv_y_hat = jnp.asarray(mv_y_hat[None], jnp.float32)
        context, temporal = self._motion_ctx(self.params, ref, mv_y_hat)
        y, z_hat, hyper = self._res_analysis(self.params, x, context)

        self.entropy_coder.reset()
        self._encode_z("bit_estimator_z", z_hat)
        z_string = self._flush_stream()

        self.entropy_coder.reset()
        y_hyper = np.concatenate([np.asarray(temporal[0]), np.asarray(hyper[0])],
                                 axis=-1)
        y_hat = ar_encode(np.asarray(y[0]), y_hyper, self._ar_nets["y"],
                          self.gaussian, self.entropy_coder)
        y_string = self._flush_stream()

        recon = self._synth(self.params, jnp.asarray(y_hat[None], jnp.float32),
                            context)
        return {
            "mv_z_string": mv_z_string, "mv_y_string": mv_y_string,
            "z_string": z_string, "y_string": y_string,
            "recon_image": recon,
        }

    def decompress(self, referframe, mv_y_string, mv_z_string, y_string,
                   z_string, height, width):
        from .ar_coding import ar_decode

        ref = jnp.asarray(referframe)
        zh, zw = get_downsampled_shape(height, width, 64)
        # frames are padded to 64 for this generation, so the y latent is
        # the hyper decoder's 4x upsample of z — NOT ceil(w/16), which
        # disagrees when width is not a multiple of 64
        yh, yw = zh * 4, zw * 4
        N = self.module.channel_N

        self.entropy_coder.set_stream(mv_z_string)
        mv_z_hat = jnp.asarray(self._decode_z("bit_estimator_z_mv",
                                              (1, zh, zw, N)))
        params_mv = self._mv_prior_dec(self.params, mv_z_hat)

        self.entropy_coder.set_stream(mv_y_string)
        mv_y_hat = ar_decode((yh, yw, self.module.channel_mv),
                             np.asarray(params_mv[0]), self._ar_nets["mv"],
                             self.gaussian, self.entropy_coder)
        mv_y_hat = jnp.asarray(mv_y_hat[None], jnp.float32)

        context, temporal = self._motion_ctx(self.params, ref, mv_y_hat)

        self.entropy_coder.set_stream(z_string)
        z_hat = jnp.asarray(self._decode_z("bit_estimator_z", (1, zh, zw, N)))
        hyper = self._prior_dec(self.params, z_hat)

        self.entropy_coder.set_stream(y_string)
        y_hyper = np.concatenate([np.asarray(temporal[0]), np.asarray(hyper[0])],
                                 axis=-1)
        y_hat = ar_decode((yh, yw, self.module.channel_M), y_hyper,
                          self._ar_nets["y"], self.gaussian, self.entropy_coder)
        recon = self._synth(self.params, jnp.asarray(y_hat[None], jnp.float32),
                            context)
        return {"recon_image": recon}


class TcmVideoRuntime(_RuntimeBase):
    """Runtime for DMCTcm (no spatial AR — single-shot latent coding).

    Parity: DCVC-TCM/src/models/video_net_dmc.py:321-415 compress/decompress.
    Stream order: z_mv, mv_y, z, y (:321-341).
    """

    y_distribution = "laplace"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        super().__init__(module, params, ec_thread, stream_part)
        m, mt = module, type(module)
        self._fwd = jax.jit(lambda p, x, rf, rfe: m.apply(p, x, rf, rfe))
        self._compress_dev = jax.jit(
            lambda p, x, rf, rfe: m.apply(p, x, rf, rfe,
                                          method=mt.compress_device))
        self._mv_params = jax.jit(
            lambda p, z: m.apply(p, z, method=mt.decode_mv_params))
        self._motion_stage = jax.jit(
            lambda p, mvy, rf, rfe, z: m.apply(p, mvy, rf, rfe, z,
                                               method=mt.decode_motion_stage))
        self._recon_stage = jax.jit(
            lambda p, yh, ctx: m.apply(p, yh, ctx, method=mt.decode_recon_stage))
        _g = GaussianConditionalCoder(distribution=self.y_distribution)
        self._indexes = jax.jit(_g.build_indexes)
        self._indexes_f32 = jax.jit(
            lambda s: _g.build_indexes(s).astype(jnp.float32))

        def compress_packed(p, x, rf, rfe):
            # ONE f32 readback: [mv_z | z | sym/idx pairs] (DmcRuntime
            # packing; was 6 separate transfers incl. int16 indexes)
            out = m.apply(p, x, rf, rfe, method=mt.compress_device)
            planes = [out["mv_y_q"], out["y_q"]]
            scales = [out["mv_scales"], out["scales"]]
            sym = jnp.concatenate(
                [jnp.round(jnp.clip(q.astype(jnp.float32), -30000, 30000))
                 .astype(jnp.int32).reshape(-1) for q in planes])
            idx = jnp.concatenate(
                [_g.build_indexes(s).astype(jnp.int32).reshape(-1)
                 for s in scales])
            u = ((sym & 0xFFFF).astype(jnp.uint32)
                 | ((idx & 0xFFFF).astype(jnp.uint32) << 16))
            packed = jnp.concatenate(
                [out["mv_z_hat"].astype(jnp.float32).reshape(-1),
                 out["z_hat"].astype(jnp.float32).reshape(-1),
                 jax.lax.bitcast_convert_type(u, jnp.float32)])
            return {"x_hat": out["x_hat"], "feature": out["feature"],
                    "packed": packed, "plane_shapes": planes}

        self._compress_pack = jax.jit(compress_packed)
        # decoder-aligned coding indexes (DmcRuntime counterpart): opt-in
        # bf16 fusion-divergence guard — replays the DECODE executables
        # with the known symbols so encoder and decoder scale buckets are
        # equal by construction (costs ~3 extra dispatches per frame)
        self.aligned_enc = os.environ.get("DCVC_TPU_ALIGNED_ENC") == "1"

    def _z_estimators(self):
        return [("bit_estimator_z", self.module.channel_N),
                ("bit_estimator_z_mv", self.module.channel_N)]

    def forward_one_frame(self, x, ref_frame, ref_feature):
        return self._fwd(self.params, jnp.asarray(x), ref_frame, ref_feature)

    def _aligned_indexes(self, mv_z_np, z_np, sym, shapes, ref_frame,
                         ref_feature):
        """Decoder-identical coding indexes for the mv_y and y planes:
        replays decompress()'s executables with the KNOWN symbols in place
        of host rANS (same avals: z planes and symbols enter as f32 host
        uploads exactly as the decoder receives them). See
        DmcRuntime._aligned_indexes for the bf16 rationale."""
        mv_z_hat = jnp.asarray(mv_z_np)
        mv_scales, mv_means = self._mv_params(self.params, mv_z_hat)
        idx_mv = np.asarray(self._indexes_f32(mv_scales))
        n_mv = int(np.prod(shapes[0]))
        mv_y_q = jnp.asarray(sym[:n_mv].astype(np.float32)
                             .reshape(shapes[0]))
        mv_y_hat = mv_y_q + mv_means
        scales, _, _ = self._motion_stage(self.params, mv_y_hat, ref_frame,
                                          ref_feature, jnp.asarray(z_np))
        idx_y = np.asarray(self._indexes_f32(scales))
        return np.concatenate([idx_mv.reshape(-1), idx_y.reshape(-1)])

    def compress(self, x, ref_frame, ref_feature):
        x = jnp.asarray(x)
        out = self._compress_pack(self.params, x, ref_frame, ref_feature)
        packed = np.asarray(out["packed"])
        zh, zw = get_downsampled_shape(x.shape[1], x.shape[2], 64)
        N = self.module.channel_N
        n_z = zh * zw * N
        sizes = [int(np.prod(p.shape)) for p in out["plane_shapes"]]
        mv_z = packed[:n_z].reshape(1, zh, zw, N)
        z = packed[n_z:2 * n_z].reshape(1, zh, zw, N)
        bits = np.ascontiguousarray(packed[2 * n_z:]).view(np.uint32)
        sym = (bits & 0xFFFF).astype(np.uint16).view(np.int16)
        idx = (bits >> 16).astype(np.uint16).view(np.int16)
        if self.aligned_enc:
            shapes = [tuple(p.shape) for p in out["plane_shapes"]]
            idx = self._aligned_indexes(mv_z, z, sym, shapes, ref_frame,
                                        ref_feature).astype(np.int16)
        self.entropy_coder.reset()
        # stream order: z_mv, mv_y, z, y (:321-341)
        self._encode_z("bit_estimator_z_mv", mv_z)
        self.gaussian.encode_with_indexes(
            self.entropy_coder, sym[:sizes[0]], idx[:sizes[0]])
        self._encode_z("bit_estimator_z", z)
        self.gaussian.encode_with_indexes(
            self.entropy_coder, sym[sizes[0]:], idx[sizes[0]:])
        self.entropy_coder.flush()
        return {"bit_stream": self.entropy_coder.get_encoded_stream(),
                "x_hat": out["x_hat"], "feature": out["feature"]}

    def decompress(self, ref_frame, ref_feature, string, height, width):
        self.entropy_coder.set_stream(string)
        zh, zw = get_downsampled_shape(height, width, 64)
        N = self.module.channel_N
        mv_z_hat = jnp.asarray(self._decode_z("bit_estimator_z_mv",
                                              (1, zh, zw, N)))
        mv_scales, mv_means = self._mv_params(self.params, mv_z_hat)
        mv_y_q = jnp.asarray(
            self._decode_y_plane(self._indexes_f32(mv_scales))
            .reshape(mv_scales.shape))
        mv_y_hat = mv_y_q + mv_means

        z_hat = jnp.asarray(self._decode_z("bit_estimator_z", (1, zh, zw, N)))
        scales, means, contexts = self._motion_stage(self.params, mv_y_hat,
                                                     ref_frame, ref_feature,
                                                     z_hat)
        y_q = jnp.asarray(self._decode_y_plane(self._indexes_f32(scales))
                          .reshape(scales.shape))
        x_hat, feature = self._recon_stage(self.params, y_q + means, contexts)
        return {"x_hat": x_hat, "feature": feature}


class HemVideoRuntime(_RuntimeBase):
    """Runtime for DMCHem (dual-part checkerboard priors on both latents).

    Parity: DCVC-HEM/src/models/video_model.py:263-375 compress/decompress.
    Stream order: z_mv, mv_y w0, mv_y w1, z, y w0, y w1 (:306-313).
    """

    y_distribution = "laplace"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        super().__init__(module, params, ec_thread, stream_part)
        m, mt = module, type(module)

        self._fwd = jax.jit(
            lambda p, x, dpb, mvq, yq: m.apply(p, x, dpb, mvq, yq))
        self._compress_dev = jax.jit(
            lambda p, x, dpb, mvq, yq: m.apply(p, x, dpb, mvq, yq,
                                               method=mt.compress_device))
        self._mv_prior = jax.jit(
            lambda p, z, refmv, yh, yw: m.apply(p, z, refmv, yh, yw,
                                                method=mt.decode_mv_prior),
            static_argnums=(3, 4))
        self._scales0 = jax.jit(
            lambda qs, s, mu: priors.dual_decode_scales(mu, s, qs, None, None,
                                                        None, 0))
        self._mv_scales1 = jax.jit(
            lambda p, qs, s, mu, h0, h1: m.apply(
                p, qs, s, mu, h0, h1, method=mt.mv_dual_scales_step1))
        self._y_scales1 = jax.jit(
            lambda p, qs, s, mu, h0, h1: m.apply(
                p, qs, s, mu, h0, h1, method=mt.y_dual_scales_step1))
        self._update = {
            step: jax.jit(lambda yq, m0, m1, _s=step: priors.dual_decode_update(
                yq, (m0, m1), yq.shape[1], yq.shape[2], _s, yq.dtype))
            for step in (0, 1)}
        self._finalize = jax.jit(
            lambda qs, h0, h1: jnp.concatenate([h0, h1], axis=-1)
            * jnp.maximum(qs, 0.5))
        self._motion_stage = jax.jit(
            lambda p, mvy, mvq, dpb, z, yh, yw: m.apply(
                p, mvy, mvq, dpb, z, yh, yw, method=mt.decode_motion_stage),
            static_argnums=(5, 6))
        self._recon_stage = jax.jit(
            lambda p, yhat, yq, ctx: m.apply(p, yhat, yq, ctx,
                                             method=mt.decode_recon_stage))
        _g = GaussianConditionalCoder(distribution=self.y_distribution)
        self._indexes = jax.jit(_g.build_indexes)
        self._indexes_f32 = jax.jit(
            lambda s: _g.build_indexes(s).astype(jnp.float32))

        def compress_packed(p, x, dpb, mvq, yq):
            # ONE f32 readback: [mv_z | z | sym/idx pairs] (DmcRuntime
            # packing; the previous path made 10 separate transfers —
            # 2 z planes + 4x(y_q, int16 idx) pairs — per frame)
            out = m.apply(p, x, dpb, mvq, yq, method=mt.compress_device)
            planes = (list(out["mv_y_q_planes"]) + list(out["y_q_planes"]))
            scales = (list(out["mv_scales_planes"])
                      + list(out["scales_planes"]))
            sym = jnp.concatenate(
                [jnp.round(jnp.clip(q.astype(jnp.float32), -30000, 30000))
                 .astype(jnp.int32).reshape(-1) for q in planes])
            idx = jnp.concatenate(
                [_g.build_indexes(s).astype(jnp.int32).reshape(-1)
                 for s in scales])
            u = ((sym & 0xFFFF).astype(jnp.uint32)
                 | ((idx & 0xFFFF).astype(jnp.uint32) << 16))
            packed = jnp.concatenate(
                [out["mv_z_hat"].astype(jnp.float32).reshape(-1),
                 out["z_hat"].astype(jnp.float32).reshape(-1),
                 jax.lax.bitcast_convert_type(u, jnp.float32)])
            return {"dpb": out["dpb"], "packed": packed,
                    "plane_shapes": planes}

        self._compress_pack = jax.jit(compress_packed)
        # decoder-aligned coding indexes (DmcRuntime counterpart): opt-in
        # bf16 fusion-divergence guard (~6 extra dispatches per frame)
        self.aligned_enc = os.environ.get("DCVC_TPU_ALIGNED_ENC") == "1"

    def _z_estimators(self):
        return [("bit_estimator_z", self.module.channel_N),
                ("bit_estimator_z_mv", self.module.channel_N)]

    def forward_one_frame(self, x, dpb, mv_y_q_scale, y_q_scale):
        return self._fwd(self.params, jnp.asarray(x), dpb,
                         jnp.asarray(mv_y_q_scale, jnp.float32),
                         jnp.asarray(y_q_scale, jnp.float32))

    def _dual_decode(self, qsm, scales1_fn, sym_source=None):
        """``sym_source(idx_r)`` supplies each checkerboard part's symbol
        plane — host rANS decode by default; the aligned ENCODE path
        feeds known symbols while recording the decoder-identical
        indexes (see _aligned_indexes)."""
        if sym_source is None:
            sym_source = lambda idx_r: jnp.asarray(  # noqa: E731
                self._decode_y_plane(idx_r).reshape(idx_r.shape))
        q_step, scales, means = qsm
        scales_r0, (m0, m1) = self._scales0(q_step, scales, means)
        y_q_r0 = sym_source(self._indexes_f32(scales_r0))
        h0, h1 = self._update[0](y_q_r0, m0, m1)
        scales_r1, (m0, m1) = scales1_fn(self.params, q_step, scales, means,
                                         h0, h1)
        y_q_r1 = sym_source(self._indexes_f32(scales_r1))
        d0, d1 = self._update[1](y_q_r1, m0, m1)
        return self._finalize(q_step, h0 + d0, h1 + d1)

    def _aligned_indexes(self, mv_z_np, z_np, sym, dpb, mv_q, yh, yw):
        """Decoder-identical coding indexes for the 4 checkerboard parts
        (mv w0, mv w1, y w0, y w1 — the stream's plane order): replays
        decompress()'s executables with the KNOWN symbols in place of
        host rANS. See DmcRuntime._aligned_indexes for the bf16
        rationale."""
        recorded = []
        offset = [0]

        def sym_source(idx_r):
            idx_np = np.asarray(idx_r)
            recorded.append(idx_np)
            plane = sym[offset[0]:offset[0] + idx_np.size]
            offset[0] += idx_np.size
            return jnp.asarray(plane.astype(np.float32)
                               .reshape(idx_np.shape))

        mv_qsm = self._mv_prior(self.params, jnp.asarray(mv_z_np),
                                dpb["ref_mv_y"], yh, yw)
        mv_y_hat = self._dual_decode(mv_qsm, self._mv_scales1, sym_source)
        y_qsm, _, _ = self._motion_stage(self.params, mv_y_hat, mv_q, dpb,
                                         jnp.asarray(z_np), yh, yw)
        self._dual_decode(y_qsm, self._y_scales1, sym_source)
        return np.concatenate([r.reshape(-1) for r in recorded])

    def compress(self, x, dpb, mv_y_q_scale, y_q_scale):
        x = jnp.asarray(x)
        out = self._compress_pack(self.params, x, dpb,
                                  jnp.asarray(mv_y_q_scale, jnp.float32),
                                  jnp.asarray(y_q_scale, jnp.float32))
        packed = np.asarray(out["packed"])
        zh, zw = get_downsampled_shape(x.shape[1], x.shape[2], 64)
        N = self.module.channel_N
        n_z = zh * zw * N
        sizes = [int(np.prod(p.shape)) for p in out["plane_shapes"]]
        mv_z = packed[:n_z].reshape(1, zh, zw, N)
        z = packed[n_z:2 * n_z].reshape(1, zh, zw, N)
        bits = np.ascontiguousarray(packed[2 * n_z:]).view(np.uint32)
        sym = (bits & 0xFFFF).astype(np.uint16).view(np.int16)
        idx = (bits >> 16).astype(np.uint16).view(np.int16)
        if self.aligned_enc:
            idx = self._aligned_indexes(
                mv_z, z, sym, dpb, jnp.asarray(mv_y_q_scale, jnp.float32),
                zh * 4, zw * 4).astype(np.int16)
        starts = np.concatenate([[0], np.cumsum(sizes)])
        self.entropy_coder.reset()
        # stream order: z_mv, mv w0, mv w1, z, y w0, y w1 (:306-313)
        self._encode_z("bit_estimator_z_mv", mv_z)
        for i in (0, 1):
            self.gaussian.encode_with_indexes(
                self.entropy_coder, sym[starts[i]:starts[i + 1]],
                idx[starts[i]:starts[i + 1]])
        self._encode_z("bit_estimator_z", z)
        for i in (2, 3):
            self.gaussian.encode_with_indexes(
                self.entropy_coder, sym[starts[i]:starts[i + 1]],
                idx[starts[i]:starts[i + 1]])
        self.entropy_coder.flush()
        return {"dpb": out["dpb"],
                "bit_stream": self.entropy_coder.get_encoded_stream()}

    def decompress(self, dpb, string, height, width, mv_y_q_scale, y_q_scale):
        mv_q = jnp.asarray(mv_y_q_scale, jnp.float32)
        y_q = jnp.asarray(y_q_scale, jnp.float32)
        self.entropy_coder.set_stream(string)
        zh, zw = get_downsampled_shape(height, width, 64)
        yh, yw = zh * 4, zw * 4  # pad-to-64 contract (see gen-1 note)
        N = self.module.channel_N

        mv_z_hat = jnp.asarray(self._decode_z("bit_estimator_z_mv",
                                              (1, zh, zw, N)))
        mv_qsm = self._mv_prior(self.params, mv_z_hat, dpb["ref_mv_y"], yh, yw)
        mv_y_hat = self._dual_decode(mv_qsm, self._mv_scales1)

        z_hat = jnp.asarray(self._decode_z("bit_estimator_z", (1, zh, zw, N)))
        y_qsm, contexts, mv_y_hat_scaled = self._motion_stage(
            self.params, mv_y_hat, mv_q, dpb, z_hat, yh, yw)
        y_hat = self._dual_decode(y_qsm, self._y_scales1)
        x_hat, feature, y_hat_scaled = self._recon_stage(self.params, y_hat,
                                                         y_q, contexts)
        return {"dpb": {
            "ref_frame": x_hat,
            "ref_feature": feature,
            "ref_y": y_hat_scaled,
            "ref_mv_y": mv_y_hat_scaled,
        }}


class DmcRuntime(_RuntimeBase):
    """Runtime for DMC (DCVC-DC P-frame codec, dual four-part priors).

    Parity: DCVC-DC/src/models/video_model.py:425-557 compress / decompress /
    encode_decode. Encode order: z_mv, z, mv_y w0..3, y w0..3 (:455-466).
    """

    y_distribution = "laplace"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        super().__init__(module, params, ec_thread, stream_part)
        m, mt = module, type(module)

        _g = GaussianConditionalCoder(distribution=self.y_distribution)
        idx16 = _build_indexes_i16(_g)

        # frame_idx is TRACED (int32), so one executable serves all four
        # adaptor phases — a static frame_idx compiles 4 variants and
        # program-swaps between them (seconds per swap on remote TPU).
        self._fwd = jax.jit(
            lambda p, x, dpb, qs, fi: m.apply(p, x, dpb, qs, fi))

        def compress_packed(p, x, dpb, qs, fi):
            out = m.apply(p, x, dpb, qs, fi, method=mt.compress_device)
            planes = (list(out["mv_y_q_planes"]) + list(out["y_q_planes"]))
            scales = (list(out["mv_scales_planes"]) + list(out["scales_planes"]))
            # EVERYTHING the host needs in ONE flat f32 vector: a single
            # full-array f32 readback is the only reliably-fast host
            # transfer on remote-tunnel platforms (scalars, slices, int16
            # and multi-array reads all hit pathological paths). Symbols
            # and bucket indexes are int16-range integers, so each
            # (symbol, index) pair rides ONE f32's raw bits (low/high
            # half-words, lax.bitcast) — halving the dominant readback
            # (12.6 -> 6.6 MB at 1080p). Bit patterns that alias NaN/Inf
            # f32s transfer exactly (probed across the full int16 x int16
            # domain on the tunnel platform, round 5).
            segs = [out["mv_z_hat"].astype(jnp.float32).reshape(-1),
                    out["z_hat"].astype(jnp.float32).reshape(-1)]
            sym = jnp.concatenate(
                [jnp.round(jnp.clip(q.astype(jnp.float32), -30000, 30000))
                 .astype(jnp.int32).reshape(-1) for q in planes])
            idx = jnp.concatenate(
                [idx16(s).astype(jnp.int32).reshape(-1) for s in scales])
            u = ((sym & 0xFFFF).astype(jnp.uint32)
                 | ((idx & 0xFFFF).astype(jnp.uint32) << 16))
            segs.append(jax.lax.bitcast_convert_type(u, jnp.float32))
            return {"dpb": out["dpb"], "packed": jnp.concatenate(segs)}

        self._compress_dev = jax.jit(compress_packed)
        self._mv_prior = jax.jit(
            lambda p, z, refmv, yh, yw: m.apply(p, z, refmv, yh, yw,
                                                method=mt.decode_mv_prior),
            static_argnums=(3, 4))

        def scales_step_idx(p, pr, sofar, step, which):
            scales_r, means_parts = m.apply(p, pr, sofar, step, which,
                                            method=mt.decode_scales_step)
            # f32 output: the only reliably-fast readback path (see compress)
            return idx16(scales_r).astype(jnp.float32), tuple(means_parts)

        self._scales_step = jax.jit(scales_step_idx, static_argnums=(3, 4))
        self._update_step = jax.jit(
            lambda pr, sofar, yq, mp, step: priors.four_part_decode_update(
                pr, sofar, yq.astype(pr.dtype), mp, step),
            static_argnums=(4,))

        def update_scales_step(p, pr, sofar, yq, mp, step, which):
            # FUSED: scatter step's decoded symbols AND compute step+1's
            # scales in one executable — halves the serial host<->device
            # roundtrips of the four-part decode (8 -> 5 per plane), the
            # dominant write-stream decode cost on remote-dispatch
            # platforms (PLAN round-3: per-roundtrip latency, not device
            # work, bounds the tunnel decode path). ``step`` is TRACED
            # (round 5): a static step forked 3 executables per plane (6
            # live programs), and live-executable count itself degrades
            # every tunnel roundtrip (out/r3_diag_pattern*.log) — a
            # lax.switch over the three step branches keeps ONE program
            # per plane at the cost of compiling all three spatial-prior
            # convs into it.
            def mk(s):
                def branch(_):
                    sofar2 = priors.four_part_decode_update(
                        pr, sofar, yq.astype(pr.dtype), mp, s)
                    scales_r, means_parts = m.apply(
                        p, pr, sofar2, s + 1, which,
                        method=mt.decode_scales_step)
                    return (sofar2, idx16(scales_r).astype(jnp.float32),
                            tuple(means_parts))
                return branch

            return jax.lax.switch(step, [mk(0), mk(1), mk(2)], ())

        self._update_scales_step = jax.jit(update_scales_step,
                                           static_argnums=(6,))
        self._motion_stage = jax.jit(
            lambda p, mvpr, sofar, mvqd, dpb, z, fi, yh, yw: m.apply(
                p, mvpr, sofar, mvqd, dpb, z, fi, yh, yw,
                method=mt.decode_motion_stage),
            static_argnums=(7, 8))
        self._recon_stage = jax.jit(
            lambda p, pr, sofar, ctx, yqd: m.apply(
                p, pr, sofar, ctx, yqd, method=mt.decode_recon_stage))

        # ---- round-5 decode fusions (VERDICT r4 #3): collapse the decode
        # path's 13 dispatches to 9. The 8 symbol readbacks are the
        # serial floor (part k's symbols gate part k+1's scales), but every
        # dispatch BETWEEN two readbacks can ride one executable: on
        # remote-dispatch platforms each extra program dispatch costs
        # ~0.1-0.3 s of tunnel queueing, independent of device work.
        from .video_dc import G_CH as _G_CH

        def mv_prior_scales0(p, mv_z_hat, ref_mv_y, yh, yw):
            """z-upload -> mv prior decode -> step-0 scales, one dispatch
            (was: _mv_prior + _scales_step)."""
            mv_params = m.apply(p, mv_z_hat, ref_mv_y, yh, yw,
                                method=mt.decode_mv_prior)
            B, H, W = mv_params.shape[:3]
            so_far = jnp.zeros((B, H, W, 64), mv_params.dtype)
            scales_r, means_parts = m.apply(p, mv_params, so_far, 0, "mv",
                                            method=mt.decode_scales_step)
            return (mv_params, idx16(scales_r).astype(jnp.float32),
                    tuple(means_parts))

        self._mv_prior_scales0 = jax.jit(mv_prior_scales0,
                                         static_argnums=(3, 4))

        def motion_scales0(p, mv_params, mv_sofar, yq3, mp3, mvqd, dpb, z,
                           fi, yh, yw):
            """mv-plane final scatter (step 3) + motion stage + y-branch
            step-0 scales, one dispatch (was: _update_step +
            _motion_stage + _scales_step)."""
            mv_sofar2 = priors.four_part_decode_update(
                mv_params, mv_sofar, yq3.astype(mv_params.dtype), mp3, 3)
            y_params, contexts, mv_y_hat, mv_feature = m.apply(
                p, mv_params, mv_sofar2, mvqd, dpb, z, fi, yh, yw,
                method=mt.decode_motion_stage)
            B, H, W = y_params.shape[:3]
            so_far = jnp.zeros((B, H, W, _G_CH["16x"]), y_params.dtype)
            scales_r, means_parts = m.apply(p, y_params, so_far, 0, "y",
                                            method=mt.decode_scales_step)
            return (y_params, contexts, mv_y_hat, mv_feature,
                    idx16(scales_r).astype(jnp.float32), tuple(means_parts))

        self._motion_scales0 = jax.jit(motion_scales0, static_argnums=(9, 10))

        def recon_final(p, y_params, y_sofar, yq3, mp3, ctx, yqd):
            """y-plane final scatter (step 3) + reconstruction, one dispatch
            (was: _update_step + _recon_stage)."""
            y_sofar2 = priors.four_part_decode_update(
                y_params, y_sofar, yq3.astype(y_params.dtype), mp3, 3)
            return m.apply(p, y_params, y_sofar2, ctx, yqd,
                           method=mt.decode_recon_stage)

        self._recon_final = jax.jit(recon_final)

        from .video_dc import get_dmc_q_tables
        self.fine_q = get_dmc_q_tables(params)
        # host copies of the anchor q_scale params (reading device params
        # per-frame would add a tunnel readback to every call)
        self._q_anchor = {
            n: np.asarray(params["params"][n]).reshape(-1)
            for n in ("mv_y_q_scale_enc", "mv_y_q_scale_dec",
                      "y_q_scale_enc", "y_q_scale_dec")}
        # device-resident constants: per-frame device_put uploads of tiny
        # scalars interleave badly with big-program dispatch on remote
        # tunnels, so cache them once
        self._fi_dev = [jnp.asarray(i, jnp.int32) for i in range(4)]
        self._step_dev = [jnp.asarray(i, jnp.int32) for i in range(3)]
        self._qs_cache: dict = {}
        # decoder-aligned coding indexes (see _aligned_indexes): opt-in —
        # DMC measured desync-free with the monolithic encode at 1080p
        # bf16 (check_tpu_roundtrip), so the ~8 extra per-frame dispatches
        # stay off by default; the conformance tool guards the property.
        self.aligned_enc = os.environ.get("DCVC_TPU_ALIGNED_ENC") == "1"

    def _z_estimators(self):
        from .video_dc import G_CH
        return [("bit_estimator_z", G_CH["16x"]), ("bit_estimator_z_mv", 64)]

    def get_q_for_inference(self, q_in_ckpt: bool, q_index: int) -> dict:
        key = (q_in_ckpt, q_index)
        if key in self._qs_cache:
            return self._qs_cache[key]
        names = {"mv_enc": "mv_y_q_scale_enc", "mv_dec": "mv_y_q_scale_dec",
                 "y_enc": "y_q_scale_enc", "y_dec": "y_q_scale_dec"}
        out = {}
        for k, n in names.items():
            if q_in_ckpt:
                out[k] = jnp.asarray(self._q_anchor[n][q_index], jnp.float32)
            else:
                out[k] = jnp.asarray(self.fine_q[n][q_index], jnp.float32)
        self._qs_cache[key] = out
        return out

    def forward_one_frame(self, x, dpb, q_in_ckpt=False, q_index=0, frame_idx=0):
        qs = self.get_q_for_inference(q_in_ckpt, q_index)
        return self._fwd(self.params, jnp.asarray(x), dpb, qs,
                         self._fi_dev[frame_idx % 4])

    def compress(self, x, dpb, q_in_ckpt: bool, q_index: int, frame_idx: int):
        qs = self.get_q_for_inference(q_in_ckpt, q_index)
        x = jnp.asarray(x)
        out = self._compress_dev(self.params, x, dpb, qs,
                                 self._fi_dev[frame_idx % 4])
        packed = np.asarray(out["packed"])
        yh, yw = x.shape[1] // 16, x.shape[2] // 16
        zh, zw = get_downsampled_shape(x.shape[1], x.shape[2], 64)
        from .video_dc import G_CH
        n_mv_z, n_z = zh * zw * 64, zh * zw * G_CH["16x"]
        sizes = [yh * yw * (64 // 4)] * 4 + [yh * yw * (G_CH["16x"] // 4)] * 4
        mv_z = packed[:n_mv_z].reshape(1, zh, zw, 64)
        z = packed[n_mv_z:n_mv_z + n_z].reshape(1, zh, zw, G_CH["16x"])
        bits = np.ascontiguousarray(packed[n_mv_z + n_z:]).view(np.uint32)
        sym = (bits & 0xFFFF).astype(np.uint16).view(np.int16)
        idx = (bits >> 16).astype(np.uint16).view(np.int16)
        if self.aligned_enc:
            idx = self._aligned_indexes(mv_z, z, sym, dpb, qs,
                                        frame_idx, yh, yw).astype(np.int16)
        self.entropy_coder.reset()
        self._encode_z("bit_estimator_z_mv", mv_z)
        self._encode_z("bit_estimator_z", z)
        start = 0
        for n in sizes:
            self.gaussian.encode_with_indexes(
                self.entropy_coder, sym[start:start + n], idx[start:start + n])
            start += n
        self.entropy_coder.flush()
        return {
            "dpb": out["dpb"],
            "bit_stream": self.entropy_coder.get_encoded_stream(),
        }

    def _host_decode(self, idx_r):
        idx_np = np.asarray(idx_r)
        return jnp.asarray(
            self.gaussian.decode_with_indexes(self.entropy_coder, idx_np)
            .astype(np.float32))

    def _decode_four_part(self, params, channels: int, which: str):
        """Standalone four-part decode (diagnostics / legacy callers);
        decompress() uses the fused-boundary variant below."""
        so_far, y_q_r, means_parts = self._decode_four_part_partial(
            params, channels, which, None)
        return self._update_step(params, so_far, y_q_r, means_parts, 3)

    def _decode_four_part_partial(self, params, channels: int, which: str,
                                  first, sym_source=None):
        """Symbol decode for steps 0-3 WITHOUT the final scatter: returns
        (so_far through step 2, step-3 symbols, step-3 means) so the final
        scatter fuses into the next stage's executable. ``first`` is the
        (idx, means) pair for step 0 when a fused upstream program already
        produced it; None computes it here. ``sym_source(idx_r)`` supplies
        each step's symbol plane — host rANS decode by default; the
        aligned ENCODE path (see compress) feeds known symbols while
        recording the decoder-identical indexes."""
        if sym_source is None:
            sym_source = self._host_decode
        B, yh, yw = params.shape[0], params.shape[1], params.shape[2]
        so_far = jnp.zeros((B, yh, yw, channels), params.dtype)
        if first is None:
            idx_r, means_parts = self._scales_step(self.params, params,
                                                   so_far, 0, which)
        else:
            idx_r, means_parts = first
        y_q_r = sym_source(idx_r)
        for step in range(1, 4):
            so_far, idx_r, means_parts = self._update_scales_step(
                self.params, params, so_far, y_q_r, tuple(means_parts),
                self._step_dev[step - 1], which)
            y_q_r = sym_source(idx_r)
        return so_far, y_q_r, tuple(means_parts)

    def _aligned_indexes(self, mv_z_np, z_np, sym, dpb, qs,
                         frame_idx, yh, yw):
        """Decoder-identical coding indexes for all 8 four-part planes:
        replays the decompress() executables with the KNOWN symbols in
        place of host rANS (same avals — z planes and symbols enter as
        f32 host uploads exactly as the decoder receives them). bf16 conv
        outputs are not bitwise-reproducible across differently-fused XLA
        programs, so indexes computed inside the monolithic compress
        program are not GUARANTEED to match the decoder's (measured
        in-spec for DMC at 1080p bf16 — zero desync-class values,
        tools/check_tpu_roundtrip.py — but guaranteed only by this path).
        Opt in with DCVC_TPU_ALIGNED_ENC=1; costs the decode-side stage
        chain (~8 extra dispatches) per frame."""
        recorded = []
        offset = [0]

        def sym_source(idx_r):
            recorded.append(np.asarray(idx_r))
            n = recorded[-1].size
            plane = sym[offset[0]:offset[0] + n]
            offset[0] += n
            # f32 upload: the decoder's symbols arrive as f32 host arrays;
            # identical avals keep the executables identical
            return jnp.asarray(plane.reshape(recorded[-1].shape)
                               .astype(np.float32))

        mv_z_hat = jnp.asarray(mv_z_np)
        z_hat = jnp.asarray(z_np)
        mv_params, idx0, means0 = self._mv_prior_scales0(
            self.params, mv_z_hat, dpb["ref_mv_y"], yh, yw)
        mv_sofar, mv_yq3, mv_mp3 = self._decode_four_part_partial(
            mv_params, 64, "mv", (idx0, means0), sym_source)
        from .video_dc import G_CH
        (y_params, contexts, mv_y_hat, mv_feature, yidx0,
         ymeans0) = self._motion_scales0(
            self.params, mv_params, mv_sofar, mv_yq3, mv_mp3,
            qs["mv_dec"], dpb, z_hat, self._fi_dev[frame_idx % 4], yh, yw)
        self._decode_four_part_partial(y_params, G_CH["16x"], "y",
                                       (yidx0, ymeans0), sym_source)
        return np.concatenate([r.reshape(-1) for r in recorded])

    def decompress(self, dpb, string, height, width, q_in_ckpt: bool,
                   q_index: int, frame_idx: int):
        from .video_dc import G_CH

        qs = self.get_q_for_inference(q_in_ckpt, q_index)
        self.entropy_coder.set_stream(string)
        zh, zw = get_downsampled_shape(height, width, 64)
        yh, yw = get_downsampled_shape(height, width, 16)
        mv_z_hat = jnp.asarray(self._decode_z("bit_estimator_z_mv",
                                              (1, zh, zw, 64)))
        z_hat = jnp.asarray(self._decode_z("bit_estimator_z",
                                           (1, zh, zw, G_CH["16x"])))

        # fused-boundary decode: 9 dispatches instead of 13 (see __init__)
        mv_params, idx0, means0 = self._mv_prior_scales0(
            self.params, mv_z_hat, dpb["ref_mv_y"], yh, yw)
        mv_sofar, mv_yq3, mv_mp3 = self._decode_four_part_partial(
            mv_params, 64, "mv", (idx0, means0))
        (y_params, contexts, mv_y_hat, mv_feature, yidx0,
         ymeans0) = self._motion_scales0(
            self.params, mv_params, mv_sofar, mv_yq3, mv_mp3,
            qs["mv_dec"], dpb, z_hat, self._fi_dev[frame_idx % 4], yh, yw)
        y_sofar, y_yq3, y_mp3 = self._decode_four_part_partial(
            y_params, G_CH["16x"], "y", (yidx0, ymeans0))
        x_hat, feature, y_hat = self._recon_final(
            self.params, y_params, y_sofar, y_yq3, y_mp3, contexts,
            qs["y_dec"])
        return {
            "dpb": {
                "ref_frame": x_hat,
                "ref_feature": feature,
                "ref_mv_feature": mv_feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }


class ScalableEvcRuntime(EvcCodecRuntime):
    """Scale_EVC: RD-cost encoder selection at encode time
    (EVC/src/models/scalable_encoder_model.py:143-160). The chosen encoder
    id is picked from the multi-encoder forward, then the stream is coded
    with that encoder (decoder is encoder-agnostic)."""

    def __init__(self, module, params, ec_thread=False, stream_part=1,
                 rate_idx: int = 0):
        super().__init__(module, params, ec_thread, stream_part)
        m, mt = module, type(module)
        self.rate_idx = rate_idx
        self._fwd_all = jax.jit(lambda p, x, q: m.apply(p, x, q, None))
        self._compress_dev = jax.jit(
            lambda p, x, q, eid: m.apply(p, x, q, eid,
                                         method=mt.compress_device),
            static_argnums=(3,))

    def forward(self, x, q_scale):
        """Multi-encoder forward + RD argmin (the reference's no-stream path)."""
        from .evc_scalable import choose_encoder_id

        out = self._fwd_all(self.params, jnp.asarray(x), jnp.asarray(q_scale))
        cid = choose_encoder_id(out["mse"], out["bpp"], self.rate_idx)
        return {"x_hat": out["x_hat"][cid:cid + 1],
                "bit": out["bit"][cid], "bpp": out["bpp"][cid:cid + 1],
                "enc_id": cid}

    def compress(self, x, q_scale):
        from .evc_scalable import choose_encoder_id

        out = self._fwd_all(self.params, jnp.asarray(x), jnp.asarray(q_scale))
        cid = choose_encoder_id(out["mse"], out["bpp"], self.rate_idx)
        dev = self._compress_dev(self.params, jnp.asarray(x),
                                 jnp.asarray(q_scale), cid)
        # decoder-aligned indexes (see EvcCodecRuntime.compress): the
        # decoder is encoder-agnostic, so its index computation must be
        # reproduced exactly regardless of the chosen encoder
        z_np = np.asarray(dev["z_hat"], np.float32)
        shapes = [tuple(p.shape) for p in dev["y_q_planes"]]
        sizes = [int(np.prod(s)) for s in shapes]
        from ..entropy.coder import _np_i16_symbols
        sym = np.concatenate(
            [_np_i16_symbols(np.asarray(p)).astype(np.float32)
             for p in dev["y_q_planes"]])
        return {"bit_stream": self._encode_decoder_aligned(z_np, sym,
                                                           sizes, shapes),
                "x_hat": dev["x_hat"], "enc_id": cid}


class IntraDcRuntime(_RuntimeBase):
    """Runtime for IntraNoAR (DCVC-DC generation, four-part prior).

    Parity: DCVC-DC/src/models/image_model.py:169-252 encode_decode /
    compress / decompress with q_in_ckpt / q_index (0..63 fine table).
    """

    y_distribution = "gaussian"

    def __init__(self, module, params, ec_thread=False, stream_part=1):
        super().__init__(module, params, ec_thread, stream_part)
        m, mt = module, type(module)

        _g = GaussianConditionalCoder(distribution=self.y_distribution)
        idx16 = _build_indexes_i16(_g)

        self._fwd = jax.jit(lambda p, x, qe, qd: m.apply(p, x, qe, qd))

        def compress_packed(p, x, qe, qd):
            # ONE f32 readback: [z | sym/idx pairs] — the previous three
            # separate int16 transfers each rode the pathological
            # transfer path (round-1 model); packing mirrors DmcRuntime.
            out = m.apply(p, x, qe, qd, method=mt.compress_device)
            sym = jnp.concatenate(
                [jnp.round(jnp.clip(q.astype(jnp.float32), -30000, 30000))
                 .astype(jnp.int32).reshape(-1) for q in out["y_q_planes"]])
            idx = jnp.concatenate([idx16(s).astype(jnp.int32).reshape(-1)
                                   for s in out["scales_planes"]])
            u = ((sym & 0xFFFF).astype(jnp.uint32)
                 | ((idx & 0xFFFF).astype(jnp.uint32) << 16))
            packed = jnp.concatenate(
                [out["z_hat"].astype(jnp.float32).reshape(-1),
                 jax.lax.bitcast_convert_type(u, jnp.float32)])
            return {"x_hat": out["x_hat"], "packed": packed}

        self._compress_dev = jax.jit(compress_packed)
        self._prior = jax.jit(
            lambda p, z, yh, yw: m.apply(p, z, yh, yw, method=mt.decode_prior),
            static_argnums=(2, 3))

        def scales_step_idx(p, pr, sofar, step):
            scales_r, means_parts = m.apply(p, pr, sofar, step,
                                            method=mt.decode_scales_step)
            return idx16(scales_r).astype(jnp.float32), tuple(means_parts)

        self._scales_step = jax.jit(scales_step_idx, static_argnums=(3,))
        self._update_step = jax.jit(
            lambda pr, sofar, yq, mp, step: priors.four_part_decode_update(
                pr, sofar, yq.astype(pr.dtype), mp, step),
            static_argnums=(4,))

        def update_scales_step(p, pr, sofar, yq, mp, step):
            # fused scatter + next-step scales: 8 -> 5 serial roundtrips
            # per decode; traced step via lax.switch keeps ONE live
            # executable instead of 3 (see DmcRuntime counterpart)
            def mk(s):
                def branch(_):
                    sofar2 = priors.four_part_decode_update(
                        pr, sofar, yq.astype(pr.dtype), mp, s)
                    scales_r, means_parts = m.apply(
                        p, pr, sofar2, s + 1, method=mt.decode_scales_step)
                    return (sofar2, idx16(scales_r).astype(jnp.float32),
                            tuple(means_parts))
                return branch

            return jax.lax.switch(step, [mk(0), mk(1), mk(2)], ())

        self._update_scales_step = jax.jit(update_scales_step)
        self._synth = jax.jit(
            lambda p, pr, sofar, qd: m.apply(p, pr, sofar, qd,
                                             method=mt.decode_synthesis))

        # round-5 decode fusions (DmcRuntime counterpart): z-upload +
        # hyper prior + step-0 scales in one dispatch; step-3 scatter +
        # synthesis in one dispatch. 7 dispatches -> 5 per image.
        def prior_scales0(p, z_hat, yh, yw):
            pr = m.apply(p, z_hat, yh, yw, method=mt.decode_prior)
            so_far = jnp.zeros((pr.shape[0], pr.shape[1], pr.shape[2],
                                m.N), pr.dtype)
            scales_r, means_parts = m.apply(p, pr, so_far, 0,
                                            method=mt.decode_scales_step)
            return pr, idx16(scales_r).astype(jnp.float32), tuple(means_parts)

        self._prior_scales0 = jax.jit(prior_scales0, static_argnums=(2, 3))

        def synth_final(p, pr, sofar, yq3, mp3, qd):
            sofar2 = priors.four_part_decode_update(
                pr, sofar, yq3.astype(pr.dtype), mp3, 3)
            return m.apply(p, pr, sofar2, qd, method=mt.decode_synthesis)

        self._synth_final = jax.jit(synth_final)

        self._step_dev = [jnp.asarray(i, jnp.int32) for i in range(3)]
        # fine q tables are derived from the anchor q_scale params at load
        from .intra_dc import build_fine_q_tables
        p = params["params"]
        self._q_anchor = {n: np.asarray(p[n]).reshape(-1)
                          for n in ("q_scale_enc", "q_scale_dec")}
        self.q_scale_enc_fine = build_fine_q_tables(np.asarray(p["q_scale_enc"]))
        self.q_scale_dec_fine = build_fine_q_tables(np.asarray(p["q_scale_dec"]))

    def _z_estimators(self):
        return [("bit_estimator_z", self.module.N)]

    def get_q_for_inference(self, q_in_ckpt: bool, q_index: int):
        if q_in_ckpt:
            qe = self._q_anchor["q_scale_enc"][q_index]
            qd = self._q_anchor["q_scale_dec"][q_index]
        else:
            qe = self.q_scale_enc_fine[q_index]
            qd = self.q_scale_dec_fine[q_index]
        return jnp.asarray(qe, jnp.float32), jnp.asarray(qd, jnp.float32)

    def forward(self, x, q_in_ckpt: bool = False, q_index: int = 0):
        qe, qd = self.get_q_for_inference(q_in_ckpt, q_index)
        return self._fwd(self.params, jnp.asarray(x), qe, qd)

    def compress(self, x, q_in_ckpt: bool, q_index: int):
        qe, qd = self.get_q_for_inference(q_in_ckpt, q_index)
        x = jnp.asarray(x)
        out = self._compress_dev(self.params, x, qe, qd)
        packed = np.asarray(out["packed"])
        yh, yw = x.shape[1] // 16, x.shape[2] // 16
        zh, zw = get_downsampled_shape(x.shape[1], x.shape[2], 64)
        n_z = zh * zw * self.module.N
        z_hat = packed[:n_z].reshape(1, zh, zw, self.module.N)
        bits = np.ascontiguousarray(packed[n_z:]).view(np.uint32)
        sym = (bits & 0xFFFF).astype(np.uint16).view(np.int16)
        idx = (bits >> 16).astype(np.uint16).view(np.int16)
        n = yh * yw * (self.module.N // 4)
        self.entropy_coder.reset()
        self._encode_z("bit_estimator_z", z_hat)
        for i in range(4):
            self.gaussian.encode_with_indexes(
                self.entropy_coder, sym[i * n:(i + 1) * n],
                idx[i * n:(i + 1) * n])
        self.entropy_coder.flush()
        return {
            "bit_stream": self.entropy_coder.get_encoded_stream(),
            "x_hat": out["x_hat"],
        }

    def decompress(self, bit_stream, height, width, q_in_ckpt: bool, q_index: int):
        _, qd = self.get_q_for_inference(q_in_ckpt, q_index)
        self.entropy_coder.set_stream(bit_stream)
        zh, zw = get_downsampled_shape(height, width, 64)
        yh, yw = get_downsampled_shape(height, width, 16)
        z_hat = jnp.asarray(self._decode_z("bit_estimator_z",
                                           (1, zh, zw, self.module.N)))

        def _host_decode(idx_r):
            return jnp.asarray(
                self.gaussian.decode_with_indexes(self.entropy_coder,
                                                  np.asarray(idx_r))
                .astype(np.float32))

        # fused-boundary decode: 5 dispatches instead of 7 (see __init__)
        params, idx_r, means_parts = self._prior_scales0(
            self.params, z_hat, yh, yw)
        so_far = jnp.zeros((1, yh, yw, self.module.N), params.dtype)
        y_q_r = _host_decode(idx_r)
        for step in range(1, 4):
            so_far, idx_r, means_parts = self._update_scales_step(
                self.params, params, so_far, y_q_r, tuple(means_parts),
                self._step_dev[step - 1])
            y_q_r = _host_decode(idx_r)
        x_hat = self._synth_final(self.params, params, so_far, y_q_r,
                                  tuple(means_parts), qd)
        return {"x_hat": x_hat}

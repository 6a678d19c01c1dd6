"""CANFVC_DMC — the fork's conditional augmented-normalizing-flow hybrid.

Parity target: DCVC-HEM/src/models/video_model.py:523-840 (fork addition):
DMC (HEM) with the contextual enc/dec/recon replaced by a 2-layer
conditional ANF ladder (use_affine=False -> additive location-only flows,
CondAugmentedNormalizedFlow, DCVC-HEM/src/layers/layers.py:131-335) and a
DeQuantizationModule post-filter. DPB carries no ref_feature (the fork sets
it to None, :655), so motion compensation always runs the I-adaptor path.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import conv, leaky_relu
from ..ops.math import lower_bound
from ..ops.warp import bilinear_down2, flow_warp
from . import priors
from .hem_common import (
    Conv3Stack,
    DeQuantizationModule,
    HemDecoder,
    HemEncoder,
    HemHyperDec,
    HemHyperEnc,
)
from .video_hem import (
    HemContextFusion,
    HemContextualDecoder,
    HemContextualEncoder,
    HemFeatureExtractor,
    HemReconGeneration,
    _HemResHyperEnc,
)
from .video_net import MESpynet


class CanfMainCoder(nn.Module):
    """2-layer additive conditional ANF ladder (encode/decode are exact
    inverses by construction — ContextualCANFMainCoder, :553-583)."""

    num_layers: int = 2
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    def setup(self):
        N, M = self.channel_N, self.channel_M
        self.analysis = [HemContextualEncoder(N, M, dtype=self.dtype)
                         for _ in range(self.num_layers)]
        self.synthesis_dec = [HemContextualDecoder(N, M, dtype=self.dtype)
                              for _ in range(self.num_layers)]
        self.synthesis_recon = [HemReconGeneration(N, dtype=self.dtype)
                                for _ in range(self.num_layers)]

    def __call__(self, x, contexts):
        """encode + decode round trip (materializes all ladder params)."""
        x2, code = self.encode(x, contexts)
        return self.decode(jnp.zeros_like(x), contexts, code), x2, code

    def _synth(self, i, code, contexts):
        c1, c2, c3 = contexts
        feat = self.synthesis_dec[i](code, c2, c3)
        _, recon = self.synthesis_recon[i](feat, c1)
        return recon

    def encode(self, x, contexts):
        """x -> (x_residual, latent code)."""
        code = None
        for i in range(self.num_layers):
            enc = self.analysis[i](x, *contexts)
            code = enc if code is None else code + enc
            if i < self.num_layers - 1:
                x = x - self._synth(i, code, contexts)
        return x, code

    def decode(self, x0, contexts, code):
        """(zeros, latent) -> reconstruction; inverse of encode."""
        x = x0
        for i in range(self.num_layers - 1, -1, -1):
            x = x + self._synth(i, code, contexts)
            if i:
                code = code - self.analysis[i](x, *contexts)
        return x

    def last_residual(self, x_res, contexts, code):
        """The fork's x2 regularizer target (video_model.py:785-789): the
        encode residual minus the LAST synthesis applied to the quantized
        latent — drives the final flow step to cancel given y_hat."""
        return x_res - self._synth(self.num_layers - 1, code, contexts)


class CANFVCDmc(nn.Module):
    """DMC (HEM) with CANF contextual coding + DQ post-filter."""

    anchor_num: int = 4
    channel_mv: int = 64
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    def setup(self):
        mv, N, M = self.channel_mv, self.channel_N, self.channel_M
        self.optic_flow = MESpynet(dtype=self.dtype)
        self.mv_encoder = HemEncoder(mv, dtype=self.dtype)
        self.mv_decoder = HemDecoder(mv, 2, dtype=self.dtype)
        self.mv_hyper_prior_encoder = HemHyperEnc(N, dtype=self.dtype)
        self.mv_hyper_prior_decoder = HemHyperDec(mv, dtype=self.dtype)
        self.mv_y_prior_fusion = Conv3Stack((mv * 3, mv * 3, mv * 3),
                                            dtype=self.dtype)
        self.mv_y_spatial_prior = Conv3Stack((mv * 3, mv * 3, mv * 2),
                                             dtype=self.dtype)

        self.feature_adaptor_I = conv(N, 3, 1, dtype=self.dtype)
        self.feature_extractor = HemFeatureExtractor(N, dtype=self.dtype)
        self.context_fusion_net = HemContextFusion(N, dtype=self.dtype)

        self.contextual_coder = CanfMainCoder(2, N, M, dtype=self.dtype)
        self.contextual_hyper_prior_encoder = _HemResHyperEnc(N, dtype=self.dtype)
        self.contextual_hyper_prior_decoder = HemHyperDec(M, dtype=self.dtype)
        self.temporal_prior_encoder_1 = conv(M * 3 // 2, 3, 2, dtype=self.dtype)
        self.temporal_prior_encoder_2 = conv(M * 2, 3, 2, dtype=self.dtype)
        self.y_prior_fusion = Conv3Stack((M * 4, M * 3, M * 3), dtype=self.dtype)
        self.y_spatial_prior = Conv3Stack((M * 3, M * 3, M * 2), dtype=self.dtype)
        self.dq = DeQuantizationModule(3, 64, 6, dtype=self.dtype)

        self.bit_estimator_z = BitEstimator(N)
        self.bit_estimator_z_mv = BitEstimator(N)

        ones = nn.initializers.ones
        self.mv_y_q_basic = self.param("mv_y_q_basic", ones, (1, 1, 1, mv))
        self.y_q_basic = self.param("y_q_basic", ones, (1, 1, 1, M))
        self.mv_y_q_scale = self.param("mv_y_q_scale", ones,
                                       (self.anchor_num, 1, 1, 1))
        self.y_q_scale = self.param("y_q_scale", ones, (self.anchor_num, 1, 1, 1))

    def mv_spatial_chunks(self, params):
        return jnp.split(self.mv_y_spatial_prior(params), 4, axis=-1)

    def y_spatial_chunks(self, params):
        return jnp.split(self.y_spatial_prior(params), 4, axis=-1)

    def motion_compensation(self, dpb, mv):
        warpframe = flow_warp(dpb["ref_frame"], mv)
        mv2 = bilinear_down2(mv) / 2
        mv3 = bilinear_down2(mv2) / 2
        f1, f2, f3 = self.feature_extractor(
            self.feature_adaptor_I(dpb["ref_frame"]))
        c1 = flow_warp(f1, mv)
        c2 = flow_warp(f2, mv2)
        c3 = flow_warp(f3, mv3)
        return (*self.context_fusion_net(c1, c2, c3), warpframe)

    def mv_prior(self, mv_z_hat, ref_mv_y, mv_y_shape):
        p = self.mv_hyper_prior_decoder(mv_z_hat)
        if ref_mv_y is None:
            ref_mv_y = jnp.zeros(mv_y_shape, p.dtype)
        return priors.separate_prior(self.mv_y_prior_fusion(
            jnp.concatenate([p, ref_mv_y], axis=-1)))

    def y_prior(self, z_hat, ref_y, context3, y_shape):
        hier = self.contextual_hyper_prior_decoder(z_hat)
        t = leaky_relu(self.temporal_prior_encoder_1(context3), 0.1)
        t = self.temporal_prior_encoder_2(t)
        if ref_y is None:
            ref_y = jnp.zeros(y_shape, t.dtype)
        return priors.separate_prior(self.y_prior_fusion(
            jnp.concatenate([t, hier, ref_y], axis=-1)))

    def __call__(self, x, dpb, mv_y_q_scale, y_q_scale, quant_mode: str = "round"):
        quant = priors.resolve_quant(quant_mode)
        curr_mv_q = lower_bound(self.mv_y_q_basic, 0.5) * mv_y_q_scale
        curr_y_q = lower_bound(self.y_q_basic, 0.5) * y_q_scale

        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv) / curr_mv_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = quant(mv_z)
        mv_qsm = self.mv_prior(mv_z_hat, dpb["ref_mv_y"], mv_y.shape)
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = priors.forward_dual_prior(
            mv_y, mv_qsm[2], mv_qsm[1], mv_qsm[0], self.mv_spatial_chunks,
            quant=quant)
        mv_y_hat = mv_y_hat * curr_mv_q

        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, warp_frame = self.motion_compensation(dpb, mv_hat)
        contexts = (c1, c2, c3)

        x2, y = self.contextual_coder.encode(x, contexts)
        y = y / curr_y_q
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = quant(z)
        qsm = self.y_prior(z_hat, dpb["ref_y"], c3, y.shape)
        y_res, y_q, y_hat, scales_hat = priors.forward_dual_prior(
            y, qsm[2], qsm[1], qsm[0], self.y_spatial_chunks, quant=quant)
        y_hat = y_hat * curr_y_q

        x_hat = self.contextual_coder.decode(jnp.zeros_like(x), contexts, y_hat)
        x_hat = jnp.clip(self.dq(x_hat), 0.0, 1.0)

        x2 = self.contextual_coder.last_residual(x2, contexts, y_hat)
        pixel_num = x.shape[1] * x.shape[2]
        if quant_mode == "noise":
            # training rate surrogate: bits from noise-quantized residuals
            # while the recon path stays STE (HEM video_model.py:466-471)
            noise = lambda t: priors.quant_noise(t, self.make_rng("noise"))
            y_q, mv_y_q = noise(y_res), noise(mv_y_res)
            z_hat, mv_z_hat = noise(z), noise(mv_z)
        return self._collect(x, x2, warp_frame, y_q, scales_hat, mv_y_q,
                             mv_scales_hat, z_hat, mv_z_hat, x_hat, y_hat,
                             mv_y_hat, pixel_num)

    def _collect(self, x, x2, warp_frame, y_q, scales_hat, mv_y_q,
                 mv_scales_hat, z_hat, mv_z_hat, x_hat, y_hat, mv_y_hat,
                 pixel_num):
        bpp_y = jnp.sum(bits.y_laplace_bits(y_q, scales_hat),
                        axis=(1, 2, 3)) / pixel_num
        bpp_mv_y = jnp.sum(bits.y_laplace_bits(mv_y_q, mv_scales_hat),
                           axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(bits.z_bits(z_hat, self.bit_estimator_z),
                        axis=(1, 2, 3)) / pixel_num
        bpp_mv_z = jnp.sum(bits.z_bits(mv_z_hat, self.bit_estimator_z_mv),
                           axis=(1, 2, 3)) / pixel_num
        bpp = bpp_y + bpp_z + bpp_mv_y + bpp_mv_z
        # x2_mse: ANF residual regularizer (train_CANFVC_DMC.py fork loss).
        # sum-over-CHW / (H*W), the reference convention (video_model.py:
        # 777-789) — 3x the all-axis mean — so the fork's loss weights
        # compose the same way
        x2_mse = jnp.sum(x2 ** 2, axis=(1, 2, 3)) / pixel_num
        return {
            "bpp": bpp, "bpp_y": bpp_y, "bpp_z": bpp_z,
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "me_mse": jnp.sum((x - warp_frame) ** 2,
                              axis=(1, 2, 3)) / pixel_num,
            "x2_mse": x2_mse,
            "bit": jnp.sum(bpp) * pixel_num,
            "dpb": {
                "ref_frame": x_hat,
                "ref_feature": None,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }

    # ---- real-coding surface (HemVideoRuntime-compatible) ----

    def compress_device(self, x, dpb, mv_y_q_scale, y_q_scale):
        curr_mv_q = lower_bound(self.mv_y_q_basic, 0.5) * mv_y_q_scale
        curr_y_q = lower_bound(self.y_q_basic, 0.5) * y_q_scale

        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv) / curr_mv_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = jnp.round(mv_z)
        mv_qsm = self.mv_prior(mv_z_hat, dpb["ref_mv_y"], mv_y.shape)
        mv_w0, mv_w1, mv_s0, mv_s1, mv_y_hat = priors.forward_dual_prior(
            mv_y, mv_qsm[2], mv_qsm[1], mv_qsm[0], self.mv_spatial_chunks,
            write=True)
        mv_y_hat = mv_y_hat * curr_mv_q

        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, _ = self.motion_compensation(dpb, mv_hat)
        contexts = (c1, c2, c3)

        _, y = self.contextual_coder.encode(x, contexts)
        y = y / curr_y_q
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = jnp.round(z)
        qsm = self.y_prior(z_hat, dpb["ref_y"], c3, y.shape)
        y_w0, y_w1, s0, s1, y_hat = priors.forward_dual_prior(
            y, qsm[2], qsm[1], qsm[0], self.y_spatial_chunks, write=True)
        y_hat = y_hat * curr_y_q

        x_hat = self.contextual_coder.decode(jnp.zeros_like(x), contexts, y_hat)
        x_hat = jnp.clip(self.dq(x_hat), 0.0, 1.0)
        return {
            "mv_z_hat": mv_z_hat, "z_hat": z_hat,
            "mv_y_q_planes": (mv_w0, mv_w1),
            "mv_scales_planes": (mv_s0, mv_s1),
            "y_q_planes": (y_w0, y_w1),
            "scales_planes": (s0, s1),
            "dpb": {"ref_frame": x_hat, "ref_feature": None,
                    "ref_y": y_hat, "ref_mv_y": mv_y_hat},
        }

    def decode_mv_prior(self, mv_z_hat, ref_mv_y, y_height: int, y_width: int):
        B = mv_z_hat.shape[0]
        return self.mv_prior(mv_z_hat, ref_mv_y,
                             (B, y_height, y_width, self.channel_mv))

    def decode_motion_stage(self, mv_y_hat, mv_y_q_scale, dpb, z_hat,
                            y_height: int, y_width: int):
        mv_y_hat = mv_y_hat * (lower_bound(self.mv_y_q_basic, 0.5)
                               * mv_y_q_scale)
        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, _ = self.motion_compensation(dpb, mv_hat)
        B = z_hat.shape[0]
        qsm = self.y_prior(z_hat, dpb["ref_y"], c3,
                           (B, y_height, y_width, self.channel_M))
        return qsm, (c1, c2, c3), mv_y_hat

    def decode_recon_stage(self, y_hat, y_q_scale, contexts):
        y_hat = y_hat * (lower_bound(self.y_q_basic, 0.5) * y_q_scale)
        c1 = contexts[0]
        B, H, W = c1.shape[0], c1.shape[1], c1.shape[2]
        x0 = jnp.zeros((B, H, W, 3), c1.dtype)
        x_hat = self.contextual_coder.decode(x0, contexts, y_hat)
        x_hat = jnp.clip(self.dq(x_hat), 0.0, 1.0)
        return x_hat, None, y_hat

    def mv_dual_scales_step1(self, q_step, scales, means, half0, half1):
        return priors.dual_decode_scales(means, scales, q_step, half0, half1,
                                         self.mv_spatial_chunks, 1)

    def y_dual_scales_step1(self, q_step, scales, means, half0, half1):
        return priors.dual_decode_scales(means, scales, q_step, half0, half1,
                                         self.y_spatial_chunks, 1)

"""DMC (HEM generation) — hybrid spatial-temporal entropy model P-frame codec.

Parity target: DCVC-HEM/src/models/video_model.py:131-519 — dual-part
checkerboard priors on both latents, latent temporal priors via zero-filled
ref_y / ref_mv_y concat, scalar continuous-rate q (LowerBound(q_basic, 0.5)
* q_scale), laplace y-latents.

DPB contract: {ref_frame, ref_feature, ref_y, ref_mv_y} (no ref_mv_feature).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import ResBlock, SubpelConv, conv, leaky_relu
from ..ops.math import lower_bound
from ..ops.warp import bilinear_down2, flow_warp
from . import priors
from .hem_common import (
    Conv3Stack,
    HemDecoder,
    HemEncoder,
    HemHyperDec,
    HemHyperEnc,
    HemUNet,
)
from .video_net import MESpynet


class HemFeatureExtractor(nn.Module):
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feature):
        ch = self.channel
        l1 = conv(ch, 3, 1, name="conv1", dtype=self.dtype)(feature)
        l1 = ResBlock(ch, name="res1", dtype=self.dtype)(l1)
        l2 = conv(ch, 3, 2, name="conv2", dtype=self.dtype)(l1)
        l2 = ResBlock(ch, name="res2", dtype=self.dtype)(l2)
        l3 = conv(ch, 3, 2, name="conv3", dtype=self.dtype)(l2)
        l3 = ResBlock(ch, name="res3", dtype=self.dtype)(l3)
        return l1, l2, l3


class HemContextFusion(nn.Module):
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, context1, context2, context3):
        ch = self.channel
        c3_up = SubpelConv(ch, 2, 3, name="conv3_up", dtype=self.dtype)(context3)
        c3_up = ResBlock(ch, name="res3_up", dtype=self.dtype)(c3_up)
        c3_out = conv(ch, 3, 1, name="conv3_out", dtype=self.dtype)(context3)
        c3_out = ResBlock(ch, name="res3_out", dtype=self.dtype)(c3_out)
        cat32 = jnp.concatenate([c3_up, context2], axis=-1)
        c2_up = SubpelConv(ch, 2, 3, name="conv2_up", dtype=self.dtype)(cat32)
        c2_up = ResBlock(ch, name="res2_up", dtype=self.dtype)(c2_up)
        c2_out = conv(ch, 3, 1, name="conv2_out", dtype=self.dtype)(cat32)
        c2_out = ResBlock(ch, name="res2_out", dtype=self.dtype)(c2_out)
        cat21 = jnp.concatenate([c2_up, context1], axis=-1)
        c1_out = conv(ch, 3, 1, name="conv1_out", dtype=self.dtype)(cat21)
        c1_out = ResBlock(ch, name="res1_out", dtype=self.dtype)(c1_out)
        return context1 + c1_out, context2 + c2_out, context3 + c3_out


class HemContextualEncoder(nn.Module):
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, context1, context2, context3):
        N, M = self.channel_N, self.channel_M
        f = conv(N, 3, 2, name="conv1", dtype=self.dtype)(
            jnp.concatenate([x, context1], axis=-1))
        f = ResBlock(N * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res1", dtype=self.dtype)(
            jnp.concatenate([f, context2], axis=-1))
        f = conv(N, 3, 2, name="conv2", dtype=self.dtype)(f)
        f = ResBlock(N * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res2", dtype=self.dtype)(
            jnp.concatenate([f, context3], axis=-1))
        f = conv(N, 3, 2, name="conv3", dtype=self.dtype)(f)
        return conv(M, 3, 2, name="conv4", dtype=self.dtype)(f)


class HemContextualDecoder(nn.Module):
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, context2, context3):
        N = self.channel_N
        f = SubpelConv(N, 2, 3, name="up1", dtype=self.dtype)(x)
        f = SubpelConv(N, 2, 3, name="up2", dtype=self.dtype)(f)
        f = ResBlock(N * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res1", dtype=self.dtype)(
            jnp.concatenate([f, context3], axis=-1))
        f = SubpelConv(N, 2, 3, name="up3", dtype=self.dtype)(f)
        f = ResBlock(N * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res2", dtype=self.dtype)(
            jnp.concatenate([f, context2], axis=-1))
        return SubpelConv(32, 2, 3, name="up4", dtype=self.dtype)(f)


class HemReconGeneration(nn.Module):
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ctx, res):
        f = conv(self.channel, 3, 1, name="first_conv", dtype=self.dtype)(
            jnp.concatenate([ctx, res], axis=-1))
        f = HemUNet(self.channel, name="unet_1", dtype=self.dtype)(f)
        feature = HemUNet(self.channel, name="unet_2", dtype=self.dtype)(f)
        recon = conv(3, 3, 1, name="recon_conv", dtype=self.dtype)(feature)
        return feature, recon


class DMCHem(nn.Module):
    anchor_num: int = 4
    channel_mv: int = 64
    channel_N: int = 64
    channel_M: int = 96
    # motion-compensation warp mode ("exact" | "tile:..." | "block:...",
    # ops/warp.py:resolve_warp_fn); None -> exact. RD-gated on the DC
    # generation (RDNOTES.md §3b) — same smooth decoded-flow regime here.
    mc_warp_mode: str | None = None
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
        self.feature_adaptor_P = conv(N, 1, 1, dtype=self.dtype)
        self.feature_extractor = HemFeatureExtractor(N, dtype=self.dtype)
        self.context_fusion_net = HemContextFusion(N, dtype=self.dtype)

        self.contextual_encoder = HemContextualEncoder(N, M, dtype=self.dtype)
        self.contextual_hyper_prior_encoder = _HemResHyperEnc(N, dtype=self.dtype)
        self.contextual_hyper_prior_decoder = HemHyperDec(M, dtype=self.dtype)
        self.temporal_prior_encoder_1 = conv(M * 3 // 2, 3, 2, dtype=self.dtype)
        self.temporal_prior_encoder_2 = conv(M * 2, 3, 2, dtype=self.dtype)
        self.y_prior_fusion = Conv3Stack((M * 4, M * 3, M * 3), dtype=self.dtype)
        self.y_spatial_prior = Conv3Stack((M * 3, M * 3, M * 2), dtype=self.dtype)
        self.contextual_decoder = HemContextualDecoder(N, M, dtype=self.dtype)
        self.recon_generation_net = HemReconGeneration(N, dtype=self.dtype)

        self.bit_estimator_z = BitEstimator(N)
        self.bit_estimator_z_mv = BitEstimator(N)

        ones = nn.initializers.ones
        self.mv_y_q_basic = self.param("mv_y_q_basic", ones, (1, 1, 1, mv))
        self.y_q_basic = self.param("y_q_basic", ones, (1, 1, 1, M))
        self.mv_y_q_scale = self.param("mv_y_q_scale", ones,
                                       (self.anchor_num, 1, 1, 1))
        self.y_q_scale = self.param("y_q_scale", ones, (self.anchor_num, 1, 1, 1))

    # ---- pieces ----

    def get_curr_mv_y_q(self, q_scale):
        return lower_bound(self.mv_y_q_basic, 0.5) * q_scale

    def get_curr_y_q(self, q_scale):
        return lower_bound(self.y_q_basic, 0.5) * q_scale

    def mv_spatial_chunks(self, params):
        return jnp.split(self.mv_y_spatial_prior(params), 4, axis=-1)

    def y_spatial_chunks(self, params):
        return jnp.split(self.y_spatial_prior(params), 4, axis=-1)

    def multi_scale_feature_extractor(self, dpb):
        if dpb["ref_feature"] is None:
            feature = self.feature_adaptor_I(dpb["ref_frame"])
            if self.is_initializing():
                self.feature_adaptor_P(jnp.zeros_like(feature))
        else:
            feature = self.feature_adaptor_P(dpb["ref_feature"])
        return self.feature_extractor(feature)

    def motion_compensation(self, dpb, mv):
        from ..ops.warp import resolve_warp_fn

        warp = resolve_warp_fn(self.mc_warp_mode or "exact")
        warpframe = warp(dpb["ref_frame"], mv)
        mv2 = bilinear_down2(mv) / 2
        mv3 = bilinear_down2(mv2) / 2
        f1, f2, f3 = self.multi_scale_feature_extractor(dpb)
        context1 = warp(f1, mv)
        context2 = warp(f2, mv2)
        context3 = warp(f3, mv3)
        return (*self.context_fusion_net(context1, context2, context3), warpframe)

    def mv_prior(self, mv_z_hat, ref_mv_y, mv_y_shape):
        mv_params = self.mv_hyper_prior_decoder(mv_z_hat)
        if ref_mv_y is None:
            ref_mv_y = jnp.zeros(mv_y_shape, mv_params.dtype)
        mv_params = jnp.concatenate([mv_params, ref_mv_y], axis=-1)
        return priors.separate_prior(self.mv_y_prior_fusion(mv_params))

    def y_prior(self, z_hat, ref_y, context3, y_shape):
        hier = self.contextual_hyper_prior_decoder(z_hat)
        t = self.temporal_prior_encoder_1(context3)
        t = leaky_relu(t, 0.1)
        t = self.temporal_prior_encoder_2(t)
        if ref_y is None:
            ref_y = jnp.zeros(y_shape, t.dtype)
        params = jnp.concatenate([t, hier, ref_y], axis=-1)
        return priors.separate_prior(self.y_prior_fusion(params))

    # ---- full paths ----

    def __call__(self, x, dpb, mv_y_q_scale, y_q_scale, quant_mode: str = "round"):
        quant = priors.resolve_quant(quant_mode)
        curr_mv_y_q = self.get_curr_mv_y_q(mv_y_q_scale)
        curr_y_q = self.get_curr_y_q(y_q_scale)

        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv) / curr_mv_y_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = quant(mv_z)
        mv_q_step, mv_scales, mv_means = self.mv_prior(
            mv_z_hat, dpb["ref_mv_y"], mv_y.shape)
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = priors.forward_dual_prior(
            mv_y, mv_means, mv_scales, mv_q_step, self.mv_spatial_chunks,
            quant=quant)
        mv_y_hat = mv_y_hat * curr_mv_y_q

        mv_hat = self.mv_decoder(mv_y_hat)
        context1, context2, context3, warp_frame = self.motion_compensation(
            dpb, mv_hat)

        y = self.contextual_encoder(x, context1, context2, context3) / curr_y_q
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = quant(z)
        q_step, scales, means = self.y_prior(z_hat, dpb["ref_y"], context3,
                                             y.shape)
        y_res, y_q, y_hat, scales_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.y_spatial_chunks, quant=quant)
        y_hat = y_hat * curr_y_q

        res = self.contextual_decoder(y_hat, context2, context3)
        feature, recon = self.recon_generation_net(res, context1)
        x_hat = jnp.clip(recon, 0.0, 1.0)

        pixel_num = x.shape[1] * x.shape[2]
        if quant_mode == "noise":
            # training rate surrogate: bits from noise-quantized residuals
            # while the recon path stays STE (video_model.py:466-471)
            noise = lambda t: priors.quant_noise(t, self.make_rng("noise"))
            y_for_bit, mv_y_for_bit = noise(y_res), noise(mv_y_res)
            z_for_bit, mv_z_for_bit = noise(z), noise(mv_z)
        else:
            y_for_bit, mv_y_for_bit = y_q, mv_y_q
            z_for_bit, mv_z_for_bit = z_hat, mv_z_hat
        bits_y = bits.y_laplace_bits(y_for_bit, scales_hat)
        bits_mv_y = bits.y_laplace_bits(mv_y_for_bit, mv_scales_hat)
        bits_z = bits.z_bits(z_for_bit, self.bit_estimator_z)
        bits_mv_z = bits.z_bits(mv_z_for_bit, self.bit_estimator_z_mv)
        bpp_y = jnp.sum(bits_y, axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(bits_z, axis=(1, 2, 3)) / pixel_num
        bpp_mv_y = jnp.sum(bits_mv_y, axis=(1, 2, 3)) / pixel_num
        bpp_mv_z = jnp.sum(bits_mv_z, axis=(1, 2, 3)) / pixel_num
        bpp = bpp_y + bpp_z + bpp_mv_y + bpp_mv_z
        # sum-over-CHW / (H*W): the reference convention (video_model.py:
        # 463-465), 3x the all-axis mean
        me_mse = jnp.sum((x - warp_frame) ** 2, axis=(1, 2, 3)) / pixel_num
        return {
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp": bpp,
            "me_mse": me_mse,
            "bit": jnp.sum(bpp) * pixel_num,
            "dpb": {
                "ref_frame": x_hat,
                "ref_feature": feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }

    def compress_device(self, x, dpb, mv_y_q_scale, y_q_scale):
        curr_mv_y_q = self.get_curr_mv_y_q(mv_y_q_scale)
        curr_y_q = self.get_curr_y_q(y_q_scale)

        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv) / curr_mv_y_q
        mv_z = self.mv_hyper_prior_encoder(mv_y)
        mv_z_hat = jnp.round(mv_z)
        mv_q_step, mv_scales, mv_means = self.mv_prior(
            mv_z_hat, dpb["ref_mv_y"], mv_y.shape)
        mv_w0, mv_w1, mv_s0, mv_s1, mv_y_hat = priors.forward_dual_prior(
            mv_y, mv_means, mv_scales, mv_q_step, self.mv_spatial_chunks,
            write=True)
        mv_y_hat = mv_y_hat * curr_mv_y_q

        mv_hat = self.mv_decoder(mv_y_hat)
        context1, context2, context3, _ = self.motion_compensation(dpb, mv_hat)

        y = self.contextual_encoder(x, context1, context2, context3) / curr_y_q
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = jnp.round(z)
        q_step, scales, means = self.y_prior(z_hat, dpb["ref_y"], context3,
                                             y.shape)
        y_w0, y_w1, s0, s1, y_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.y_spatial_chunks, write=True)
        y_hat = y_hat * curr_y_q

        res = self.contextual_decoder(y_hat, context2, context3)
        feature, recon = self.recon_generation_net(res, context1)
        return {
            "mv_z_hat": mv_z_hat,
            "z_hat": z_hat,
            "mv_y_q_planes": (mv_w0, mv_w1),
            "mv_scales_planes": (mv_s0, mv_s1),
            "y_q_planes": (y_w0, y_w1),
            "scales_planes": (s0, s1),
            "dpb": {
                "ref_frame": jnp.clip(recon, 0.0, 1.0),
                "ref_feature": feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }

    # ---- decode-side stages ----

    def decode_mv_prior(self, mv_z_hat, ref_mv_y, y_height: int, y_width: int):
        B = mv_z_hat.shape[0]
        shape = (B, y_height, y_width, self.channel_mv)
        return self.mv_prior(mv_z_hat, ref_mv_y, shape)

    def decode_motion_stage(self, mv_y_hat, mv_y_q_scale, dpb, z_hat,
                            y_height: int, y_width: int):
        mv_y_hat = mv_y_hat * self.get_curr_mv_y_q(mv_y_q_scale)
        mv_hat = self.mv_decoder(mv_y_hat)
        context1, context2, context3, _ = self.motion_compensation(dpb, mv_hat)
        B = z_hat.shape[0]
        y_shape = (B, y_height, y_width, self.channel_M)
        qsm = self.y_prior(z_hat, dpb["ref_y"], context3, y_shape)
        return qsm, (context1, context2, context3), mv_y_hat

    def decode_recon_stage(self, y_hat, y_q_scale, contexts):
        y_hat = y_hat * self.get_curr_y_q(y_q_scale)
        context1, context2, context3 = contexts
        res = self.contextual_decoder(y_hat, context2, context3)
        feature, recon = self.recon_generation_net(res, context1)
        return jnp.clip(recon, 0.0, 1.0), feature, y_hat

    def mv_dual_scales_step1(self, q_step, scales, means, half0, half1):
        return priors.dual_decode_scales(means, scales, q_step, half0, half1,
                                         self.mv_spatial_chunks, 1)

    def y_dual_scales_step1(self, q_step, scales, means, half0, half1):
        return priors.dual_decode_scales(means, scales, q_step, half0, half1,
                                         self.y_spatial_chunks, 1)


class _HemResHyperEnc(nn.Module):
    """Contextual hyper encoder (video_model.py:173-179)."""

    channel_N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y):
        N = self.channel_N
        z = conv(N, 3, 1, name="c1", dtype=self.dtype)(y)
        z = leaky_relu(z)
        z = conv(N, 3, 2, name="c2", dtype=self.dtype)(z)
        z = leaky_relu(z)
        return conv(N, 3, 2, name="c3", dtype=self.dtype)(z)

"""DMC (TCM generation) — temporal context mining, no spatial AR prior.

Parity target: DCVC-TCM/src/models/video_net_dmc.py:165-509 — GDN-based
conditional transforms, temporal prior encoder over all 3 context scales,
single-shot latent coding (scales/means from the entropy-parameter net),
bare (ref_frame, ref_feature) recurrent state, per-rate checkpoints (no q).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import ResBlock, SubpelConv, conv, leaky_relu
from ..layers.gdn import GDN
from ..ops.warp import bilinear_down2, flow_warp
from . import priors
from .video_net import MESpynet


def _deconv(features: int, stride: int = 2, name: str | None = None, dtype=None):
    from ..layers.blocks import deconv

    return deconv(features, 3, stride, name=name, dtype=dtype)


class TcmFeatureExtractor(nn.Module):
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


class TcmContextFusion(nn.Module):
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, c1, c2, c3):
        ch = self.channel
        c3_up = SubpelConv(ch, 2, 3, name="conv3_up", dtype=self.dtype)(c3)
        c3_up = ResBlock(ch, name="res3_up", dtype=self.dtype)(c3_up)
        c3_out = conv(ch, 3, 1, name="conv3_out", dtype=self.dtype)(c3)
        c3_out = ResBlock(ch, name="res3_out", dtype=self.dtype)(c3_out)
        cat32 = jnp.concatenate([c3_up, c2], axis=-1)
        c2_up = SubpelConv(ch, 2, 3, name="conv2_up", dtype=self.dtype)(cat32)
        c2_up = ResBlock(ch, name="res2_up", dtype=self.dtype)(c2_up)
        c2_out = conv(ch, 3, 1, name="conv2_out", dtype=self.dtype)(cat32)
        c2_out = ResBlock(ch, name="res2_out", dtype=self.dtype)(c2_out)
        cat21 = jnp.concatenate([c2_up, c1], axis=-1)
        c1_out = conv(ch, 3, 1, name="conv1_out", dtype=self.dtype)(cat21)
        c1_out = ResBlock(ch, name="res1_out", dtype=self.dtype)(c1_out)
        return c1 + c1_out, c2 + c2_out, c3 + c3_out


class TcmMvEncoder(nn.Module):
    channel_mv: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, mv):
        ch = self.channel_mv
        x = mv
        for i in range(3):
            x = conv(ch, 3, 2, name=f"down{i}", dtype=self.dtype)(x)
            x = GDN(ch, name=f"gdn{i}")(x)
            x = ResBlock(ch, name=f"res{i}", dtype=self.dtype)(x)
            x = leaky_relu(x, 0.1)
        return conv(ch, 3, 2, name="down3", dtype=self.dtype)(x)


class TcmMvDecoder(nn.Module):
    channel_mv: int = 128
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, mv_y_hat):
        ch = self.channel_mv
        x = _deconv(ch, 2, name="up0", dtype=self.dtype)(mv_y_hat)
        x = leaky_relu(x, 0.1)
        x = ResBlock(ch, name="res0", dtype=self.dtype)(x)
        x = GDN(ch, inverse=True, name="igdn0")(x)
        x = _deconv(ch, 2, name="up1", dtype=self.dtype)(x)
        x = GDN(ch, inverse=True, name="igdn1")(x)
        x = _deconv(ch, 2, name="up2", dtype=self.dtype)(x)
        x = GDN(ch, inverse=True, name="igdn2")(x)
        return _deconv(2, 2, name="up3", dtype=self.dtype)(x)


class TcmContextualEncoder(nn.Module):
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, c1, c2, c3):
        N, M = self.channel_N, self.channel_M
        f = conv(N, 3, 2, name="conv1", dtype=self.dtype)(
            jnp.concatenate([x, c1], axis=-1))
        f = GDN(N, name="gdn1")(f)
        f = ResBlock(N * 2, slope=0.1, start_from_relu=False,
                     end_with_relu=True, bottleneck=True, name="res1",
                     dtype=self.dtype)(jnp.concatenate([f, c2], axis=-1))
        f = conv(N, 3, 2, name="conv2", dtype=self.dtype)(f)
        f = GDN(N, name="gdn2")(f)
        f = ResBlock(N * 2, slope=0.1, start_from_relu=False,
                     end_with_relu=True, bottleneck=True, name="res2",
                     dtype=self.dtype)(jnp.concatenate([f, c3], axis=-1))
        f = conv(N, 3, 2, name="conv3", dtype=self.dtype)(f)
        f = GDN(N, name="gdn3")(f)
        return conv(M, 3, 2, name="conv4", dtype=self.dtype)(f)


class TcmContextualDecoder(nn.Module):
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y_hat, c2, c3):
        N = self.channel_N
        f = SubpelConv(N, 2, 3, name="up1", dtype=self.dtype)(y_hat)
        f = GDN(N, inverse=True, name="igdn1")(f)
        f = SubpelConv(N, 2, 3, name="up2", dtype=self.dtype)(f)
        f = GDN(N, inverse=True, name="igdn2")(f)
        f = ResBlock(N * 2, slope=0.1, start_from_relu=False,
                     end_with_relu=True, bottleneck=True, name="res1",
                     dtype=self.dtype)(jnp.concatenate([f, c3], axis=-1))
        f = SubpelConv(N, 2, 3, name="up3", dtype=self.dtype)(f)
        f = GDN(N, inverse=True, name="igdn3")(f)
        f = ResBlock(N * 2, slope=0.1, start_from_relu=False,
                     end_with_relu=True, bottleneck=True, name="res2",
                     dtype=self.dtype)(jnp.concatenate([f, c2], axis=-1))
        return SubpelConv(32, 2, 3, name="up4", dtype=self.dtype)(f)


class TcmTemporalPriorEncoder(nn.Module):
    channel_N: int = 64
    channel_M: int = 96
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, c1, c2, c3):
        N, M = self.channel_N, self.channel_M
        f = conv(N, 3, 2, name="conv1", dtype=self.dtype)(c1)
        f = GDN(N, name="gdn1")(f)
        f = conv(M, 3, 2, name="conv2", dtype=self.dtype)(
            jnp.concatenate([f, c2], axis=-1))
        f = GDN(M, name="gdn2")(f)
        f = conv(M * 3 // 2, 3, 2, name="conv3", dtype=self.dtype)(
            jnp.concatenate([f, c3], axis=-1))
        f = GDN(M * 3 // 2, name="gdn3")(f)
        return conv(M * 2, 3, 2, name="conv4", dtype=self.dtype)(f)


class TcmReconGeneration(nn.Module):
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ctx, res):
        f = conv(self.channel, 3, 1, name="conv", dtype=self.dtype)(
            jnp.concatenate([ctx, res], axis=-1))
        f = ResBlock(self.channel, name="res1", dtype=self.dtype)(f)
        feature = ResBlock(self.channel, name="res2", dtype=self.dtype)(f)
        recon = conv(3, 3, 1, name="recon_conv", dtype=self.dtype)(feature)
        return feature, recon


class _TcmHyperEnc(nn.Module):
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


class _TcmHyperDec(nn.Module):
    """z -> 2*out_ch prior features via transposed convs."""

    mid_ch: int
    out_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z_hat):
        p = _deconv(self.mid_ch, 2, name="d1", dtype=self.dtype)(z_hat)
        p = leaky_relu(p)
        p = _deconv(self.mid_ch * 3 // 2, 2, name="d2", dtype=self.dtype)(p)
        p = leaky_relu(p)
        return _deconv(self.out_ch * 2, 1, name="d3", dtype=self.dtype)(p)


class DMCTcm(nn.Module):
    channel_mv: int = 128
    channel_N: int = 64
    channel_M: int = 96
    # motion-compensation warp mode (ops/warp.py:resolve_warp_fn);
    # None -> exact. See RDNOTES.md §3b for the RD gate.
    mc_warp_mode: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        mv, N, M = self.channel_mv, self.channel_N, self.channel_M
        self.optic_flow = MESpynet(dtype=self.dtype)
        self.mv_encoder = TcmMvEncoder(mv, dtype=self.dtype)
        self.mv_prior_encoder = _TcmHyperEnc(N, dtype=self.dtype)
        self.mv_prior_decoder = _TcmHyperDec(mv, mv, dtype=self.dtype)
        self.mv_decoder = TcmMvDecoder(mv, dtype=self.dtype)

        self.feature_adaptor_I = conv(N, 3, 1, dtype=self.dtype)
        self.feature_adaptor_P = conv(N, 1, 1, dtype=self.dtype)
        self.feature_extractor = TcmFeatureExtractor(N, dtype=self.dtype)
        self.context_fusion_net = TcmContextFusion(N, dtype=self.dtype)

        self.contextual_encoder = TcmContextualEncoder(N, M, dtype=self.dtype)
        self.contextual_hyper_prior_encoder = _TcmHyperEnc(N, dtype=self.dtype)
        self.contextual_hyper_prior_decoder = _TcmHyperDec(M, M, dtype=self.dtype)
        self.temporal_prior_encoder = TcmTemporalPriorEncoder(N, M,
                                                              dtype=self.dtype)
        self.contextual_entropy_parameter = _TcmEntropyParameter(M,
                                                                 dtype=self.dtype)
        self.contextual_decoder = TcmContextualDecoder(N, M, dtype=self.dtype)
        self.recon_generation_net = TcmReconGeneration(N, dtype=self.dtype)

        self.bit_estimator_z = BitEstimator(N)
        self.bit_estimator_z_mv = BitEstimator(N)

    def multi_scale_feature_extractor(self, ref_frame, ref_feature):
        if ref_feature is None:
            feature = self.feature_adaptor_I(ref_frame)
            if self.is_initializing():
                self.feature_adaptor_P(jnp.zeros_like(feature))
        else:
            feature = self.feature_adaptor_P(ref_feature)
        return self.feature_extractor(feature)

    def motion_compensation(self, ref_frame, ref_feature, mv):
        from ..ops.warp import resolve_warp_fn

        warp = resolve_warp_fn(self.mc_warp_mode or "exact")
        warpframe = warp(ref_frame, mv)
        mv2 = bilinear_down2(mv) / 2
        mv3 = bilinear_down2(mv2) / 2
        f1, f2, f3 = self.multi_scale_feature_extractor(ref_frame, ref_feature)
        c1 = warp(f1, mv)
        c2 = warp(f2, mv2)
        c3 = warp(f3, mv3)
        return (*self.context_fusion_net(c1, c2, c3), warpframe)

    def y_gaussian_params(self, z_hat, c1, c2, c3):
        hier = self.contextual_hyper_prior_decoder(z_hat)
        temporal = self.temporal_prior_encoder(c1, c2, c3)
        gp = self.contextual_entropy_parameter(
            jnp.concatenate([temporal, hier], axis=-1))
        scales, means = jnp.split(gp, 2, axis=-1)
        return scales, means

    def __call__(self, x, ref_frame, ref_feature, quant_mode: str = "round"):
        quant = priors.resolve_quant(quant_mode)
        est_mv = self.optic_flow(x, ref_frame)
        mv_y = self.mv_encoder(est_mv)
        mv_z = self.mv_prior_encoder(mv_y)
        mv_z_hat = quant(mv_z)
        mv_scales, mv_means = jnp.split(self.mv_prior_decoder(mv_z_hat), 2,
                                        axis=-1)
        mv_y_q = quant(mv_y - mv_means)
        mv_y_hat = mv_y_q + mv_means

        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, warp_frame = self.motion_compensation(ref_frame,
                                                          ref_feature, mv_hat)

        y = self.contextual_encoder(x, c1, c2, c3)
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = quant(z)
        scales, means = self.y_gaussian_params(z_hat, c1, c2, c3)
        y_q = quant(y - means)
        y_hat = y_q + means

        res = self.contextual_decoder(y_hat, c2, c3)
        feature, recon = self.recon_generation_net(res, c1)
        recon = jnp.clip(recon, 0.0, 1.0)

        pixel_num = x.shape[0] * x.shape[1] * x.shape[2]
        if quant_mode == "noise":
            # training rate surrogate: bits from noise-quantized residuals
            # while the recon path stays STE (HEM video_model.py:466-471)
            noise = lambda t: priors.quant_noise(t, self.make_rng("noise"))
            y_for_bit, mv_y_for_bit = noise(y - means), noise(mv_y - mv_means)
            z_for_bit, mv_z_for_bit = noise(z), noise(mv_z)
        else:
            y_for_bit, mv_y_for_bit = y_q, mv_y_q
            z_for_bit, mv_z_for_bit = z_hat, mv_z_hat
        bits_y = bits.y_laplace_bits(y_for_bit, scales)
        bits_mv_y = bits.y_laplace_bits(mv_y_for_bit, mv_scales)
        bits_z = bits.z_bits(z_for_bit, self.bit_estimator_z)
        bits_mv_z = bits.z_bits(mv_z_for_bit, self.bit_estimator_z_mv)
        bpp_y = jnp.sum(bits_y) / pixel_num
        bpp_z = jnp.sum(bits_z) / pixel_num
        bpp_mv_y = jnp.sum(bits_mv_y) / pixel_num
        bpp_mv_z = jnp.sum(bits_mv_z) / pixel_num
        bpp = bpp_y + bpp_z + bpp_mv_y + bpp_mv_z
        return {
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp": bpp,
            # sum-over-CHW / (H*W), the reference convention
            "me_mse": jnp.sum((x - warp_frame) ** 2) / pixel_num,
            "mse_loss": jnp.sum((x - recon) ** 2) / pixel_num,
            "recon_image": recon,
            "feature": feature,
            "bit": bpp * pixel_num,
        }

    def compress_device(self, x, ref_frame, ref_feature):
        est_mv = self.optic_flow(x, ref_frame)
        mv_y = self.mv_encoder(est_mv)
        mv_z = self.mv_prior_encoder(mv_y)
        mv_z_hat = jnp.round(mv_z)
        mv_scales, mv_means = jnp.split(self.mv_prior_decoder(mv_z_hat), 2,
                                        axis=-1)
        mv_y_q = jnp.round(mv_y - mv_means)
        mv_y_hat = mv_y_q + mv_means

        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, _ = self.motion_compensation(ref_frame, ref_feature, mv_hat)

        y = self.contextual_encoder(x, c1, c2, c3)
        z = self.contextual_hyper_prior_encoder(y)
        z_hat = jnp.round(z)
        scales, means = self.y_gaussian_params(z_hat, c1, c2, c3)
        y_q = jnp.round(y - means)
        y_hat = y_q + means

        res = self.contextual_decoder(y_hat, c2, c3)
        feature, recon = self.recon_generation_net(res, c1)
        return {
            "mv_z_hat": mv_z_hat, "z_hat": z_hat,
            "mv_y_q": mv_y_q, "mv_scales": mv_scales,
            "y_q": y_q, "scales": scales,
            "x_hat": jnp.clip(recon, 0.0, 1.0),
            "feature": feature,
        }

    # decode-side stages

    def decode_mv_params(self, mv_z_hat):
        mv_scales, mv_means = jnp.split(self.mv_prior_decoder(mv_z_hat), 2,
                                        axis=-1)
        return mv_scales, mv_means

    def decode_motion_stage(self, mv_y_hat, ref_frame, ref_feature, z_hat):
        mv_hat = self.mv_decoder(mv_y_hat)
        c1, c2, c3, _ = self.motion_compensation(ref_frame, ref_feature, mv_hat)
        scales, means = self.y_gaussian_params(z_hat, c1, c2, c3)
        return scales, means, (c1, c2, c3)

    def decode_recon_stage(self, y_hat, contexts):
        c1, c2, c3 = contexts
        res = self.contextual_decoder(y_hat, c2, c3)
        feature, recon = self.recon_generation_net(res, c1)
        return jnp.clip(recon, 0.0, 1.0), feature


class _TcmEntropyParameter(nn.Module):
    channel_M: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, params):
        M = self.channel_M
        p = conv(M * 10 // 3, 3, 1, name="c1", dtype=self.dtype)(params)
        p = leaky_relu(p)
        p = conv(M * 8 // 3, 3, 1, name="c2", dtype=self.dtype)(p)
        p = leaky_relu(p)
        return conv(M * 2, 3, 1, name="c3", dtype=self.dtype)(p)

"""DMC — the DCVC-DC P-frame conditional video codec (north-star model).

Parity target: DCVC-DC/src/models/video_model.py:26-628 — dual latent
branches (motion + contextual) each with a four-part quad-tree prior, latent
temporal priors (ref_y / ref_mv_y), offset-diversity motion compensation,
periodic feature-adaptor cycling (frame_idx%4 -> [0,1,0,2]) and enc/dec-side
vector quant steps with 64-point fine q tables.

DPB contract (video_model.py:616-622): {ref_frame, ref_feature,
ref_mv_feature, ref_y, ref_mv_y} — here a dict of NHWC arrays (entries may
be None on the first P-frame after an I-frame).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import (
    DepthConvBlock,
    ResBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
    UNet,
    conv,
    leaky_relu,
)
from ..ops.warp import bilinear_down2, crop_lrtb, flow_warp, get_padding_size
from . import priors
from .intra_dc import build_fine_q_tables, pad_for_y
from .video_net import (
    FeatureExtractor,
    HyperDec,
    HyperEnc,
    HyperEncReduced,
    MESpynet,
    MultiScaleContextFusion,
    OffsetDiversity,
)

# channel plan (video_model.py:19-23)
G_CH = {"1x": 48, "2x": 64, "4x": 96, "8x": 96, "16x": 128}


class MvEnc(nn.Module):
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, context, quant_step):
        ch = self.channel
        out = ResidualBlockWithStride(ch, 2, name="enc1_rbs", dtype=self.dtype)(x)
        out = DepthConvBlock(ch, name="enc1_dcb", dtype=self.dtype)(out)
        out = out * quant_step
        out = ResidualBlockWithStride(ch, 2, name="enc2", dtype=self.dtype)(out)
        adaptor_0 = DepthConvBlock(ch, name="adaptor_0", dtype=self.dtype)
        adaptor_1 = DepthConvBlock(ch, name="adaptor_1", dtype=self.dtype)
        if self.is_initializing():
            # materialize both context branches (reference builds both nets)
            adaptor_1(jnp.concatenate(
                [out, context if context is not None else jnp.zeros_like(out)],
                axis=-1))
        if context is None:
            out = adaptor_0(out)
        else:
            out = adaptor_1(jnp.concatenate([out, context], axis=-1))
        out = ResidualBlockWithStride(ch, 2, name="enc3_rbs", dtype=self.dtype)(out)
        out = DepthConvBlock(ch, name="enc3_dcb", dtype=self.dtype)(out)
        return conv(ch, 3, 2, name="enc3_down", dtype=self.dtype)(out)


class MvDec(nn.Module):
    output_channel: int = 2
    channel: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, quant_step):
        ch = self.channel
        f = DepthConvBlock(ch, name="dec1_dcb1", dtype=self.dtype)(x)
        f = ResidualBlockUpsample(ch, 2, name="dec1_up1", dtype=self.dtype)(f)
        f = DepthConvBlock(ch, name="dec1_dcb2", dtype=self.dtype)(f)
        f = ResidualBlockUpsample(ch, 2, name="dec1_up2", dtype=self.dtype)(f)
        feature = DepthConvBlock(ch, name="dec1_dcb3", dtype=self.dtype)(f)
        out = ResidualBlockUpsample(ch, 2, name="dec2", dtype=self.dtype)(feature)
        out = out * quant_step
        out = DepthConvBlock(ch, name="dec3_dcb", dtype=self.dtype)(out)
        mv = SubpelConv(self.output_channel, 2, 1, name="dec3_up",
                        dtype=self.dtype)(out)
        return mv, feature


class ContextualEncoder(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, context1, context2, context3, quant_step):
        c2, c4, c8, c16 = G_CH["2x"], G_CH["4x"], G_CH["8x"], G_CH["16x"]
        f = conv(c2, 3, 2, name="conv1", dtype=self.dtype)(
            jnp.concatenate([x, context1], axis=-1))
        f = ResBlock(c2 * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res1", dtype=self.dtype)(
            jnp.concatenate([f, context2], axis=-1))
        f = f * quant_step
        f = conv(c4, 3, 2, name="conv2", dtype=self.dtype)(f)
        f = ResBlock(c4 * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res2", dtype=self.dtype)(
            jnp.concatenate([f, context3], axis=-1))
        f = conv(c8, 3, 2, name="conv3", dtype=self.dtype)(f)
        return conv(c16, 3, 2, name="conv4", dtype=self.dtype)(f)


class ContextualDecoder(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, context2, context3, quant_step):
        c2, c4, c8, c16 = G_CH["2x"], G_CH["4x"], G_CH["8x"], G_CH["16x"]
        f = SubpelConv(c8, 2, 3, name="up1", dtype=self.dtype)(x)
        f = SubpelConv(c4, 2, 3, name="up2", dtype=self.dtype)(f)
        f = ResBlock(c4 * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res1", dtype=self.dtype)(
            jnp.concatenate([f, context3], axis=-1))
        f = SubpelConv(c2, 2, 3, name="up3", dtype=self.dtype)(f)
        f = f * quant_step
        f = ResBlock(c2 * 2, slope=0.1, end_with_relu=True, bottleneck=True,
                     name="res2", dtype=self.dtype)(
            jnp.concatenate([f, context2], axis=-1))
        return SubpelConv(32, 2, 3, name="up4", dtype=self.dtype)(f)


class ReconGeneration(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, ctx, res):
        c1 = G_CH["1x"]
        f = conv(c1, 3, 1, name="first_conv", dtype=self.dtype)(
            jnp.concatenate([ctx, res], axis=-1))
        f = UNet(c1, block2=False, name="unet_1", dtype=self.dtype)(f)
        feature = UNet(c1, block2=False, name="unet_2", dtype=self.dtype)(f)
        recon = conv(3, 3, 1, name="recon_conv", dtype=self.dtype)(feature)
        return feature, recon


class DMC(nn.Module):
    anchor_num: int = 4
    warp_chunks: int = 1  # sequential warp chunks for HBM-tight configs
    # OffsetDiversity knobs: group_num < 16 linearly cuts the dominant
    # per-map gather cost (model-config change — NOT checkpoint-compatible
    # with the reference's 16 groups); od_warp_mode None -> env
    # DCVC_TPU_OD_WARP (see ops/warp.py:tile_warp)
    od_group_num: int = 16
    od_warp_mode: str | None = None
    # motion-compensation warps (warpframe + context1/2/3 feature warps,
    # reference video_model.py:200-214): same mode grammar as od_warp_mode
    # (ops/warp.py:resolve_warp_fn). None -> exact. These flows are the
    # DECODED motion field (smooth by construction), so the block warp's
    # within-window-exact contract is a natural fit; RD-gate before
    # defaulting (RDNOTES.md).
    mc_warp_mode: str | None = None
    # SPyNet pyramid-warp mode (video_net.py:MESpynet); None -> exact
    me_warp_mode: str | None = None
    dtype: jnp.dtype | None = None

    def setup(self):
        c1, c16 = G_CH["1x"], G_CH["16x"]
        ch_mv = 64
        self.channel_mv = ch_mv
        self.optic_flow = MESpynet(me_warp_mode=self.me_warp_mode,
                                   dtype=self.dtype)
        self.align = OffsetDiversity(in_channel=c1,
                                     group_num=self.od_group_num,
                                     warp_chunks=self.warp_chunks,
                                     warp_mode=self.od_warp_mode,
                                     dtype=self.dtype)

        self.mv_encoder = MvEnc(ch_mv, dtype=self.dtype)
        self.mv_hyper_prior_encoder = HyperEnc(64, dtype=self.dtype)
        self.mv_hyper_prior_decoder = HyperDec(ch_mv, dtype=self.dtype)
        self.mv_y_prior_fusion_adaptor_0 = DepthConvBlock(ch_mv * 2, dtype=self.dtype)
        self.mv_y_prior_fusion_adaptor_1 = DepthConvBlock(ch_mv * 2, dtype=self.dtype)
        self.mv_y_prior_fusion_1 = DepthConvBlock(ch_mv * 3, dtype=self.dtype)
        self.mv_y_prior_fusion_2 = DepthConvBlock(ch_mv * 3, dtype=self.dtype)
        self.mv_y_spatial_prior_adaptor_1 = conv(ch_mv * 3, 1, dtype=self.dtype)
        self.mv_y_spatial_prior_adaptor_2 = conv(ch_mv * 3, 1, dtype=self.dtype)
        self.mv_y_spatial_prior_adaptor_3 = conv(ch_mv * 3, 1, dtype=self.dtype)
        self.mv_y_spatial_prior_1 = DepthConvBlock(ch_mv * 3, dtype=self.dtype)
        self.mv_y_spatial_prior_2 = DepthConvBlock(ch_mv * 3, dtype=self.dtype)
        self.mv_y_spatial_prior_3 = DepthConvBlock(ch_mv * 2, dtype=self.dtype)
        self.mv_decoder = MvDec(2, ch_mv, dtype=self.dtype)

        self.feature_adaptor_I = conv(c1, 3, 1, dtype=self.dtype)
        self.feature_adaptor = [conv(c1, 1, 1, dtype=self.dtype)
                                for _ in range(3)]
        self.feature_extractor = FeatureExtractor(dtype=self.dtype)
        self.context_fusion_net = MultiScaleContextFusion(dtype=self.dtype)

        self.contextual_encoder = ContextualEncoder(dtype=self.dtype)
        self.contextual_hyper_prior_encoder = HyperEncReduced(c16, dtype=self.dtype)
        self.contextual_hyper_prior_decoder = HyperDec(c16, dtype=self.dtype)
        self.temporal_prior_encoder_1 = conv(G_CH["8x"], 3, 2, dtype=self.dtype)
        self.temporal_prior_encoder_2 = conv(c16, 3, 2, dtype=self.dtype)
        self.y_prior_fusion_adaptor_0 = DepthConvBlock(c16 * 3, dtype=self.dtype)
        self.y_prior_fusion_adaptor_1 = DepthConvBlock(c16 * 3, dtype=self.dtype)
        self.y_prior_fusion_1 = DepthConvBlock(c16 * 3, dtype=self.dtype)
        self.y_prior_fusion_2 = DepthConvBlock(c16 * 3, dtype=self.dtype)
        self.y_spatial_prior_adaptor_1 = conv(c16 * 3, 1, dtype=self.dtype)
        self.y_spatial_prior_adaptor_2 = conv(c16 * 3, 1, dtype=self.dtype)
        self.y_spatial_prior_adaptor_3 = conv(c16 * 3, 1, dtype=self.dtype)
        self.y_spatial_prior_1 = DepthConvBlock(c16 * 3, dtype=self.dtype)
        self.y_spatial_prior_2 = DepthConvBlock(c16 * 3, dtype=self.dtype)
        self.y_spatial_prior_3 = DepthConvBlock(c16 * 2, dtype=self.dtype)
        self.contextual_decoder = ContextualDecoder(dtype=self.dtype)
        self.recon_generation_net = ReconGeneration(dtype=self.dtype)

        self.bit_estimator_z = BitEstimator(c16)
        self.bit_estimator_z_mv = BitEstimator(64)

        ones = nn.initializers.ones
        self.mv_y_q_basic_enc = self.param("mv_y_q_basic_enc", ones, (1, 1, 1, ch_mv))
        self.mv_y_q_scale_enc = self.param("mv_y_q_scale_enc", ones,
                                           (self.anchor_num, 1, 1, 1))
        self.mv_y_q_basic_dec = self.param("mv_y_q_basic_dec", ones, (1, 1, 1, ch_mv))
        self.mv_y_q_scale_dec = self.param("mv_y_q_scale_dec", ones,
                                           (self.anchor_num, 1, 1, 1))
        self.y_q_basic_enc = self.param("y_q_basic_enc", ones,
                                        (1, 1, 1, G_CH["2x"] * 2))
        self.y_q_scale_enc = self.param("y_q_scale_enc", ones,
                                        (self.anchor_num, 1, 1, 1))
        self.y_q_basic_dec = self.param("y_q_basic_dec", ones, (1, 1, 1, G_CH["2x"]))
        self.y_q_scale_dec = self.param("y_q_scale_dec", ones,
                                        (self.anchor_num, 1, 1, 1))

    # ---- prior plumbing ----

    def _spatial_prior(self, x, which: str):
        if which == "mv":
            x = self.mv_y_spatial_prior_1(x)
            x = self.mv_y_spatial_prior_2(x)
            return self.mv_y_spatial_prior_3(x)
        x = self.y_spatial_prior_1(x)
        x = self.y_spatial_prior_2(x)
        return self.y_spatial_prior_3(x)

    def spatial_prior_fns(self, which: str):
        adaptors = ([self.mv_y_spatial_prior_adaptor_1,
                     self.mv_y_spatial_prior_adaptor_2,
                     self.mv_y_spatial_prior_adaptor_3] if which == "mv" else
                    [self.y_spatial_prior_adaptor_1,
                     self.y_spatial_prior_adaptor_2,
                     self.y_spatial_prior_adaptor_3])

        def chunks(adaptor):
            def fn(params):
                return jnp.split(self._spatial_prior(adaptor(params), which),
                                 8, axis=-1)
            return fn
        return [chunks(a) for a in adaptors]

    def mv_prior_param_decoder(self, mv_z_hat, ref_mv_y, slice_shape):
        p = self.mv_hyper_prior_decoder(mv_z_hat)
        p = crop_lrtb(p, slice_shape)
        if self.is_initializing():
            ref0 = ref_mv_y if ref_mv_y is not None else jnp.zeros_like(p)
            self.mv_y_prior_fusion_adaptor_1(
                jnp.concatenate([p, ref0], axis=-1))
        if ref_mv_y is None:
            p = self.mv_y_prior_fusion_adaptor_0(p)
        else:
            p = self.mv_y_prior_fusion_adaptor_1(
                jnp.concatenate([p, ref_mv_y], axis=-1))
        return self.mv_y_prior_fusion_2(self.mv_y_prior_fusion_1(p))

    def res_prior_param_decoder(self, z_hat, ref_y, context3, slice_shape):
        hier = crop_lrtb(self.contextual_hyper_prior_decoder(z_hat), slice_shape)
        t = self.temporal_prior_encoder_1(context3)
        t = leaky_relu(t, 0.1)
        t = self.temporal_prior_encoder_2(t)
        if self.is_initializing():
            ref0 = ref_y if ref_y is not None else jnp.zeros_like(hier)
            self.y_prior_fusion_adaptor_1(
                jnp.concatenate([t, hier, ref0], axis=-1))
        if ref_y is None:
            p = self.y_prior_fusion_adaptor_0(
                jnp.concatenate([t, hier], axis=-1))
        else:
            p = self.y_prior_fusion_adaptor_1(
                jnp.concatenate([t, hier, ref_y], axis=-1))
        return self.y_prior_fusion_2(self.y_prior_fusion_1(p))

    # ---- motion pipeline ----

    def multi_scale_feature_extractor(self, dpb, index):
        """``index`` may be a traced int32 scalar: the adaptor cycling
        (frame_idx%4 -> [0,1,0,2], video_model.py:343-351) is selected by a
        computed index so ONE compiled executable serves every frame phase —
        a static index would compile (and program-swap) 4 variants, which
        costs seconds per swap on remote-tunnel TPU."""
        if dpb["ref_feature"] is None:
            feature = self.feature_adaptor_I(dpb["ref_frame"])
            if self.is_initializing():
                for adaptor in self.feature_adaptor:
                    adaptor(jnp.zeros_like(feature))
        else:
            feats = jnp.stack([a(dpb["ref_feature"])
                               for a in self.feature_adaptor])
            sel = jnp.asarray([0, 1, 0, 2], jnp.int32)[
                jnp.asarray(index, jnp.int32) % 4]
            feature = feats[sel]
            if self.is_initializing():
                self.feature_adaptor_I(dpb["ref_frame"])
        return self.feature_extractor(feature)

    def motion_compensation(self, dpb, mv, index):
        from ..ops.warp import resolve_warp_fn

        warp = resolve_warp_fn(self.mc_warp_mode or "exact")
        warpframe = warp(dpb["ref_frame"], mv)
        mv2 = bilinear_down2(mv) / 2
        mv3 = bilinear_down2(mv2) / 2
        ref_f1, ref_f2, ref_f3 = self.multi_scale_feature_extractor(dpb, index)
        context1_init = warp(ref_f1, mv)
        context1 = self.align(
            ref_f1, jnp.concatenate([context1_init, warpframe, mv], axis=-1), mv)
        context2 = warp(ref_f2, mv2)
        context3 = warp(ref_f3, mv3)
        context1, context2, context3 = self.context_fusion_net(
            context1, context2, context3)
        return context1, context2, context3, warpframe

    def get_recon_and_feature(self, y_hat, context1, context2, context3, y_q_dec):
        res = self.contextual_decoder(y_hat, context2, context3, y_q_dec)
        feature, x_hat = self.recon_generation_net(res, context1)
        return jnp.clip(x_hat, 0.0, 1.0), feature

    # ---- full paths ----

    def _mv_branch_analysis(self, x, dpb, mv_y_q_enc):
        est_mv = self.optic_flow(x, dpb["ref_frame"])
        mv_y = self.mv_encoder(est_mv, dpb["ref_mv_feature"], mv_y_q_enc)
        mv_y_pad, slice_shape = pad_for_y(mv_y)
        mv_z = self.mv_hyper_prior_encoder(mv_y_pad)
        return mv_y, mv_z, slice_shape

    def __call__(self, x, dpb, q_scales, frame_idx=0,
                 quant_mode: str = "round"):
        """forward_one_frame (video_model.py:559-628). q_scales is a dict of
        scalars: mv_y_q_enc/dec, y_q_enc/dec."""
        quant = priors.resolve_quant(quant_mode)
        mv_y_q_enc = self.mv_y_q_basic_enc * q_scales["mv_enc"]
        mv_y_q_dec = self.mv_y_q_basic_dec * q_scales["mv_dec"]
        y_q_enc = self.y_q_basic_enc * q_scales["y_enc"]
        y_q_dec = self.y_q_basic_dec * q_scales["y_dec"]

        mv_y, mv_z, slice_shape = self._mv_branch_analysis(x, dpb, mv_y_q_enc)
        mv_z_hat = quant(mv_z)
        mv_params = self.mv_prior_param_decoder(mv_z_hat, dpb["ref_mv_y"],
                                                slice_shape)
        mv_y_res, mv_y_q, mv_y_hat, mv_scales_hat = priors.forward_four_part_prior(
            mv_y, mv_params, self.spatial_prior_fns("mv"), quant=quant)
        mv_hat, mv_feature = self.mv_decoder(mv_y_hat, mv_y_q_dec)
        context1, context2, context3, _ = self.motion_compensation(
            dpb, mv_hat, frame_idx)

        y = self.contextual_encoder(x, context1, context2, context3, y_q_enc)
        y_pad, slice_shape = pad_for_y(y)
        z = self.contextual_hyper_prior_encoder(y_pad)
        z_hat = quant(z)
        params = self.res_prior_param_decoder(z_hat, dpb["ref_y"], context3,
                                              slice_shape)
        y_res, y_q, y_hat, scales_hat = priors.forward_four_part_prior(
            y, params, self.spatial_prior_fns("y"), quant=quant)
        x_hat, feature = self.get_recon_and_feature(
            y_hat, context1, context2, context3, y_q_dec)

        pixel_num = x.shape[1] * x.shape[2]
        if quant_mode == "noise":
            # training rate surrogate: bits from noise-quantized residuals
            # while the recon path stays STE (HEM video_model.py:466-471)
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
        return {
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp": bpp,
            "bit": jnp.sum(bpp) * pixel_num,
            "dpb": {
                "ref_frame": x_hat,
                "ref_feature": feature,
                "ref_mv_feature": mv_feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }

    def compress_device(self, x, dpb, q_scales, frame_idx=0):
        mv_y_q_enc = self.mv_y_q_basic_enc * q_scales["mv_enc"]
        mv_y_q_dec = self.mv_y_q_basic_dec * q_scales["mv_dec"]
        y_q_enc = self.y_q_basic_enc * q_scales["y_enc"]
        y_q_dec = self.y_q_basic_dec * q_scales["y_dec"]

        mv_y, mv_z, slice_shape = self._mv_branch_analysis(x, dpb, mv_y_q_enc)
        mv_z_hat = jnp.round(mv_z)
        mv_params = self.mv_prior_param_decoder(mv_z_hat, dpb["ref_mv_y"],
                                                slice_shape)
        mv_q_w, mv_s_w, mv_y_hat = priors.forward_four_part_prior(
            mv_y, mv_params, self.spatial_prior_fns("mv"), write=True)
        mv_hat, mv_feature = self.mv_decoder(mv_y_hat, mv_y_q_dec)
        context1, context2, context3, _ = self.motion_compensation(
            dpb, mv_hat, frame_idx)

        y = self.contextual_encoder(x, context1, context2, context3, y_q_enc)
        y_pad, slice_shape = pad_for_y(y)
        z = self.contextual_hyper_prior_encoder(y_pad)
        z_hat = jnp.round(z)
        params = self.res_prior_param_decoder(z_hat, dpb["ref_y"], context3,
                                              slice_shape)
        y_q_w, s_w, y_hat = priors.forward_four_part_prior(
            y, params, self.spatial_prior_fns("y"), write=True)
        x_hat, feature = self.get_recon_and_feature(
            y_hat, context1, context2, context3, y_q_dec)
        return {
            "mv_z_hat": mv_z_hat,
            "z_hat": z_hat,
            "mv_y_q_planes": tuple(mv_q_w),
            "mv_scales_planes": tuple(mv_s_w),
            "y_q_planes": tuple(y_q_w),
            "scales_planes": tuple(s_w),
            "dpb": {
                "ref_frame": x_hat,
                "ref_feature": feature,
                "ref_mv_feature": mv_feature,
                "ref_y": y_hat,
                "ref_mv_y": mv_y_hat,
            },
        }

    # ---- decode-side jittable stages (host rANS between them) ----

    def decode_mv_prior(self, mv_z_hat, ref_mv_y, y_height: int, y_width: int):
        slice_shape = get_padding_size(y_height, y_width, 4)
        return self.mv_prior_param_decoder(mv_z_hat, ref_mv_y, slice_shape)

    def decode_scales_step(self, params, y_hat_so_far, step: int, which: str):
        return priors.four_part_decode_scales(
            params, y_hat_so_far, self.spatial_prior_fns(which), step)

    def decode_motion_stage(self, mv_params, mv_sofar, mv_q_dec_scale, dpb,
                            z_hat, frame_idx, y_height: int, y_width: int):
        """mv latent -> contexts + y-branch prior params."""
        mv_y_hat = priors.four_part_finalize(mv_params, mv_sofar)
        mv_y_q_dec = self.mv_y_q_basic_dec * mv_q_dec_scale
        mv_hat, mv_feature = self.mv_decoder(mv_y_hat, mv_y_q_dec)
        context1, context2, context3, _ = self.motion_compensation(
            dpb, mv_hat, frame_idx)
        slice_shape = get_padding_size(y_height, y_width, 4)
        params = self.res_prior_param_decoder(z_hat, dpb["ref_y"], context3,
                                              slice_shape)
        return params, (context1, context2, context3), mv_y_hat, mv_feature

    def decode_recon_stage(self, params, y_hat_so_far, contexts, y_q_dec_scale):
        y_hat = priors.four_part_finalize(params, y_hat_so_far)
        y_q_dec = self.y_q_basic_dec * y_q_dec_scale
        context1, context2, context3 = contexts
        x_hat, feature = self.get_recon_and_feature(
            y_hat, context1, context2, context3, y_q_dec)
        return x_hat, feature, y_hat


def get_dmc_q_tables(params) -> dict:
    """Fine (64-point) q tables for all four q_scale vectors."""
    p = params["params"]
    return {name: build_fine_q_tables(np.asarray(p[name]))
            for name in ("mv_y_q_scale_enc", "mv_y_q_scale_dec",
                         "y_q_scale_enc", "y_q_scale_dec")}

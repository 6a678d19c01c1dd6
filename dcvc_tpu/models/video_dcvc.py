"""DCVC_net — the gen-1 conditional-coding P-frame codec (NeurIPS'21).

Parity target: DCVC/src/models/DCVC_net.py:15-487 — GDN transforms, MV +
contextual latents each with hyper prior AND a type-A masked-conv pixel-AR
context model, single-scale warped context with refinement, state = bare
reference frame.

The AR entropy model's forward (estimated-bits) path is a single masked
conv on device; real coding uses the wavefront reformulation in
ar_coding.py (3H+W steps instead of H*W).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import SubpelConv, conv, conv_kernel_init, leaky_relu
from ..layers.gdn import GDN
from ..ops.warp import flow_warp
from . import priors
from .ar_coding import masked_conv_mask_a
from .video_net import MESpynet


def _deconv(features: int, kernel: int = 3, stride: int = 2,
            name: str | None = None, dtype=None):
    from ..layers.blocks import deconv

    return deconv(features, kernel, stride, name=name, dtype=dtype)


class Gen1ResBlock(nn.Module):
    """Pre-act ReLU residual block (DCVC/src/models/video_net.py:159-187)."""

    out_ch: int
    kernel: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        import jax

        out = jax.nn.relu(x)
        out = conv(self.out_ch, self.kernel, 1, name="conv1", dtype=self.dtype)(out)
        out = jax.nn.relu(out)
        out = conv(self.out_ch, self.kernel, 1, name="conv2", dtype=self.dtype)(out)
        if x.shape[-1] != self.out_ch:
            return conv(self.out_ch, 1, 1, name="adapt", dtype=self.dtype)(x) + out
        return x + out


class ResBlockLeaky01(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        out = conv(ch, 3, 1, name="conv1", dtype=self.dtype)(x)
        out = leaky_relu(out, 0.1)
        out = conv(ch, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = leaky_relu(out, 0.1)
        return x + out


class MaskedConv2d(nn.Module):
    """Type-A causal 5x5 conv (the AR context model)."""

    out_ch: int
    kernel: int = 5
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        k = self.kernel
        in_ch = x.shape[-1]
        w = self.param("kernel", conv_kernel_init, (k, k, in_ch, self.out_ch))
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        mask = jnp.asarray(masked_conv_mask_a(k))[:, :, None, None]
        import jax

        return jax.lax.conv_general_dilated(
            x, w * mask, (1, 1), [(k // 2, k // 2)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b


class EntropyParams1x1(nn.Module):
    """Three 1x1 convs with inner LeakyReLU (DCVC_net.py:147-169)."""

    channel: int  # base channel M (or mv)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        M = self.channel
        x = conv(M * 10 // 3, 1, 1, name="c1", dtype=self.dtype)(x)
        x = leaky_relu(x)
        x = conv(M * 8 // 3, 1, 1, name="c2", dtype=self.dtype)(x)
        x = leaky_relu(x)
        return conv(M * 2, 1, 1, name="c3", dtype=self.dtype)(x)


class DCVCNet(nn.Module):
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
        self.bit_estimator_z = BitEstimator(N)
        self.bit_estimator_z_mv = BitEstimator(N)

        self.feature_extract_conv = conv(N, 3, 1)
        self.feature_extract_res = Gen1ResBlock(N, 3, dtype=self.dtype)
        self.context_refine_res = Gen1ResBlock(N, 3, dtype=self.dtype)
        self.context_refine_conv = conv(N, 3, 1)

        self.mv_encoder_convs = [conv(mv, 3, 2) for _ in range(4)]
        self.mv_encoder_gdns = [GDN(mv) for _ in range(3)]
        self.mv_decoder_deconvs = [_deconv(mv) for _ in range(3)] + [_deconv(2)]
        self.mv_decoder_igdns = [GDN(mv, inverse=True) for _ in range(3)]
        self.mv_refine_convs = ([conv(64, 3, 1) for _ in range(6)]
                                + [conv(2, 3, 1)])

        self.contextual_encoder_convs = [conv(N, 5, 2), conv(N, 5, 2),
                                         conv(N, 5, 2), conv(M, 5, 2)]
        self.contextual_encoder_gdns = [GDN(N) for _ in range(3)]
        self.contextual_encoder_res = [ResBlockLeaky01(dtype=self.dtype)
                                       for _ in range(2)]
        self.contextual_decoder1_subpels = [SubpelConv(N, 2, 3)
                                            for _ in range(4)]
        self.contextual_decoder1_igdns = [GDN(N, inverse=True)
                                          for _ in range(3)]
        self.contextual_decoder1_res = [ResBlockLeaky01(dtype=self.dtype)
                                        for _ in range(2)]
        self.contextual_decoder2_conv1 = conv(N, 3, 1)
        self.contextual_decoder2_res = [Gen1ResBlock(N, 3, dtype=self.dtype)
                                        for _ in range(2)]
        self.contextual_decoder2_conv2 = conv(3, 3, 1)

        self.prior_encoder_convs = [conv(N, 3, 1), conv(N, 5, 2), conv(N, 5, 2)]
        self.prior_decoder_deconvs = [_deconv(M, 5, 2), _deconv(M, 5, 2),
                                      _deconv(M, 3, 1)]
        self.mv_prior_encoder_convs = [conv(N, 3, 1), conv(N, 5, 2),
                                       conv(N, 5, 2)]
        self.mv_prior_decoder_deconvs = [_deconv(N, 5, 2),
                                         _deconv(N * 3 // 2, 5, 2),
                                         _deconv(mv * 2, 3, 1)]
        self.temporal_prior_convs = [conv(N, 5, 2), conv(N, 5, 2),
                                     conv(N, 5, 2), conv(M, 5, 2)]
        self.temporal_prior_gdns = [GDN(N), GDN(N), GDN(N)]

        self.auto_regressive = MaskedConv2d(2 * M, 5, dtype=self.dtype)
        self.auto_regressive_mv = MaskedConv2d(2 * mv, 5, dtype=self.dtype)
        self.entropy_parameters = EntropyParams1x1(M, dtype=self.dtype)
        self.entropy_parameters_mv = EntropyParams1x1(mv, dtype=self.dtype)

    # ---- sub-nets ----

    def mv_encoder(self, mv):
        x = mv
        for i in range(3):
            x = self.mv_encoder_convs[i](x)
            x = self.mv_encoder_gdns[i](x)
        return self.mv_encoder_convs[3](x)

    def mv_decoder_part1(self, mv_y_hat):
        x = mv_y_hat
        for i in range(3):
            x = self.mv_decoder_deconvs[i](x)
            x = self.mv_decoder_igdns[i](x)
        return self.mv_decoder_deconvs[3](x)

    def mv_refine(self, ref, mv):
        x = jnp.concatenate([mv, ref], axis=-1)
        for c in self.mv_refine_convs[:-1]:
            x = leaky_relu(c(x), 0.1)
        return self.mv_refine_convs[-1](x) + mv

    def motion_compensation(self, ref, mv):
        from ..ops.warp import resolve_warp_fn

        feat = self.feature_extract_res(self.feature_extract_conv(ref))
        pred = resolve_warp_fn(self.mc_warp_mode or "exact")(feat, mv)
        return self.context_refine_conv(self.context_refine_res(pred))

    def contextual_encoder(self, x, context):
        f = jnp.concatenate([x, context], axis=-1)
        for i in range(3):
            f = self.contextual_encoder_convs[i](f)
            f = self.contextual_encoder_gdns[i](f)
            if i < 2:
                f = self.contextual_encoder_res[i](f)
        return self.contextual_encoder_convs[3](f)

    def contextual_decoder_part1(self, y_hat):
        f = self.contextual_decoder1_subpels[0](y_hat)
        f = self.contextual_decoder1_igdns[0](f)
        f = self.contextual_decoder1_subpels[1](f)
        f = self.contextual_decoder1_igdns[1](f)
        f = self.contextual_decoder1_res[0](f)
        f = self.contextual_decoder1_subpels[2](f)
        f = self.contextual_decoder1_igdns[2](f)
        f = self.contextual_decoder1_res[1](f)
        return self.contextual_decoder1_subpels[3](f)

    def contextual_decoder_part2(self, feat, context):
        f = self.contextual_decoder2_conv1(
            jnp.concatenate([feat, context], axis=-1))
        f = self.contextual_decoder2_res[0](f)
        f = self.contextual_decoder2_res[1](f)
        return self.contextual_decoder2_conv2(f)

    def prior_encoder(self, y):
        f = leaky_relu(self.prior_encoder_convs[0](y))
        f = leaky_relu(self.prior_encoder_convs[1](f))
        return self.prior_encoder_convs[2](f)

    def prior_decoder(self, z_hat):
        f = leaky_relu(self.prior_decoder_deconvs[0](z_hat))
        f = leaky_relu(self.prior_decoder_deconvs[1](f))
        return self.prior_decoder_deconvs[2](f)

    def mv_prior_encoder(self, mv_y):
        f = leaky_relu(self.mv_prior_encoder_convs[0](mv_y))
        f = leaky_relu(self.mv_prior_encoder_convs[1](f))
        return self.mv_prior_encoder_convs[2](f)

    def mv_prior_decoder(self, z_hat):
        f = leaky_relu(self.mv_prior_decoder_deconvs[0](z_hat))
        f = leaky_relu(self.mv_prior_decoder_deconvs[1](f))
        return self.mv_prior_decoder_deconvs[2](f)

    def temporal_prior_encoder(self, context):
        f = context
        for i in range(3):
            f = self.temporal_prior_convs[i](f)
            f = self.temporal_prior_gdns[i](f)
        return self.temporal_prior_convs[3](f)

    # ---- full paths ----

    def __call__(self, referframe, input_image, quant_mode: str = "round"):
        quant = priors.resolve_quant(quant_mode)
        est_mv = self.optic_flow(input_image, referframe)
        mv_feature = self.mv_encoder(est_mv)
        mv_z = self.mv_prior_encoder(mv_feature)
        mv_z_hat = quant(mv_z)
        params_mv = self.mv_prior_decoder(mv_z_hat)

        quant_mv = quant(mv_feature)
        ctx_mv = self.auto_regressive_mv(quant_mv)
        gp_mv = self.entropy_parameters_mv(
            jnp.concatenate([params_mv, ctx_mv], axis=-1))
        means_mv, scales_mv = jnp.split(gp_mv, 2, axis=-1)

        mv_up = self.mv_decoder_part1(quant_mv)
        mv_refined = self.mv_refine(referframe, mv_up)
        context = self.motion_compensation(referframe, mv_refined)
        temporal_prior = self.temporal_prior_encoder(context)

        y = self.contextual_encoder(input_image, context)
        z = self.prior_encoder(y)
        z_hat = quant(z)
        params = self.prior_decoder(z_hat)

        y_hat = quant(y)
        ctx_y = self.auto_regressive(y_hat)
        gp = self.entropy_parameters(
            jnp.concatenate([temporal_prior, params, ctx_y], axis=-1))
        means, scales = jnp.split(gp, 2, axis=-1)

        feat = self.contextual_decoder_part1(y_hat)
        recon = self.contextual_decoder_part2(feat, context)

        pixel_num = input_image.shape[0] * input_image.shape[1] * input_image.shape[2]
        if quant_mode == "noise":
            # training rate surrogate: bits from noise-quantized residuals
            # while the recon path stays STE (HEM video_model.py:466-471)
            noise = lambda t: priors.quant_noise(t, self.make_rng("noise"))
            y_for_bit = noise(y - means)
            mv_for_bit = noise(mv_feature - means_mv)
            z_for_bit, mv_z_for_bit = noise(z), noise(mv_z)
        else:
            y_for_bit, mv_for_bit = y_hat - means, quant_mv - means_mv
            z_for_bit, mv_z_for_bit = z_hat, mv_z_hat
        bits_y = bits.y_laplace_bits(y_for_bit, scales)
        bits_mv = bits.y_laplace_bits(mv_for_bit, scales_mv)
        bits_z = bits.z_bits(z_for_bit, self.bit_estimator_z)
        bits_mv_z = bits.z_bits(mv_z_for_bit, self.bit_estimator_z_mv)
        bpp_y = jnp.sum(bits_y) / pixel_num
        bpp_z = jnp.sum(bits_z) / pixel_num
        bpp_mv_y = jnp.sum(bits_mv) / pixel_num
        bpp_mv_z = jnp.sum(bits_mv_z) / pixel_num
        bpp = bpp_y + bpp_z + bpp_mv_y + bpp_mv_z
        return {
            "bpp_mv_y": bpp_mv_y, "bpp_mv_z": bpp_mv_z,
            "bpp_y": bpp_y, "bpp_z": bpp_z, "bpp": bpp,
            "recon_image": jnp.clip(recon, 0.0, 1.0),
            "context": context,
            "bit": bpp * pixel_num,
        }

    # ---- device halves for real coding (AR loop runs on host) ----

    def encode_analysis(self, referframe, input_image):
        """Everything before the MV AR loop."""
        est_mv = self.optic_flow(input_image, referframe)
        mv_feature = self.mv_encoder(est_mv)
        mv_z = self.mv_prior_encoder(mv_feature)
        mv_z_hat = jnp.round(mv_z)
        params_mv = self.mv_prior_decoder(mv_z_hat)
        return mv_feature, mv_z_hat, params_mv

    def motion_and_context(self, referframe, mv_y_hat):
        mv_up = self.mv_decoder_part1(mv_y_hat)
        mv_refined = self.mv_refine(referframe, mv_up)
        context = self.motion_compensation(referframe, mv_refined)
        return context, self.temporal_prior_encoder(context)

    def residual_analysis(self, input_image, context):
        y = self.contextual_encoder(input_image, context)
        z = self.prior_encoder(y)
        z_hat = jnp.round(z)
        return y, z_hat, self.prior_decoder(z_hat)

    def synthesis(self, y_hat, context):
        feat = self.contextual_decoder_part1(y_hat)
        recon = self.contextual_decoder_part2(feat, context)
        return jnp.clip(recon, 0.0, 1.0)


def extract_ar_nets(params: dict, which: str):
    """Pull masked-conv + entropy-parameter weights for the host AR loop."""
    from .ar_coding import ArNets

    p = params["params"]
    ar = p["auto_regressive_mv" if which == "mv" else "auto_regressive"]
    ep = p["entropy_parameters_mv" if which == "mv" else "entropy_parameters"]
    ep_ws = [np.asarray(ep[f"c{i}"]["kernel"]).reshape(
        ep[f"c{i}"]["kernel"].shape[-2], -1) for i in (1, 2, 3)]
    ep_bs = [np.asarray(ep[f"c{i}"]["bias"]) for i in (1, 2, 3)]
    return ArNets(np.asarray(ar["kernel"]), np.asarray(ar["bias"]),
                  ep_ws, ep_bs)

"""IntraNoAR — the DCVC-DC generation I-frame codec.

Parity target: DCVC-DC/src/models/image_model.py:16-252 (IntraEncoder /
IntraDecoder / IntraNoAR with four-part quad-tree prior, UNet2 refinement,
enc/dec-side vector quant steps with 64-point log-interpolated fine q tables).

TPU-first: NHWC flax module, jittable sub-functions; latent padding to
multiples of 4 (pad_for_y) is replicate-pad under jit with static shapes.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import (
    DepthConvBlock2,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    UNet,
    conv,
    leaky_relu,
)
from ..ops.warp import crop_lrtb, get_padding_size, replicate_pad
from . import priors


def pad_for_y(y):
    """Replicate-pad latent to a multiple of 4 (common_model.py:70-86)."""
    H, W = y.shape[1], y.shape[2]
    pad = get_padding_size(H, W, 4)
    return replicate_pad(y, pad), pad


class IntraEncoder(nn.Module):
    N: int
    ch_a: int = 128  # 2x-scale width (reference: 128)
    ch_b: int = 192  # 4x-scale width (reference: 192)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, quant_step):
        x = ResidualBlockWithStride(self.ch_a, 2, name="enc1_rbs", dtype=self.dtype)(x)
        x = DepthConvBlock2(self.ch_a, name="enc1_dcb", dtype=self.dtype)(x)
        x = x * quant_step
        x = ResidualBlockWithStride(self.ch_b, 2, name="enc2_rbs1", dtype=self.dtype)(x)
        x = DepthConvBlock2(self.ch_b, name="enc2_dcb1", dtype=self.dtype)(x)
        x = ResidualBlockWithStride(self.N, 2, name="enc2_rbs2", dtype=self.dtype)(x)
        x = DepthConvBlock2(self.N, name="enc2_dcb2", dtype=self.dtype)(x)
        return conv(self.N, 3, 2, name="enc2_down", dtype=self.dtype)(x)


class IntraDecoder(nn.Module):
    N: int
    ch_a: int = 128
    ch_b: int = 192
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, quant_step):
        x = DepthConvBlock2(self.N, name="dec1_dcb1", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(self.N, 2, name="dec1_up1", dtype=self.dtype)(x)
        x = DepthConvBlock2(self.N, name="dec1_dcb2", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(self.ch_b, 2, name="dec1_up2", dtype=self.dtype)(x)
        x = DepthConvBlock2(self.ch_b, name="dec1_dcb3", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(self.ch_a, 2, name="dec1_up3", dtype=self.dtype)(x)
        x = x * quant_step
        x = DepthConvBlock2(self.ch_a, name="dec2_dcb", dtype=self.dtype)(x)
        return ResidualBlockUpsample(16, 2, name="dec2_up", dtype=self.dtype)(x)


class IntraHyperEnc(nn.Module):
    N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y):
        x = DepthConvBlock2(self.N, name="dcb", dtype=self.dtype)(y)
        x = conv(self.N, 3, 2, name="down1", dtype=self.dtype)(x)
        x = leaky_relu(x)
        return conv(self.N, 3, 2, name="down2", dtype=self.dtype)(x)


class IntraHyperDec(nn.Module):
    N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z_hat):
        x = ResidualBlockUpsample(self.N, 2, name="up1", dtype=self.dtype)(z_hat)
        x = ResidualBlockUpsample(self.N, 2, name="up2", dtype=self.dtype)(x)
        return DepthConvBlock2(self.N, name="dcb", dtype=self.dtype)(x)


class IntraNoAR(nn.Module):
    N: int = 256
    anchor_num: int = 4
    ch_a: int = 128
    ch_b: int = 192
    dtype: jnp.dtype | None = None

    def setup(self):
        N = self.N
        self.enc = IntraEncoder(N, self.ch_a, self.ch_b, dtype=self.dtype)
        self.hyper_enc = IntraHyperEnc(N, dtype=self.dtype)
        self.hyper_dec = IntraHyperDec(N, dtype=self.dtype)
        self.y_prior_fusion_1 = DepthConvBlock2(N * 2, dtype=self.dtype)
        self.y_prior_fusion_2 = DepthConvBlock2(N * 3, dtype=self.dtype)
        self.y_spatial_prior_adaptor_1 = conv(N * 3, 1, dtype=self.dtype)
        self.y_spatial_prior_adaptor_2 = conv(N * 3, 1, dtype=self.dtype)
        self.y_spatial_prior_adaptor_3 = conv(N * 3, 1, dtype=self.dtype)
        self.y_spatial_prior_1 = DepthConvBlock2(N * 3, dtype=self.dtype)
        self.y_spatial_prior_2 = DepthConvBlock2(N * 2, dtype=self.dtype)
        self.y_spatial_prior_3 = DepthConvBlock2(N * 2, dtype=self.dtype)
        self.dec = IntraDecoder(N, self.ch_a, self.ch_b, dtype=self.dtype)
        self.refine_unet = UNet(16, block2=True, dtype=self.dtype)
        self.refine_conv = conv(3, 3, dtype=self.dtype)
        self.bit_estimator_z = BitEstimator(N)
        ones = nn.initializers.ones
        self.q_basic_enc = self.param("q_basic_enc", ones, (1, 1, 1, self.ch_a))
        self.q_scale_enc = self.param("q_scale_enc", ones, (self.anchor_num, 1, 1, 1))
        self.q_basic_dec = self.param("q_basic_dec", ones, (1, 1, 1, self.ch_a))
        self.q_scale_dec = self.param("q_scale_dec", ones, (self.anchor_num, 1, 1, 1))

    # -- prior plumbing --

    def _spatial_prior(self, x):
        x = self.y_spatial_prior_1(x)
        x = self.y_spatial_prior_2(x)
        return self.y_spatial_prior_3(x)

    def spatial_prior_fns(self):
        def chunks(adaptor):
            def fn(params):
                out = self._spatial_prior(adaptor(params))
                return jnp.split(out, 8, axis=-1)
            return fn
        return [chunks(self.y_spatial_prior_adaptor_1),
                chunks(self.y_spatial_prior_adaptor_2),
                chunks(self.y_spatial_prior_adaptor_3)]

    def prior_params(self, z_hat, slice_shape):
        params = self.hyper_dec(z_hat)
        params = self.y_prior_fusion_2(self.y_prior_fusion_1(params))
        return crop_lrtb(params, slice_shape)

    def refine(self, x):
        return self.refine_conv(self.refine_unet(x))

    def synthesize(self, y_hat, q_dec):
        return self.refine(self.dec(y_hat, q_dec))

    # -- public paths --

    def __call__(self, x, q_enc_scale, q_dec_scale, quant_mode: str = "round"):
        quant = priors.resolve_quant(quant_mode)
        curr_q_enc = self.q_basic_enc * q_enc_scale
        curr_q_dec = self.q_basic_dec * q_dec_scale

        y = self.enc(x, curr_q_enc)
        y_pad, pad = pad_for_y(y)
        z = self.hyper_enc(y_pad)
        z_hat = quant(z)
        params = self.prior_params(z_hat, pad)
        y_res, y_q, y_hat, scales_hat = priors.forward_four_part_prior(
            y, params, self.spatial_prior_fns(), quant=quant)
        x_hat = self.synthesize(y_hat, curr_q_dec)

        if quant_mode == "noise":
            # training rate surrogate (HEM common_model.py:47-50)
            y_q = priors.quant_noise(y_res, self.make_rng("noise"))
            z_hat = priors.quant_noise(z, self.make_rng("noise"))
        bits_y = bits.y_gaussian_bits(y_q, scales_hat)
        bits_z = bits.z_bits(z_hat, self.bit_estimator_z)
        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(bits_y, axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(bits_z, axis=(1, 2, 3)) / pixel_num
        return {
            "x_hat": x_hat,
            "bit": jnp.sum(bpp_y + bpp_z) * pixel_num,
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
        }

    def compress_device(self, x, q_enc_scale, q_dec_scale):
        curr_q_enc = self.q_basic_enc * q_enc_scale
        curr_q_dec = self.q_basic_dec * q_dec_scale
        y = self.enc(x, curr_q_enc)
        y_pad, pad = pad_for_y(y)
        z = self.hyper_enc(y_pad)
        z_hat = jnp.round(z)
        params = self.prior_params(z_hat, pad)
        y_q_w, s_w, y_hat = priors.forward_four_part_prior(
            y, params, self.spatial_prior_fns(), write=True)
        x_hat = jnp.clip(self.synthesize(y_hat, curr_q_dec), 0.0, 1.0)
        return {
            "z_hat": z_hat,
            "y_q_planes": tuple(y_q_w),
            "scales_planes": tuple(s_w),
            "x_hat": x_hat,
        }

    # decode-side jittable steps (host rANS between them)

    def decode_prior(self, z_hat, y_height: int, y_width: int):
        pad = get_padding_size(y_height, y_width, 4)
        return self.prior_params(z_hat, pad)

    def decode_scales_step(self, params, y_hat_so_far, step: int):
        return priors.four_part_decode_scales(
            params, y_hat_so_far, self.spatial_prior_fns(), step)

    def decode_synthesis(self, params, y_hat_so_far, q_dec_scale):
        y_hat = priors.four_part_finalize(params, y_hat_so_far)
        curr_q_dec = self.q_basic_dec * q_dec_scale
        return jnp.clip(self.synthesize(y_hat, curr_q_dec), 0.0, 1.0)


def build_fine_q_tables(q_scale: np.ndarray, num: int = 64) -> np.ndarray:
    """64-point log-interpolated fine q table (image_model.py:158-167)."""
    q_scale = np.asarray(q_scale).reshape(-1)
    return np.exp(np.linspace(np.log(q_scale[0]), np.log(q_scale[-1]), num))

"""EVC intra codec family (L/M/S encoder x decoder grid + hyperprior).

Parity targets: EVC/src/models/image_model.py:16-258 (EVC + the LL/LM/LS/
SL/ML/SS/MM/MS variants), EVC/src/models/layers.py:227-253 (enc/dec stacks),
EVC/src/models/hyperprior.py:81-107 (hyper + dual prior nets),
EVC/src/models/common_model.py (dual-prior driver, quant-step handling).

TPU-first: NHWC flax modules; analysis/synthesis and the dual-prior steps
are jittable; real entropy coding happens in the runtime wrapper
(models/runtime.py) with device-side symbolization.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import (
    DepthConvBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
    conv,
    leaky_relu,
)
from ..layers.evc_blocks import (
    DepthConvBlockUpsample,
    EvcDepthConvBlock,
)
from ..ops.math import lower_bound
from . import priors

EVC_CHANNEL_GRID = {
    "L": (192, 192, 192, 192),
    "M": (128, 128, 192, 192),
    "S": (64, 64, 128, 192),
}


class EvcEncoder(nn.Module):
    channels: Sequence[int]  # (c2x, c4x, c8x, c16x)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c2, c4, c8, c16 = self.channels
        x = ResidualBlockWithStride(c2, 2, name="down1", dtype=self.dtype)(x)
        x = EvcDepthConvBlock(c2, name="block1", dtype=self.dtype)(x)
        x = ResidualBlockWithStride(c4, 2, name="down2", dtype=self.dtype)(x)
        x = EvcDepthConvBlock(c4, name="block2", dtype=self.dtype)(x)
        x = ResidualBlockWithStride(c8, 2, name="down3", dtype=self.dtype)(x)
        x = EvcDepthConvBlock(c8, name="block3", dtype=self.dtype)(x)
        return conv(c16, 3, 2, name="down4", dtype=self.dtype)(x)


class EvcDecoder(nn.Module):
    channels: Sequence[int]
    out_ch: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c2, c4, c8, c16 = self.channels
        x = EvcDepthConvBlock(c16, name="block0", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(c8, 2, name="up1", dtype=self.dtype)(x)
        x = EvcDepthConvBlock(c8, name="block1", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(c4, 2, name="up2", dtype=self.dtype)(x)
        x = EvcDepthConvBlock(c4, name="block2", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(c2, 2, name="up3", dtype=self.dtype)(x)
        x = EvcDepthConvBlock(c2, name="block3", dtype=self.dtype)(x)
        return SubpelConv(self.out_ch, 2, 1, name="up4", dtype=self.dtype)(x)


class EvcHyperEnc(nn.Module):
    N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y):
        # hyper/prior stacks use the DC-style DepthConvBlock
        # (EVC/src/models/hyperprior.py:7-74), not the enc/dec EVC variant
        x = DepthConvBlock(self.N, name="block", dtype=self.dtype)(y)
        x = conv(self.N, 3, 2, name="down1", dtype=self.dtype)(x)
        x = leaky_relu(x)
        return conv(self.N, 3, 2, name="down2", dtype=self.dtype)(x)


class EvcHyperDec(nn.Module):
    N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z_hat):
        x = DepthConvBlockUpsample(self.N, name="up1", dtype=self.dtype)(z_hat)
        x = DepthConvBlockUpsample(self.N, name="up2", dtype=self.dtype)(x)
        return DepthConvBlock(self.N, name="block", dtype=self.dtype)(x)


class EvcPriorFusion(nn.Module):
    N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DepthConvBlock(self.N * 2, name="block1", dtype=self.dtype)(x)
        return DepthConvBlock(self.N * 3, name="block2", dtype=self.dtype)(x)


class EvcSpatialPrior(nn.Module):
    N: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DepthConvBlock(self.N * 3, name="block1", dtype=self.dtype)(x)
        x = DepthConvBlock(self.N * 2, name="block2", dtype=self.dtype)(x)
        return DepthConvBlock(self.N * 2, name="block3", dtype=self.dtype)(x)


class EVCIntra(nn.Module):
    """Intra codec with independently sized encoder/decoder (e.g. EVC_SS)."""

    enc_channels: Sequence[int] = EVC_CHANNEL_GRID["L"]
    dec_channels: Sequence[int] = EVC_CHANNEL_GRID["L"]
    N: int = 192
    anchor_num: int = 4
    dtype: jnp.dtype | None = None

    def setup(self):
        self.enc = EvcEncoder(self.enc_channels, dtype=self.dtype)
        self.dec = EvcDecoder(self.dec_channels, dtype=self.dtype)
        self.hyper_enc = EvcHyperEnc(self.N, dtype=self.dtype)
        self.hyper_dec = EvcHyperDec(self.N, dtype=self.dtype)
        self.y_prior_fusion = EvcPriorFusion(self.N, dtype=self.dtype)
        self.y_spatial_prior = EvcSpatialPrior(self.N, dtype=self.dtype)
        self.bit_estimator_z = BitEstimator(self.N)
        self.q_basic = self.param("q_basic", nn.initializers.ones, (1, 1, 1, self.N))
        self.q_scale = self.param("q_scale", nn.initializers.ones,
                                  (self.anchor_num, 1, 1, 1))

    def get_curr_q(self, q_scale):
        return lower_bound(self.q_basic, 0.5) * q_scale

    def spatial_prior_chunks(self, params):
        out = self.y_spatial_prior(params)
        return jnp.split(out, 4, axis=-1)  # scales_0, means_0, scales_1, means_1

    def prior_params(self, z_hat):
        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        return priors.separate_prior(params)  # q_step, scales, means

    def synthesize(self, y_hat, q_scale):
        curr_q = self.get_curr_q(q_scale)
        return self.dec(y_hat * curr_q)

    def z_cdf(self, v):
        return self.bit_estimator_z(v)

    def __call__(self, x, q_scale, quant_mode: str = "round"):
        """Differentiable forward (write_stream=0 path): x_hat + bit costs."""
        quant = priors.resolve_quant(quant_mode)
        curr_q = self.get_curr_q(q_scale)
        y = self.enc(x) / curr_q
        z = self.hyper_enc(y)
        z_hat = quant(z)
        q_step, scales, means = self.prior_params(z_hat)
        y_res, y_q, y_hat, scales_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.spatial_prior_chunks, quant=quant)
        x_hat = self.dec(y_hat * curr_q)

        if quant_mode == "noise":
            # training rate surrogate (HEM common_model.py:47-50)
            y_q = priors.quant_noise(y_res, self.make_rng("noise"))
            z_hat = priors.quant_noise(z, self.make_rng("noise"))
        bits_y = bits.y_gaussian_bits(y_q, jnp.clip(scales_hat, 0.11, 1e10))
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

    def compress_device(self, x, q_scale):
        """Device half of compress: everything up to the symbol planes."""
        curr_q = self.get_curr_q(q_scale)
        y = self.enc(x) / curr_q
        z = self.hyper_enc(y)
        z_hat = jnp.round(z)
        q_step, scales, means = self.prior_params(z_hat)
        y_q_w0, y_q_w1, s_w0, s_w1, y_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.spatial_prior_chunks, write=True)
        x_hat = jnp.clip(self.dec(y_hat * curr_q), 0.0, 1.0)
        return {
            "z_hat": z_hat,
            "y_q_planes": (y_q_w0, y_q_w1),
            "scales_planes": (s_w0, s_w1),
            "x_hat": x_hat,
        }

    def dual_scales_step1(self, q_step, scales, means, half0, half1):
        return priors.dual_decode_scales(means, scales, q_step, half0, half1,
                                         self.spatial_prior_chunks, 1)


def make_evc(variant: str = "LL", N: int = 192, dtype=None) -> EVCIntra:
    """variant "XY": encoder size X, decoder size Y, X/Y in {L, M, S}."""
    return EVCIntra(enc_channels=EVC_CHANNEL_GRID[variant[0]],
                    dec_channels=EVC_CHANNEL_GRID[variant[1]],
                    N=N, dtype=dtype)

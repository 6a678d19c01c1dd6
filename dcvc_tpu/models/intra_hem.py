"""IntraNoAR (HEM generation): residual enc/dec + dual prior + UNet refine.

Parity target: DCVC-HEM/src/models/image_model.py:15-171 — single-model
continuous rate via scalar q_scale (rounded to ushort in the header),
gaussian y-latents.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..layers.blocks import conv
from ..ops.math import lower_bound
from . import priors
from .hem_common import (
    Conv3Stack,
    HemDecoder,
    HemEncoder,
    HemHyperDec,
    HemHyperEnc,
    HemUNet,
)


class IntraNoARHem(nn.Module):
    N: int = 192
    anchor_num: int = 4
    dtype: jnp.dtype | None = None

    def setup(self):
        N = self.N
        self.enc = HemEncoder(N, dtype=self.dtype)
        self.dec = HemDecoder(N, 16, dtype=self.dtype)
        self.refine_unet = HemUNet(16, dtype=self.dtype)
        self.refine_conv = conv(3, 3, dtype=self.dtype)
        self.hyper_enc = HemHyperEnc(N, dtype=self.dtype)
        self.hyper_dec = HemHyperDec(N, dtype=self.dtype)
        self.y_prior_fusion = Conv3Stack((N * 3, N * 3, N * 3), dtype=self.dtype)
        self.y_spatial_prior = Conv3Stack((N * 3, N * 3, N * 2), dtype=self.dtype)
        self.bit_estimator_z = BitEstimator(N)
        self.q_basic = self.param("q_basic", nn.initializers.ones, (1, 1, 1, N))
        self.q_scale = self.param(
            "q_scale",
            lambda key, shape: jnp.asarray([1.541, 1.083, 0.729, 0.500]
                                           ).reshape(shape),
            (self.anchor_num, 1, 1, 1))

    def get_curr_q(self, q_scale):
        return lower_bound(self.q_basic, 0.5) * q_scale

    def spatial_prior_chunks(self, params):
        return jnp.split(self.y_spatial_prior(params), 4, axis=-1)

    def prior_params(self, z_hat):
        return priors.separate_prior(self.y_prior_fusion(self.hyper_dec(z_hat)))

    def synthesize(self, y_hat, q_scale):
        curr_q = self.get_curr_q(q_scale)
        x = self.dec(y_hat * curr_q)
        return self.refine_conv(self.refine_unet(x))

    def __call__(self, x, q_scale, quant_mode: str = "round"):
        quant = priors.resolve_quant(quant_mode)
        curr_q = self.get_curr_q(q_scale)
        y = self.enc(x) / curr_q
        z = self.hyper_enc(y)
        z_hat = quant(z)
        q_step, scales, means = self.prior_params(z_hat)
        y_res, y_q, y_hat, scales_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.spatial_prior_chunks, quant=quant)
        x_hat = self.refine_conv(self.refine_unet(self.dec(y_hat * curr_q)))

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
        curr_q = self.get_curr_q(q_scale)
        y = self.enc(x) / curr_q
        z = self.hyper_enc(y)
        z_hat = jnp.round(z)
        q_step, scales, means = self.prior_params(z_hat)
        y_q_w0, y_q_w1, s_w0, s_w1, y_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.spatial_prior_chunks, write=True)
        x_hat = jnp.clip(
            self.refine_conv(self.refine_unet(self.dec(y_hat * curr_q))), 0, 1)
        return {
            "z_hat": z_hat,
            "y_q_planes": (y_q_w0, y_q_w1),
            "scales_planes": (s_w0, s_w1),
            "x_hat": x_hat,
        }

    def dual_scales_step1(self, q_step, scales, means, half0, half1):
        return priors.dual_decode_scales(means, scales, q_step, half0, half1,
                                         self.spatial_prior_chunks, 1)

"""EVC scalable encoder: N small encoders + RD-cost encoder selection.

Parity target: EVC/src/models/scalable_encoder_model.py:15-285 — scalable_add
running-mean latent combination (detached prefix), per-rate lambda table
{0.0022, 0.0050, 0.012, 0.027}, argmin-cost encoder id chosen at encode
time and signalled to the decoder.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..entropy import bits
from ..entropy.bit_estimator import BitEstimator
from ..ops.math import lower_bound
from . import priors
from .evc import (
    EVC_CHANNEL_GRID,
    EvcDecoder,
    EvcEncoder,
    EvcHyperDec,
    EvcHyperEnc,
    EvcPriorFusion,
    EvcSpatialPrior,
)

LMBDAS = (0.0022, 0.0050, 0.012, 0.027)


def scalable_add(ys: jnp.ndarray) -> jnp.ndarray:
    """[S, B, H, W, C] -> running mean with detached prefix (:15-24)."""
    S = ys.shape[0]
    ys_detach = jax.lax.stop_gradient(ys)
    out = []
    for i in range(S):
        prefix = ys_detach[:i].sum(0) if i > 0 else 0.0
        out.append((prefix + ys[i]) / (i + 1))
    return jnp.stack(out)


class ScalableEVC(nn.Module):
    """Scale_EVC: scalable encoder bank + one (large) decoder."""

    enc_num: int = 4
    enc_channels: tuple = EVC_CHANNEL_GRID["S"]
    dec_channels: tuple = EVC_CHANNEL_GRID["L"]
    N: int = 192
    anchor_num: int = 4
    dtype: jnp.dtype | None = None

    def setup(self):
        self.encs = [EvcEncoder(self.enc_channels, dtype=self.dtype)
                     for _ in range(self.enc_num)]
        self.dec = EvcDecoder(self.dec_channels, dtype=self.dtype)
        self.hyper_enc = EvcHyperEnc(self.N, dtype=self.dtype)
        self.hyper_dec = EvcHyperDec(self.N, dtype=self.dtype)
        self.y_prior_fusion = EvcPriorFusion(self.N, dtype=self.dtype)
        self.y_spatial_prior = EvcSpatialPrior(self.N, dtype=self.dtype)
        self.bit_estimator_z = BitEstimator(self.N)
        self.q_basic = self.param("q_basic", nn.initializers.ones,
                                  (1, 1, 1, self.N))
        self.q_scale = self.param("q_scale", nn.initializers.ones,
                                  (self.anchor_num, 1, 1, 1))

    def get_curr_q(self, q_scale):
        return lower_bound(self.q_basic, 0.5) * q_scale

    def spatial_prior_chunks(self, params):
        return jnp.split(self.y_spatial_prior(params), 4, axis=-1)

    def multi_encode(self, x, q_scale, forward_enc_id: int | None = None):
        curr_q = self.get_curr_q(q_scale)
        y_list = []
        for enc_id in range(self.enc_num):
            y_list.append(self.encs[enc_id](x))
            if forward_enc_id is not None and forward_enc_id == enc_id:
                break
        y_out = scalable_add(jnp.stack(y_list))
        if forward_enc_id is not None:
            y = y_out[forward_enc_id]
            xs = x
        else:
            S, B, H, W, C = y_out.shape
            y = y_out.reshape(S * B, H, W, C)
            xs = jnp.concatenate([x] * len(y_list), axis=0)
        return xs, y / curr_q, curr_q

    def __call__(self, x, q_scale, forward_enc_id: int | None = None,
                 quant_mode: str = "round"):
        quant = priors.quant_ste if quant_mode == "ste" else priors.quant_round
        xs, y, curr_q = self.multi_encode(x, q_scale, forward_enc_id)
        z = self.hyper_enc(y)
        z_hat = quant(z)
        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        q_step, scales, means = priors.separate_prior(params)
        _, y_q, y_hat, scales_hat = priors.forward_dual_prior(
            y, means, scales, q_step, self.spatial_prior_chunks, quant=quant)
        x_hat = self.dec(y_hat * curr_q)

        bits_y = bits.y_gaussian_bits(y_q, jnp.clip(scales_hat, 0.11, 1e10))
        bits_z = bits.z_bits(z_hat, self.bit_estimator_z)
        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(bits_y, axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(bits_z, axis=(1, 2, 3)) / pixel_num
        mse = jnp.mean((xs - x_hat) ** 2, axis=(1, 2, 3))
        return {
            "x_hat": x_hat,
            "mse": mse,
            "bit": (bpp_y + bpp_z) * pixel_num,
            "bpp": bpp_y + bpp_z,
            "bpp_y": bpp_y,
            "bpp_z": bpp_z,
        }


    # ---- real-coding surface (EvcCodecRuntime-compatible, given enc_id) ----

    def prior_params(self, z_hat):
        params = self.y_prior_fusion(self.hyper_dec(z_hat))
        return priors.separate_prior(params)

    def synthesize(self, y_hat, q_scale):
        return self.dec(y_hat * self.get_curr_q(q_scale))

    def compress_device(self, x, q_scale, forward_enc_id: int = 0):
        _, y, curr_q = self.multi_encode(x, q_scale, forward_enc_id)
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


def choose_encoder_id(mse, bpp, rate_idx: int) -> int:
    """RD-cost argmin over the encoder bank (:149-157)."""
    lmbda = LMBDAS[rate_idx]
    import numpy as np

    cost = lmbda * 255 * 255 * np.asarray(mse) + np.asarray(bpp)
    return int(cost.argmin())

"""Shared HEM-generation networks (NHWC, flax).

Parity targets: DCVC-HEM/src/models/video_net.py:226-276 (enc/dec + hyper
factories), :149-223 (SELayer / ConvBlockResidual / UNet),
:279-307 (DeQuantizationModule), and the conv3-stack prior nets
(video_model.py:150-213, image_model.py:25-39).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers.blocks import (
    ResBlock,
    ResidualBlock,
    ResidualBlockUpsample,
    ResidualBlockWithStride,
    SubpelConv,
    conv,
    leaky_relu,
    max_pool2,
)


class HemEncoder(nn.Module):
    """get_enc_dec_models enc half: 16x down residual stack."""

    channel: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ch = self.channel
        x = ResidualBlockWithStride(ch, 2, name="d1", dtype=self.dtype)(x)
        x = ResidualBlock(ch, name="r1", dtype=self.dtype)(x)
        x = ResidualBlockWithStride(ch, 2, name="d2", dtype=self.dtype)(x)
        x = ResidualBlock(ch, name="r2", dtype=self.dtype)(x)
        x = ResidualBlockWithStride(ch, 2, name="d3", dtype=self.dtype)(x)
        x = ResidualBlock(ch, name="r3", dtype=self.dtype)(x)
        return conv(ch, 3, 2, name="d4", dtype=self.dtype)(x)


class HemDecoder(nn.Module):
    channel: int
    out_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ch = self.channel
        x = ResidualBlock(ch, name="r0", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(ch, 2, name="u1", dtype=self.dtype)(x)
        x = ResidualBlock(ch, name="r1", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(ch, 2, name="u2", dtype=self.dtype)(x)
        x = ResidualBlock(ch, name="r2", dtype=self.dtype)(x)
        x = ResidualBlockUpsample(ch, 2, name="u3", dtype=self.dtype)(x)
        x = ResidualBlock(ch, name="r3", dtype=self.dtype)(x)
        return SubpelConv(self.out_ch, 2, 1, name="u4", dtype=self.dtype)(x)


class HemHyperEnc(nn.Module):
    z_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y):
        z = conv(self.z_ch, 3, 1, name="c1", dtype=self.dtype)(y)
        z = leaky_relu(z)
        z = conv(self.z_ch, 3, 1, name="c2", dtype=self.dtype)(z)
        z = leaky_relu(z)
        z = conv(self.z_ch, 3, 2, name="c3", dtype=self.dtype)(z)
        z = leaky_relu(z)
        z = conv(self.z_ch, 3, 1, name="c4", dtype=self.dtype)(z)
        z = leaky_relu(z)
        return conv(self.z_ch, 3, 2, name="c5", dtype=self.dtype)(z)


class HemHyperDec(nn.Module):
    """z -> 2*y_ch prior features (video_net.py:264-274)."""

    y_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z_hat):
        y = self.y_ch
        p = conv(y, 3, 1, name="c1", dtype=self.dtype)(z_hat)
        p = leaky_relu(p)
        p = SubpelConv(y, 2, 1, name="u1", dtype=self.dtype)(p)
        p = leaky_relu(p)
        p = conv(y * 3 // 2, 3, 1, name="c2", dtype=self.dtype)(p)
        p = leaky_relu(p)
        p = SubpelConv(y * 3 // 2, 2, 1, name="u2", dtype=self.dtype)(p)
        p = leaky_relu(p)
        return conv(y * 2, 3, 1, name="c3", dtype=self.dtype)(p)


class Conv3Stack(nn.Module):
    """N conv3x3 layers with LeakyReLU(0.2) between (prior fusion/spatial)."""

    features: Sequence[int]
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, f in enumerate(self.features):
            if i > 0:
                x = leaky_relu(x, 0.2)
            x = conv(f, 3, 1, name=f"c{i}", dtype=self.dtype)(x)
        return x


class SELayer(nn.Module):
    reduction: int = 16
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        ch = x.shape[-1]
        y = jnp.mean(x, axis=(1, 2))  # [B, C]
        y = nn.Dense(max(ch // self.reduction, 1), use_bias=False, name="fc1",
                     dtype=self.dtype)(y)
        y = jax.nn.relu(y)
        y = nn.Dense(ch, use_bias=False, name="fc2", dtype=self.dtype)(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :]


class ConvBlockResidual(nn.Module):
    out_ch: int
    se_layer: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        y = conv(self.out_ch, 3, 1, name="conv1", dtype=self.dtype)(x)
        y = leaky_relu(y, 0.01)
        y = conv(self.out_ch, 3, 1, name="conv2", dtype=self.dtype)(y)
        if self.se_layer:
            y = SELayer(name="se", dtype=self.dtype)(y)
        return y + conv(self.out_ch, 1, 1, name="up_dim", dtype=self.dtype)(x)


class HemUNet(nn.Module):
    """UNet of ConvBlockResidual + ReLU ResBlock bottleneck (video_net.py:182)."""

    out_ch: int = 64
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x1 = ConvBlockResidual(32, name="conv1", dtype=self.dtype)(x)
        x2 = max_pool2(x1)
        x2 = ConvBlockResidual(64, name="conv2", dtype=self.dtype)(x2)
        x3 = max_pool2(x2)
        x3 = ConvBlockResidual(128, name="conv3", dtype=self.dtype)(x3)
        for i in range(4):
            x3 = ResBlock(128, slope=0.0, name=f"context_refine_{i}",
                          dtype=self.dtype)(x3)
        d3 = SubpelConv(64, 2, 1, name="up3", dtype=self.dtype)(x3)
        d3 = ConvBlockResidual(64, name="up_conv3", dtype=self.dtype)(
            jnp.concatenate([x2, d3], axis=-1))
        d2 = SubpelConv(32, 2, 1, name="up2", dtype=self.dtype)(d3)
        d2 = ConvBlockResidual(self.out_ch, name="up_conv2", dtype=self.dtype)(
            jnp.concatenate([x1, d2], axis=-1))
        return d2


class DeQuantizationModule(nn.Module):
    """Post-filter used by the CANF-VC fork (video_net.py:291-307)."""

    out_channels: int = 3
    num_filters: int = 64
    num_layers: int = 8
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        c1 = conv(self.num_filters, 3, 1, name="conv1", dtype=self.dtype)(x)
        h = c1
        for i in range(self.num_layers):
            r = conv(self.num_filters, 3, 1, name=f"res{i}_c1", dtype=self.dtype)(h)
            r = leaky_relu(r, 0.2)
            r = conv(self.num_filters, 3, 1, name=f"res{i}_c2", dtype=self.dtype)(r)
            h = h + r
        c2 = conv(self.num_filters, 3, 1, name="conv2", dtype=self.dtype)(h) + c1
        return conv(self.out_channels, 3, 1, name="conv3", dtype=self.dtype)(c2) + x

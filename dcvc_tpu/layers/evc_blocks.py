"""EVC-generation layer variants (NHWC, flax.linen).

Parity target: EVC/src/models/layers.py:160-253 and EVC/src/models/
hyperprior.py:7-78. EVC's DepthConv activates after all three convs
(slope 0.01), its ConvFFN uses ReLU with a plain 4x expansion, and the
hyper decoder upsamples with DepthConvBlock + subpel conv.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import SubpelConv, conv, conv_kernel_init, leaky_relu


class EvcDepthConv(nn.Module):
    out_ch: int
    depth_kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.stride != 1:
            identity = nn.Conv(self.out_ch, (2, 2), strides=(2, 2), padding="VALID",
                               name="adaptor", dtype=self.dtype, kernel_init=conv_kernel_init)(x)
        elif in_ch != self.out_ch:
            identity = conv(self.out_ch, 1, 1, name="adaptor", dtype=self.dtype)(x)
        else:
            identity = x
        out = conv(in_ch, 1, self.stride, name="conv1", dtype=self.dtype)(x)
        out = leaky_relu(out)
        k = self.depth_kernel
        out = nn.Conv(in_ch, (k, k), padding=[(k // 2, k // 2)] * 2,
                      feature_group_count=in_ch, name="depth_conv",
                      dtype=self.dtype, kernel_init=conv_kernel_init)(out)
        out = leaky_relu(out)
        out = conv(self.out_ch, 1, 1, name="conv2", dtype=self.dtype)(out)
        out = leaky_relu(out)
        return out + identity


class EvcConvFFN(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        out = conv(in_ch * 4, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = jax.nn.relu(out)
        out = conv(in_ch, 1, 1, name="conv2", dtype=self.dtype)(out)
        out = jax.nn.relu(out)
        return x + out


class EvcDepthConvBlock(nn.Module):
    out_ch: int
    depth_kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = EvcDepthConv(self.out_ch, self.depth_kernel, self.stride,
                         name="depth_conv", dtype=self.dtype)(x)
        return EvcConvFFN(name="ffn", dtype=self.dtype)(x)


class EvcDepthConvBlockUpsample(nn.Module):
    out_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = EvcDepthConvBlock(self.out_ch, name="block", dtype=self.dtype)(x)
        return SubpelConv(self.out_ch, 2, 1, name="subpel", dtype=self.dtype)(x)


class DepthConvBlockUpsample(nn.Module):
    """DC-style DepthConvBlock + subpel upsample
    (EVC/src/models/hyperprior.py:66-74)."""

    out_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        from .blocks import DepthConvBlock

        x = DepthConvBlock(self.out_ch, name="block", dtype=self.dtype)(x)
        return SubpelConv(self.out_ch, 2, 1, name="subpel", dtype=self.dtype)(x)

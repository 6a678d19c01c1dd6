"""Shared layer zoo for all codec generations (NHWC, flax.linen).

Parity target: the reference layer zoo (DCVC-DC/src/models/layers.py:18-223,
DCVC-DC/src/models/video_net.py:58-214, EVC/src/models/layers.py:160-253).
Topologies and activation slopes match the reference so capabilities (and
ported checkpoints) carry over; layout is NHWC and all blocks are jittable
pure functions of their params.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops.warp import pixel_shuffle


def leaky_relu(x: jnp.ndarray, slope: float = 0.01) -> jnp.ndarray:
    return jax.nn.leaky_relu(x, negative_slope=slope)


# torch nn.Conv2d default init (kaiming_uniform, a=sqrt(5)): var = 1/(3*fan_in).
# Matches the reference's effective init and keeps the gated ConvFFN2 blocks
# numerically bounded at initialization.
conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def conv(features: int, kernel: int = 3, stride: int = 1, name: str | None = None,
         dtype=None) -> nn.Conv:
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=[(kernel // 2, kernel // 2)] * 2, name=name, dtype=dtype,
                   kernel_init=conv_kernel_init)


def deconv(features: int, kernel: int = 3, stride: int = 2,
           name: str | None = None, dtype=None) -> nn.ConvTranspose:
    """torch-parity ConvTranspose2d(k, s, padding=k//2, output_padding=s-1):
    explicit low/high padding (k-1-p, k-1-p+op); converter flips the kernel
    spatially (utils/torch_port.conv_transpose_kernel)."""
    p = kernel // 2
    op = stride - 1
    pad = ((kernel - 1 - p, kernel - 1 - p + op),) * 2
    return nn.ConvTranspose(features, (kernel, kernel), strides=(stride, stride),
                            padding=pad, name=name, dtype=dtype,
                            kernel_init=conv_kernel_init)


class SubpelConv(nn.Module):
    """conv(k) producing out*r^2 channels + pixel shuffle upsample by r."""

    out_ch: int
    r: int = 2
    kernel: int = 1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = conv(self.out_ch * self.r ** 2, self.kernel, 1, name="conv",
                 dtype=self.dtype)(x)
        return pixel_shuffle(x, self.r)


class ResidualBlockWithStride(nn.Module):
    out_ch: int
    stride: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = conv(self.out_ch, 3, self.stride, name="conv1", dtype=self.dtype)(x)
        out = leaky_relu(out)
        out = conv(self.out_ch, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = leaky_relu(out, 0.1)
        if self.stride != 1:
            identity = conv(self.out_ch, 1, self.stride, name="downsample",
                            dtype=self.dtype)(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsample(nn.Module):
    out_ch: int
    upsample: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = SubpelConv(self.out_ch, self.upsample, 1, name="subpel_conv",
                         dtype=self.dtype)(x)
        out = leaky_relu(out)
        out = conv(self.out_ch, 3, 1, name="conv", dtype=self.dtype)(out)
        out = leaky_relu(out, 0.1)
        identity = SubpelConv(self.out_ch, self.upsample, 1, name="upsample",
                              dtype=self.dtype)(x)
        return out + identity


class ResidualBlock(nn.Module):
    out_ch: int
    slope: float = 0.01
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        identity = x
        if x.shape[-1] != self.out_ch:
            identity = conv(self.out_ch, 1, 1, name="adaptor", dtype=self.dtype)(x)
        out = conv(self.out_ch, 3, 1, name="conv1", dtype=self.dtype)(x)
        out = leaky_relu(out, self.slope)
        out = conv(self.out_ch, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = leaky_relu(out, self.slope)
        return out + identity


class ResBlock(nn.Module):
    """Pre-activation residual block (video_net.py:58-76; the HEM/TCM variant
    adds start_from_relu, DCVC-HEM/src/models/video_net.py:74-96)."""

    channel: int
    slope: float = 0.01
    end_with_relu: bool = False
    bottleneck: bool = False
    start_from_relu: bool = True
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        inner = self.channel // 2 if self.bottleneck else self.channel
        out = leaky_relu(x, self.slope) if self.start_from_relu else x
        out = conv(inner, 3, 1, name="conv1", dtype=self.dtype)(out)
        out = leaky_relu(out, self.slope)
        out = conv(self.channel, 3, 1, name="conv2", dtype=self.dtype)(out)
        if self.end_with_relu:
            out = leaky_relu(out, self.slope)
        return x + out


class DepthConv(nn.Module):
    """1x1 -> depthwise kxk -> 1x1 with adaptor shortcut (layers.py:135-163)."""

    out_ch: int
    depth_kernel: int = 3
    stride: int = 1
    slope: float = 0.01
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
        out = leaky_relu(out, self.slope)
        k = self.depth_kernel
        out = nn.Conv(in_ch, (k, k), padding=[(k // 2, k // 2)] * 2,
                      feature_group_count=in_ch, name="depth_conv",
                      dtype=self.dtype, kernel_init=conv_kernel_init)(out)
        out = conv(self.out_ch, 1, 1, name="conv2", dtype=self.dtype)(out)
        return out + identity


class ConvFFN(nn.Module):
    slope: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        internal = max(min(in_ch * 4, 1024), in_ch * 2)
        out = conv(internal, 1, 1, name="conv1", dtype=self.dtype)(x)
        out = leaky_relu(out, self.slope)
        out = conv(in_ch, 1, 1, name="conv2", dtype=self.dtype)(out)
        out = leaky_relu(out, self.slope)
        return x + out


class ConvFFN2(nn.Module):
    """Gated FFN: x1 * LeakyReLU(x2) (layers.py:182-196)."""

    slope: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        internal = in_ch * 2
        out = conv(internal * 2, 1, 1, name="conv", dtype=self.dtype)(x)
        x1, x2 = jnp.split(out, 2, axis=-1)
        out = x1 * leaky_relu(x2, self.slope)
        return x + conv(in_ch, 1, 1, name="conv_out", dtype=self.dtype)(out)


class DepthConvBlock(nn.Module):
    out_ch: int
    depth_kernel: int = 3
    stride: int = 1
    slope_depth_conv: float = 0.01
    slope_ffn: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DepthConv(self.out_ch, self.depth_kernel, self.stride,
                      self.slope_depth_conv, name="depth_conv",
                      dtype=self.dtype)(x)
        return ConvFFN(self.slope_ffn, name="ffn", dtype=self.dtype)(x)


class DepthConvBlock2(nn.Module):
    out_ch: int
    depth_kernel: int = 3
    stride: int = 1
    slope_depth_conv: float = 0.01
    slope_ffn: float = 0.1
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = DepthConv(self.out_ch, self.depth_kernel, self.stride,
                      self.slope_depth_conv, name="depth_conv",
                      dtype=self.dtype)(x)
        return ConvFFN2(self.slope_ffn, name="ffn", dtype=self.dtype)(x)


def max_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.max_pool(x, (2, 2), strides=(2, 2))


def avg_pool2(x: jnp.ndarray) -> jnp.ndarray:
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


class UNet(nn.Module):
    """3-level UNet of DepthConvBlocks (video_net.py:129-214).

    ``block2=True`` selects DepthConvBlock2 (the UNet2 variant used by the
    DC-generation intra refinement)."""

    out_ch: int = 64
    block2: bool = False
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        Block = DepthConvBlock2 if self.block2 else DepthConvBlock
        x1 = Block(32, name="conv1", dtype=self.dtype)(x)
        x2 = max_pool2(x1)
        x2 = Block(64, name="conv2", dtype=self.dtype)(x2)
        x3 = max_pool2(x2)
        x3 = Block(128, name="conv3", dtype=self.dtype)(x3)
        for i in range(4):
            x3 = Block(128, name=f"context_refine_{i}", dtype=self.dtype)(x3)
        d3 = SubpelConv(64, 2, 1, name="up3", dtype=self.dtype)(x3)
        d3 = Block(64, name="up_conv3", dtype=self.dtype)(
            jnp.concatenate([x2, d3], axis=-1))
        d2 = SubpelConv(32, 2, 1, name="up2", dtype=self.dtype)(d3)
        d2 = Block(self.out_ch, name="up_conv2", dtype=self.dtype)(
            jnp.concatenate([x1, d2], axis=-1))
        return d2

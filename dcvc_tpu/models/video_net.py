"""Motion and context networks shared by the video codecs (NHWC, flax).

Parity targets:
  * ME_Spynet / MEBasic (DCVC-DC/src/models/video_net.py:79-126) — 4-level
    pyramid optical flow,
  * OffsetDiversity (DCVC-DC/src/models/video_model.py:26-63) — grouped
    multi-offset deformable warping,
  * FeatureExtractor / MultiScaleContextFusion (video_model.py:66-118),
  * hyper enc/dec factories (video_net.py:217-251).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..layers.blocks import (
    ResBlock,
    SubpelConv,
    avg_pool2,
    conv,
    leaky_relu,
)
from ..ops.warp import bilinear_up2, flow_warp, resolve_warp_fn


class MEBasic(nn.Module):
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        x = jax.nn.relu(conv(32, 7, 1, name="conv1", dtype=self.dtype)(x))
        x = jax.nn.relu(conv(64, 7, 1, name="conv2", dtype=self.dtype)(x))
        x = jax.nn.relu(conv(32, 7, 1, name="conv3", dtype=self.dtype)(x))
        x = jax.nn.relu(conv(16, 7, 1, name="conv4", dtype=self.dtype)(x))
        return conv(2, 7, 1, name="conv5", dtype=self.dtype)(x)


class MESpynet(nn.Module):
    """4-level coarse-to-fine optical flow (im1 = current, im2 = reference)."""

    levels: int = 4
    # pyramid-warp mode (ops/warp.py:resolve_warp_fn); None -> exact.
    # The warped operand feeds the flow residual predictor, so an
    # approximate warp perturbs the ESTIMATED flow rather than the
    # reconstruction directly — gate via od_warp_study dmc "all<spec>".
    me_warp_mode: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, im1, im2):
        from ..ops.warp import resolve_warp_fn

        warp = resolve_warp_fn(self.me_warp_mode or "exact")
        im1_list = [im1]
        im2_list = [im2]
        for _ in range(self.levels - 1):
            im1_list.append(avg_pool2(im1_list[-1]))
            im2_list.append(avg_pool2(im2_list[-1]))

        B, Hc, Wc, _ = im2_list[-1].shape
        flow = jnp.zeros((B, Hc // 2, Wc // 2, 2), im1.dtype)
        for level in range(self.levels):
            flow_up = bilinear_up2(flow) * 2.0
            idx = self.levels - 1 - level
            inp = jnp.concatenate(
                [im1_list[idx], warp(im2_list[idx], flow_up), flow_up],
                axis=-1)
            flow = flow_up + MEBasic(name=f"basic{level}", dtype=self.dtype)(inp)
        return flow


class OffsetDiversity(nn.Module):
    """Deformable-warp generalization: G groups x O offsets with masks."""

    in_channel: int = 48
    offset_num: int = 2
    group_num: int = 16
    max_residue_magnitude: float = 40.0
    head_ch: int = 64
    # >1 processes the G*O warp maps in sequential chunks (lax.scan) to cut
    # peak HBM by ~chunks at full-res; identical numerics
    warp_chunks: int = 1
    # warp mode: None -> env DCVC_TPU_OD_WARP ("exact" default). "tile" or
    # "tile:T,R" uses the approximate row-tile warp (ops/warp.py:tile_warp):
    # per-pixel offsets resolve exactly while they stay within +-R of their
    # 1xT run's rounded mean, clamp otherwise. ~1.9x faster than the exact
    # per-pixel gather (the DMC frame's dominant cost) at T=16 R=2.
    warp_mode: str | None = None
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x, aux_feature, flow):
        B, H, W, C = x.shape
        G, O = self.group_num, self.offset_num
        Cg = C // G

        out = conv(self.head_ch, 3, 2, name="offset1", dtype=self.dtype)(aux_feature)
        out = leaky_relu(out, 0.1)
        out = conv(self.head_ch, 3, 1, name="offset2", dtype=self.dtype)(out)
        out = leaky_relu(out, 0.1)
        out = conv(3 * G * O, 3, 1, name="offset3", dtype=self.dtype)(out)
        out = bilinear_up2(out)
        o1, o2, mask = jnp.split(out, 3, axis=-1)
        mask = jax.nn.sigmoid(mask)  # [B, H, W, G*O]

        # pair consecutive channels of cat(o1, o2) as (dx, dy) per offset map
        offset = self.max_residue_magnitude * jnp.tanh(
            jnp.concatenate([o1, o2], axis=-1))
        offset = offset.reshape(B, H, W, G * O, 2)
        offset = offset + jnp.tile(flow, (1, 1, 1, G * O)).reshape(B, H, W, G * O, 2)

        # group the feature channels; map k = o*G + g warps group g = k % G
        xg = x.reshape(B, H, W, G, Cg)
        xg = jnp.concatenate([xg] * O, axis=3)  # [B, H, W, G*O, Cg]

        import os

        mode = self.warp_mode or os.environ.get("DCVC_TPU_OD_WARP", "exact")
        # "exact" | "tile:T,R[,base]" | "block:Dh,Rv[,BH,BW[,base]]"
        # (ops/warp.py:resolve_warp_fn)
        warp = resolve_warp_fn(mode)

        # fold the G*O maps into the batch for one big vectorized warp
        xg = xg.transpose(0, 3, 1, 2, 4).reshape(B * G * O, H, W, Cg)
        off = offset.transpose(0, 3, 1, 2, 4).reshape(B * G * O, H, W, 2)
        m = mask.transpose(0, 3, 1, 2).reshape(B * G * O, H, W, 1)
        if self.warp_chunks > 1:
            nc = self.warp_chunks
            per = (B * G * O) // nc

            def body(_, args):
                xg_c, off_c, m_c = args
                return None, warp(xg_c, off_c) * m_c

            _, warped = jax.lax.scan(
                body, None,
                (xg.reshape(nc, per, H, W, Cg),
                 off.reshape(nc, per, H, W, 2),
                 m.reshape(nc, per, H, W, 1)))
            warped = warped.reshape(B * G * O, H, W, Cg)
        else:
            warped = warp(xg, off) * m
        warped = warped.reshape(B, G * O, H, W, Cg).transpose(0, 2, 3, 1, 4)
        warped = warped.reshape(B, H, W, G * O * Cg)

        # grouped 1x1 fusion conv expressed as a block-diagonal dense matmul:
        # a feature_group_count conv with 6-in/3-out per group tiles as
        # [..., G, 6] on TPU and pads ~43x (16 GB of HLO temp at 1080p); the
        # dense (G*O*Cg, C) matmul is exactly equivalent and MXU-friendly.
        in_per_g = O * Cg
        out_per_g = self.in_channel // G
        w = self.param(
            "fusion_kernel",
            nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform"),
            (G, in_per_g, out_per_g))
        b = self.param("fusion_bias", nn.initializers.zeros, (self.in_channel,))
        dense = jax.scipy.linalg.block_diag(*[w[g] for g in range(G)])
        if self.dtype is not None:
            dense = dense.astype(self.dtype)
            warped = warped.astype(self.dtype)
        return jnp.dot(warped, dense) + b


class FeatureExtractor(nn.Module):
    ch: tuple = (48, 64, 96)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, feature):
        c1, c2, c3 = self.ch
        layer1 = conv(c1, 3, 1, name="conv1", dtype=self.dtype)(feature)
        layer1 = ResBlock(c1, name="res1", dtype=self.dtype)(layer1)
        layer2 = conv(c2, 3, 2, name="conv2", dtype=self.dtype)(layer1)
        layer2 = ResBlock(c2, name="res2", dtype=self.dtype)(layer2)
        layer3 = conv(c3, 3, 2, name="conv3", dtype=self.dtype)(layer2)
        layer3 = ResBlock(c3, name="res3", dtype=self.dtype)(layer3)
        return layer1, layer2, layer3


class MultiScaleContextFusion(nn.Module):
    ch: tuple = (48, 64, 96)
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, context1, context2, context3):
        c1, c2, c3 = self.ch
        c3_up = SubpelConv(c2, 2, 3, name="conv3_up", dtype=self.dtype)(context3)
        c3_up = ResBlock(c2, name="res3_up", dtype=self.dtype)(c3_up)
        c3_out = conv(c3, 3, 1, name="conv3_out", dtype=self.dtype)(context3)
        c3_out = ResBlock(c3, name="res3_out", dtype=self.dtype)(c3_out)
        cat32 = jnp.concatenate([c3_up, context2], axis=-1)
        c2_up = SubpelConv(c1, 2, 3, name="conv2_up", dtype=self.dtype)(cat32)
        c2_up = ResBlock(c1, name="res2_up", dtype=self.dtype)(c2_up)
        c2_out = conv(c2, 3, 1, name="conv2_out", dtype=self.dtype)(cat32)
        c2_out = ResBlock(c2, name="res2_out", dtype=self.dtype)(c2_out)
        cat21 = jnp.concatenate([c2_up, context1], axis=-1)
        c1_out = conv(c1, 3, 1, name="conv1_out", dtype=self.dtype)(cat21)
        c1_out = ResBlock(c1, name="res1_out", dtype=self.dtype)(c1_out)
        return context1 + c1_out, context2 + c2_out, context3 + c3_out


class HyperEnc(nn.Module):
    """Full-depth hyper encoder (video_net.py:227-237)."""

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


class HyperEncReduced(nn.Module):
    """reduce_enc_layer variant (video_net.py:218-226)."""

    z_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y):
        z = conv(self.z_ch, 3, 1, name="c1", dtype=self.dtype)(y)
        z = leaky_relu(z)
        z = conv(self.z_ch, 3, 2, name="c2", dtype=self.dtype)(z)
        z = leaky_relu(z)
        return conv(self.z_ch, 3, 2, name="c3", dtype=self.dtype)(z)


class HyperDec(nn.Module):
    y_ch: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, z_hat):
        p = conv(self.y_ch, 3, 1, name="c1", dtype=self.dtype)(z_hat)
        p = leaky_relu(p)
        p = SubpelConv(self.y_ch, 2, 1, name="up1", dtype=self.dtype)(p)
        p = leaky_relu(p)
        p = conv(self.y_ch, 3, 1, name="c2", dtype=self.dtype)(p)
        p = leaky_relu(p)
        p = SubpelConv(self.y_ch, 2, 1, name="up2", dtype=self.dtype)(p)
        p = leaky_relu(p)
        return conv(self.y_ch, 3, 1, name="c3", dtype=self.dtype)(p)

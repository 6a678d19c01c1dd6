"""CompressAI-style intra image codec zoo (gen-1 / TCM I-frame models).

Parity targets: DCVC/src/models/priors.py:110-718 (FactorizedPrior,
ScaleHyperprior, MeanScaleHyperprior, JointAutoregressiveHierarchicalPriors),
DCVC/src/models/waseda.py:28-95 (Cheng2020Anchor), and the registry
DCVC/src/zoo/image.py:26-31. DCVC-TCM's per-rate IntraNoAR (priors.py:105-278)
shares the MeanScaleHyperprior machinery.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from ..entropy.bottleneck import EntropyBottleneck
from ..layers.blocks import (
    ResidualBlock,
    SubpelConv,
    conv,
    leaky_relu,
)
from ..layers.gdn import GDN
from . import priors
from .video_dcvc import EntropyParams1x1, MaskedConv2d, _deconv


def _probs_to_bits(likelihood):
    return -jnp.log(jnp.clip(likelihood, 1e-9)) / jnp.log(2.0)


class _GaTransform(nn.Module):
    """conv5x5-s2 + GDN x4 analysis transform."""

    N: int
    M: int
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        for i, ch in enumerate([self.N] * 3 + [self.M]):
            x = conv(ch, 5, 2, name=f"conv{i}", dtype=self.dtype)(x)
            if i < 3:
                x = GDN(ch, name=f"gdn{i}")(x)
        return x


class _GsTransform(nn.Module):
    N: int
    out_ch: int = 3
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, y_hat):
        x = y_hat
        for i in range(3):
            x = _deconv(self.N, 5, 2, name=f"deconv{i}", dtype=self.dtype)(x)
            x = GDN(self.N, inverse=True, name=f"igdn{i}")(x)
        return _deconv(self.out_ch, 5, 2, name="deconv3", dtype=self.dtype)(x)


class FactorizedPrior(nn.Module):
    N: int = 128
    M: int = 192
    dtype: jnp.dtype | None = None

    def setup(self):
        self.g_a = _GaTransform(self.N, self.M, dtype=self.dtype)
        self.g_s = _GsTransform(self.N, 3, dtype=self.dtype)
        self.entropy_bottleneck = EntropyBottleneck(self.M)

    def __call__(self, x, quant_mode: str = "round"):
        # CompressAI training convention: "noise" perturbs BOTH the recon and
        # rate paths (entropy_models.py quantize(..., "noise")), unlike the
        # DMC generations' STE-recon + noise-rate split.
        if quant_mode == "noise":
            quant = lambda t: priors.quant_noise(t, self.make_rng("noise"))
        else:
            quant = priors.resolve_quant(quant_mode)
        y = self.g_a(x)
        y_hat, y_lik = self.entropy_bottleneck(y, quant)
        x_hat = self.g_s(y_hat)
        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(_probs_to_bits(y_lik), axis=(1, 2, 3)) / pixel_num
        return {"x_hat": x_hat, "bpp": bpp_y, "bpp_y": bpp_y,
                "bit": jnp.sum(bpp_y) * pixel_num,
                "aux_loss": self.entropy_bottleneck.aux_loss()}

    def analyze(self, x):
        return self.g_a(x)

    def synthesize(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)


class _HyperBase(nn.Module):
    """Shared g_a/g_s + entropy bottleneck over z."""

    N: int = 128
    M: int = 192
    dtype: jnp.dtype | None = None

    def _gaussian_bits(self, y_q, scales):
        # CompressAI GaussianConditional._likelihood parity
        # (DCVC/src/entropy_models/entropy_models.py:439-460): abs-folded
        # cumulative for tail stability, scale floor 0.11, likelihood
        # floor 1e-9 (NOT the DC-generation +1e-5 convention).
        import jax

        scales = jnp.maximum(scales, SCALES_MIN_JNP)
        v = jnp.abs(y_q)
        # ndtr rejects bf16, and tail probabilities need f32 anyway
        # (entropy/bits.py:gaussian_cdf does the same)
        # upcast BEFORE the subtract/divide: computing (0.5 - v) / scales
        # in bf16 quantizes the z-score to ~8 mantissa bits and skews bit
        # estimates vs the reference's full-f32 path (ADVICE r4).
        v32 = v.astype(jnp.float32)
        s32 = scales.astype(jnp.float32)
        z_hi = (0.5 - v32) / s32
        z_lo = (-0.5 - v32) / s32
        probs = jax.scipy.special.ndtr(z_hi) - jax.scipy.special.ndtr(z_lo)
        return -jnp.log2(jnp.maximum(probs, 1e-9)).astype(v.dtype)


SCALES_MIN_JNP = 0.11


class ScaleHyperprior(_HyperBase):
    def setup(self):
        N, M = self.N, self.M
        self.g_a = _GaTransform(N, M, dtype=self.dtype)
        self.g_s = _GsTransform(N, 3, dtype=self.dtype)
        self.h_a_convs = [conv(N, 3, 1), conv(N, 5, 2), conv(N, 5, 2)]
        self.h_s_deconvs = [_deconv(N, 5, 2), _deconv(N, 5, 2), conv(self.M, 3, 1)]
        self.entropy_bottleneck = EntropyBottleneck(N)

    def h_a(self, y):
        import jax

        f = jax.nn.relu(self.h_a_convs[0](jnp.abs(y)))
        f = jax.nn.relu(self.h_a_convs[1](f))
        return self.h_a_convs[2](f)

    def h_s(self, z_hat):
        import jax

        f = jax.nn.relu(self.h_s_deconvs[0](z_hat))
        f = jax.nn.relu(self.h_s_deconvs[1](f))
        return jax.nn.relu(self.h_s_deconvs[2](f))

    def __call__(self, x, quant_mode: str = "round"):
        # CompressAI training convention: "noise" perturbs BOTH the recon and
        # rate paths (entropy_models.py quantize(..., "noise")), unlike the
        # DMC generations' STE-recon + noise-rate split.
        if quant_mode == "noise":
            quant = lambda t: priors.quant_noise(t, self.make_rng("noise"))
        else:
            quant = priors.resolve_quant(quant_mode)
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, quant)
        scales_hat = self.h_s(z_hat)
        y_q = quant(y)
        x_hat = self.g_s(y_q)
        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(self._gaussian_bits(y_q, scales_hat),
                        axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(_probs_to_bits(z_lik), axis=(1, 2, 3)) / pixel_num
        return {"x_hat": x_hat, "bpp": bpp_y + bpp_z, "bpp_y": bpp_y,
                "bpp_z": bpp_z, "bit": jnp.sum(bpp_y + bpp_z) * pixel_num,
                "aux_loss": self.entropy_bottleneck.aux_loss()}

    def analyze(self, x):
        y = self.g_a(x)
        return y, self.h_a(y)

    def scales_from_z(self, z_hat):
        return self.h_s(z_hat)

    def synthesize(self, y_hat):
        return jnp.clip(self.g_s(y_hat), 0.0, 1.0)


class MeanScaleHyperprior(ScaleHyperprior):
    def setup(self):
        N, M = self.N, self.M
        self.g_a = _GaTransform(N, M, dtype=self.dtype)
        self.g_s = _GsTransform(N, 3, dtype=self.dtype)
        self.h_a_convs = [conv(N, 3, 1), conv(N, 5, 2), conv(N, 5, 2)]
        self.h_s_deconvs = [_deconv(M, 5, 2), _deconv(M * 3 // 2, 5, 2),
                            conv(M * 2, 3, 1)]
        self.entropy_bottleneck = EntropyBottleneck(N)

    def h_a(self, y):
        f = leaky_relu(self.h_a_convs[0](y))
        f = leaky_relu(self.h_a_convs[1](f))
        return self.h_a_convs[2](f)

    def h_s(self, z_hat):
        f = leaky_relu(self.h_s_deconvs[0](z_hat))
        f = leaky_relu(self.h_s_deconvs[1](f))
        return self.h_s_deconvs[2](f)

    def __call__(self, x, quant_mode: str = "round"):
        # CompressAI training convention: "noise" perturbs BOTH the recon and
        # rate paths (entropy_models.py quantize(..., "noise")), unlike the
        # DMC generations' STE-recon + noise-rate split.
        if quant_mode == "noise":
            quant = lambda t: priors.quant_noise(t, self.make_rng("noise"))
        else:
            quant = priors.resolve_quant(quant_mode)
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, quant)
        scales_hat, means_hat = jnp.split(self.h_s(z_hat), 2, axis=-1)
        y_q = quant(y - means_hat)
        y_hat = y_q + means_hat
        x_hat = self.g_s(y_hat)
        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(self._gaussian_bits(y_q, scales_hat),
                        axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(_probs_to_bits(z_lik), axis=(1, 2, 3)) / pixel_num
        return {"x_hat": x_hat, "bpp": bpp_y + bpp_z, "bpp_y": bpp_y,
                "bpp_z": bpp_z, "bit": jnp.sum(bpp_y + bpp_z) * pixel_num,
                "aux_loss": self.entropy_bottleneck.aux_loss()}

    def params_from_z(self, z_hat):
        scales_hat, means_hat = jnp.split(self.h_s(z_hat), 2, axis=-1)
        return scales_hat, means_hat


class JointAutoregressiveHierarchicalPriors(MeanScaleHyperprior):
    N: int = 192
    M: int = 192

    def setup(self):
        N, M = self.N, self.M
        self.g_a = _GaTransform(N, M, dtype=self.dtype)
        self.g_s = _GsTransform(N, 3, dtype=self.dtype)
        self.h_a_convs = [conv(N, 3, 1), conv(N, 5, 2), conv(N, 5, 2)]
        self.h_s_deconvs = [_deconv(M, 5, 2), _deconv(M * 3 // 2, 5, 2),
                            conv(M * 2, 3, 1)]
        self.entropy_bottleneck = EntropyBottleneck(N)
        self.context_prediction = MaskedConv2d(2 * M, 5, dtype=self.dtype)
        self.entropy_parameters = EntropyParams1x1(M, dtype=self.dtype)

    def __call__(self, x, quant_mode: str = "round"):
        # CompressAI training convention: "noise" perturbs BOTH the recon and
        # rate paths (entropy_models.py quantize(..., "noise")), unlike the
        # DMC generations' STE-recon + noise-rate split.
        if quant_mode == "noise":
            quant = lambda t: priors.quant_noise(t, self.make_rng("noise"))
        else:
            quant = priors.resolve_quant(quant_mode)
        y = self.g_a(x)
        z = self.h_a(y)
        z_hat, z_lik = self.entropy_bottleneck(z, quant)
        hyper = self.h_s(z_hat)
        y_hat_for_ctx = quant(y)  # means-unaware quantization for the context
        ctx = self.context_prediction(y_hat_for_ctx)
        gp = self.entropy_parameters(jnp.concatenate([hyper, ctx], axis=-1))
        scales_hat, means_hat = jnp.split(gp, 2, axis=-1)
        y_q = quant(y - means_hat)
        y_hat = y_q + means_hat
        x_hat = self.g_s(y_hat)
        pixel_num = x.shape[1] * x.shape[2]
        bpp_y = jnp.sum(self._gaussian_bits(y_q, scales_hat),
                        axis=(1, 2, 3)) / pixel_num
        bpp_z = jnp.sum(_probs_to_bits(z_lik), axis=(1, 2, 3)) / pixel_num
        return {"x_hat": x_hat, "bpp": bpp_y + bpp_z, "bpp_y": bpp_y,
                "bpp_z": bpp_z, "bit": jnp.sum(bpp_y + bpp_z) * pixel_num,
                "aux_loss": self.entropy_bottleneck.aux_loss()}

    def hyper_from_z(self, z_hat):
        return self.h_s(z_hat)


class ResidualBlockStrideGDN(nn.Module):
    """gen-1 ResidualBlockWithStride (DCVC/src/layers/layers.py:67-99):
    conv3x3(s) - lrelu - conv3x3 - GDN, 1x1-strided conv skip."""

    out_ch: int
    stride: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = conv(self.out_ch, 3, self.stride, name="conv1",
                   dtype=self.dtype)(x)
        out = leaky_relu(out)
        out = conv(self.out_ch, 3, 1, name="conv2", dtype=self.dtype)(out)
        out = GDN(self.out_ch, name="gdn")(out)
        if self.stride != 1:
            identity = conv(self.out_ch, 1, self.stride, name="downsample",
                            dtype=self.dtype)(x)
        else:
            identity = x
        return out + identity


class ResidualBlockUpsampleGDN(nn.Module):
    """gen-1 ResidualBlockUpsample (DCVC/src/layers/layers.py:101-128):
    subpel3x3 - lrelu - conv3x3 - IGDN, subpel3x3 skip."""

    out_ch: int
    upsample: int = 2
    dtype: jnp.dtype | None = None

    @nn.compact
    def __call__(self, x):
        out = SubpelConv(self.out_ch, self.upsample, 3, name="subpel_conv",
                         dtype=self.dtype)(x)
        out = leaky_relu(out)
        out = conv(self.out_ch, 3, 1, name="conv", dtype=self.dtype)(out)
        out = GDN(self.out_ch, inverse=True, name="igdn")(out)
        identity = SubpelConv(self.out_ch, self.upsample, 3, name="upsample",
                              dtype=self.dtype)(x)
        return out + identity


class Cheng2020Anchor(JointAutoregressiveHierarchicalPriors):
    """Construct with M == N (waseda.py:41: super().__init__(N=N, M=N)).

    Blocks are the gen-1 GDN residual variants (DCVC/src/layers/layers.py),
    not the DC-generation leaky(0.1) ones.
    """

    N: int = 192
    M: int = 192

    def setup(self):
        assert self.M == self.N, "Cheng2020Anchor requires M == N"
        N = self.N
        self.entropy_bottleneck = EntropyBottleneck(N)
        self.context_prediction = MaskedConv2d(2 * N, 5, dtype=self.dtype)
        self.entropy_parameters = EntropyParams1x1(N, dtype=self.dtype)
        self.g_a_blocks = [
            ResidualBlockStrideGDN(N, 2, dtype=self.dtype),
            ResidualBlock(N, dtype=self.dtype),
            ResidualBlockStrideGDN(N, 2, dtype=self.dtype),
            ResidualBlock(N, dtype=self.dtype),
            ResidualBlockStrideGDN(N, 2, dtype=self.dtype),
            ResidualBlock(N, dtype=self.dtype),
        ]
        self.g_a_out = conv(N, 3, 2)
        self.h_a_convs = [conv(N, 3, 1), conv(N, 3, 1), conv(N, 3, 2),
                          conv(N, 3, 1), conv(N, 3, 2)]
        self.h_s_conv1 = conv(N, 3, 1)
        self.h_s_up1 = SubpelConv(N, 2, 3)
        self.h_s_conv2 = conv(N * 3 // 2, 3, 1)
        self.h_s_up2 = SubpelConv(N * 3 // 2, 2, 3)
        self.h_s_conv3 = conv(N * 2, 3, 1)
        self.g_s_blocks = [
            ResidualBlock(N, dtype=self.dtype),
            ResidualBlockUpsampleGDN(N, 2, dtype=self.dtype),
            ResidualBlock(N, dtype=self.dtype),
            ResidualBlockUpsampleGDN(N, 2, dtype=self.dtype),
            ResidualBlock(N, dtype=self.dtype),
            ResidualBlockUpsampleGDN(N, 2, dtype=self.dtype),
            ResidualBlock(N, dtype=self.dtype),
        ]
        self.g_s_out = SubpelConv(3, 2, 3)

    def g_a(self, x):
        for blk in self.g_a_blocks:
            x = blk(x)
        return self.g_a_out(x)

    def g_s(self, y_hat):
        x = y_hat
        for blk in self.g_s_blocks:
            x = blk(x)
        return self.g_s_out(x)

    def h_a(self, y):
        f = leaky_relu(self.h_a_convs[0](y))
        f = leaky_relu(self.h_a_convs[1](f))
        f = leaky_relu(self.h_a_convs[2](f))
        f = leaky_relu(self.h_a_convs[3](f))
        return self.h_a_convs[4](f)

    def h_s(self, z_hat):
        # waseda.py h_s: conv-L-subpel-L-conv-L-subpel-L-conv
        f = leaky_relu(self.h_s_conv1(z_hat))
        f = leaky_relu(self.h_s_up1(f))
        f = leaky_relu(self.h_s_conv2(f))
        f = leaky_relu(self.h_s_up2(f))
        return self.h_s_conv3(f)


# registry mirroring DCVC/src/zoo/image.py
model_architectures = {
    "bmshj2018-factorized": FactorizedPrior,
    "bmshj2018-hyperprior": ScaleHyperprior,
    "mbt2018-mean": MeanScaleHyperprior,
    "mbt2018": JointAutoregressiveHierarchicalPriors,
    "cheng2020-anchor": Cheng2020Anchor,
}

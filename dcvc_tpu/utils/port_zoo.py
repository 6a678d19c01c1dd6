"""Reference-checkpoint porting: CompressAI-style intra zoo (gen-1 DCVC).

Maps DCVC/src/models/priors.py FactorizedPrior / ScaleHyperprior /
MeanScaleHyperprior / JointAutoregressiveHierarchicalPriors and
DCVC/src/models/waseda.py Cheng2020Anchor torch state_dicts onto our
intra_zoo flax trees. EntropyBottleneck matrices/biases/factors/quantiles
transfer verbatim; reparametrizer pedestals, LowerBound bounds, AR conv
masks, and baked CDF buffers (_offset/_quantized_cdf/_cdf_length/
scale_table) are recomputed on our side and skipped.
"""

from __future__ import annotations

from . import torch_port as tp
from .port_dc import _Mapper, get_state_dict

__all__ = ["convert_zoo", "get_state_dict"]

_BUFFER_SUFFIXES = (
    "pedestal", "lower_bound.bound", "likelihood_lower_bound.bound",
    "lower_bound_scale.bound", "_offset", "_quantized_cdf", "_cdf_length",
    "scale_table", "scale_bound", "target", "context_prediction.mask",
)


class _ZooMapper(_Mapper):
    def mark_buffers(self):
        for k in list(self.sd):
            if k.endswith(_BUFFER_SUFFIXES):
                self.used.add(k)

    def deconv(self, t, *f):
        w = self._take(f"{t}.weight")
        self._set((*f, "kernel"), tp.conv_transpose_kernel(w))
        self._set((*f, "bias"), self._take(f"{t}.bias"))

    def gdn(self, t, *f):
        self.param(f"{t}.beta", (*f, "beta"))
        self.param(f"{t}.gamma", (*f, "gamma"))

    def bottleneck(self, t, *f):
        self.param(f"{t}.quantiles", (*f, "quantiles"))
        for i in range(5):
            self.param(f"{t}._matrices.{i}", (*f, f"matrix{i}"))
            self.param(f"{t}._biases.{i}", (*f, f"bias{i}"))
            if i < 4:
                self.param(f"{t}._factors.{i}", (*f, f"factor{i}"))

    def ga_gs(self):
        for i, ci in enumerate((0, 2, 4, 6)):
            self.conv(f"g_a.{ci}", "g_a", f"conv{i}")
        for i, ci in enumerate((1, 3, 5)):
            self.gdn(f"g_a.{ci}", "g_a", f"gdn{i}")
        for i, ci in enumerate((0, 2, 4, 6)):
            self.deconv(f"g_s.{ci}", "g_s", f"deconv{i}")
        for i, ci in enumerate((1, 3, 5)):
            self.gdn(f"g_s.{ci}", "g_s", f"igdn{i}")

    def hyper_ms(self):
        """mean-scale / joint h_a + h_s (priors.py:457-471)."""
        for i, ci in enumerate((0, 2, 4)):
            self.conv(f"h_a.{ci}", f"h_a_convs_{i}")
        # h_s: two stride-2 ConvTranspose + one stride-1 plain conv
        self.deconv("h_s.0", "h_s_deconvs_0")
        self.deconv("h_s.2", "h_s_deconvs_1")
        self.conv("h_s.4", "h_s_deconvs_2")

    def ar_head(self):
        """MaskedConv2d context + 3x 1x1 entropy params (priors.py:473-483)."""
        self.conv("context_prediction", "context_prediction")
        for i, ci in enumerate((0, 2, 4)):
            self.conv(f"entropy_parameters.{ci}", "entropy_parameters",
                      f"c{i + 1}")

    def res_plain(self, t, *f):
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")

    def res_stride_gdn(self, t, *f):
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")
        self.gdn(f"{t}.gdn", *f, "gdn")
        self.conv(f"{t}.downsample", *f, "downsample")

    def res_up_gdn(self, t, *f):
        self.conv(f"{t}.subpel_conv.0", *f, "subpel_conv", "conv")
        self.conv(f"{t}.conv", *f, "conv")
        self.gdn(f"{t}.igdn", *f, "igdn")
        self.conv(f"{t}.upsample.0", *f, "upsample", "conv")


def convert_zoo(state_dict: dict, kind: str) -> dict:
    """kind in {factorized, scale, meanscale, joint, cheng2020} (registry:
    bmshj2018-factorized / bmshj2018-hyperprior / mbt2018-mean / mbt2018 /
    cheng2020-anchor)."""
    m = _ZooMapper(get_state_dict(state_dict))
    m.mark_buffers()
    m.bottleneck("entropy_bottleneck", "entropy_bottleneck")
    if kind in ("factorized", "scale", "meanscale", "joint"):
        m.ga_gs()
    if kind in ("scale", "meanscale", "joint"):
        m.hyper_ms()
    if kind == "joint":
        m.ar_head()
    if kind == "cheng2020":
        # waseda.py:44-88 — GDN residual pyramids + 3x3 hyper stacks
        for i in range(6):
            if i % 2 == 0:
                m.res_stride_gdn(f"g_a.{i}", f"g_a_blocks_{i}")
            else:
                m.res_plain(f"g_a.{i}", f"g_a_blocks_{i}")
        m.conv("g_a.6", "g_a_out")
        for i, ci in enumerate((0, 2, 4, 6, 8)):
            m.conv(f"h_a.{ci}", f"h_a_convs_{i}")
        m.conv("h_s.0", "h_s_conv1")
        m.conv("h_s.2.0", "h_s_up1", "conv")
        m.conv("h_s.4", "h_s_conv2")
        m.conv("h_s.6.0", "h_s_up2", "conv")
        m.conv("h_s.8", "h_s_conv3")
        for i in range(7):
            if i % 2 == 0:
                m.res_plain(f"g_s.{i}", f"g_s_blocks_{i}")
            else:
                m.res_up_gdn(f"g_s.{i}", f"g_s_blocks_{i}")
        m.conv("g_s.7.0", "g_s_out", "conv")
        m.ar_head()
    return m.finish()

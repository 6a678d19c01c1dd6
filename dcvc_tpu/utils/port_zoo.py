"""Reference-checkpoint porting: CompressAI-style intra zoo (gen-1 DCVC).

Maps DCVC/src/models/priors.py FactorizedPrior / ScaleHyperprior /
MeanScaleHyperprior torch state_dicts onto our intra_zoo flax trees.
EntropyBottleneck matrices/biases/factors/quantiles transfer verbatim;
reparametrizer pedestals, LowerBound bounds and baked CDF buffers
(_offset/_quantized_cdf/_cdf_length/scale_table) are recomputed on our
side and skipped. Joint/Cheng2020 porting: round 2.
"""

from __future__ import annotations

from . import torch_port as tp
from .port_dc import _Mapper, get_state_dict

__all__ = ["convert_zoo", "get_state_dict"]

_BUFFER_SUFFIXES = (
    "pedestal", "lower_bound.bound", "likelihood_lower_bound.bound",
    "lower_bound_scale.bound", "_offset", "_quantized_cdf", "_cdf_length",
    "scale_table", "scale_bound", "target",
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


def convert_zoo(state_dict: dict, kind: str) -> dict:
    """kind in {factorized, scale, meanscale} (model registry names:
    bmshj2018-factorized / bmshj2018-hyperprior / mbt2018-mean)."""
    m = _ZooMapper(get_state_dict(state_dict))
    m.mark_buffers()
    m.ga_gs()
    m.bottleneck("entropy_bottleneck", "entropy_bottleneck")
    if kind != "factorized":
        for i, ci in enumerate((0, 2, 4)):
            m.conv(f"h_a.{ci}", f"h_a_convs_{i}")
        # h_s: two stride-2 ConvTranspose + one stride-1 plain conv
        m.deconv("h_s.0", "h_s_deconvs_0")
        m.deconv("h_s.2", "h_s_deconvs_1")
        m.conv("h_s.4", "h_s_deconvs_2")
    return m.finish()

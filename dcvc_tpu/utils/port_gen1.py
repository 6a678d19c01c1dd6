"""Reference-checkpoint porting: gen-1 DCVC torch state_dicts -> flax params.

Maps DCVC/src/models/DCVC_net.py:15-487 (GDN conv stacks, ConvTranspose
decoders, MaskedConv2d AR priors) onto our NHWC flax tree. The reference's
MaskedConv2d carries a `mask` buffer in its state_dict — recomputed here,
not transferred.
"""

from __future__ import annotations

from . import torch_port as tp
from .port_dc import _Mapper, get_state_dict

__all__ = ["convert_dcvc_gen1", "get_state_dict"]


class _Gen1Mapper(_Mapper):
    def deconv(self, t, *f):
        w = self._take(f"{t}.weight")
        self._set((*f, "kernel"), tp.conv_transpose_kernel(w))
        self._set((*f, "bias"), self._take(f"{t}.bias"))

    def gdn(self, t, *f):
        self.param(f"{t}.beta", (*f, "beta"))
        self.param(f"{t}.gamma", (*f, "gamma"))

    def res(self, t, *f):
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")

    def res_lrelu(self, t, *f):
        """ResBlock_LeakyReLU_0_Point_1: Sequential conv at .conv.0/.conv.2."""
        self.conv(f"{t}.conv.0", *f, "conv1")
        self.conv(f"{t}.conv.2", *f, "conv2")

    def masked_conv(self, t, *f):
        self.conv(t, *f)
        self.used.add(f"{t}.mask")  # buffer; mask is recomputed on our side


def convert_dcvc_gen1(state_dict: dict) -> dict:
    """DCVC_net (gen-1) -> flax params."""
    m = _Gen1Mapper(get_state_dict(state_dict))

    for lvl in range(4):
        for j in range(1, 6):
            m.conv(f"opticFlow.moduleBasic.{lvl}.conv{j}",
                   "optic_flow", f"basic{lvl}", f"conv{j}")

    m.conv("feature_extract.0", "feature_extract_conv")
    m.res("feature_extract.1", "feature_extract_res")
    m.res("context_refine.0", "context_refine_res")
    m.conv("context_refine.1", "context_refine_conv")

    # mv codec (DCVC_net.py:41-78)
    for i, ci in enumerate((0, 2, 4, 6)):
        m.conv(f"mvEncoder.{ci}", f"mv_encoder_convs_{i}")
    for i, ci in enumerate((1, 3, 5)):
        m.gdn(f"mvEncoder.{ci}", f"mv_encoder_gdns_{i}")
    for i, ci in enumerate((0, 2, 4, 6)):
        m.deconv(f"mvDecoder_part1.{ci}", f"mv_decoder_deconvs_{i}")
    for i, ci in enumerate((1, 3, 5)):
        m.gdn(f"mvDecoder_part1.{ci}", f"mv_decoder_igdns_{i}")
    for i, ci in enumerate((0, 2, 4, 6, 8, 10, 12)):
        m.conv(f"mvDecoder_part2.{ci}", f"mv_refine_convs_{i}")

    # contextual codec (:80-109)
    for i, ci in enumerate((0, 3, 6, 8)):
        m.conv(f"contextualEncoder.{ci}", f"contextual_encoder_convs_{i}")
    for i, ci in enumerate((1, 4, 7)):
        m.gdn(f"contextualEncoder.{ci}", f"contextual_encoder_gdns_{i}")
    for i, ci in enumerate((2, 5)):
        m.res_lrelu(f"contextualEncoder.{ci}", f"contextual_encoder_res_{i}")

    for i, ci in enumerate((0, 2, 5, 8)):
        m.conv(f"contextualDecoder_part1.{ci}.0",
               f"contextual_decoder1_subpels_{i}", "conv")
    for i, ci in enumerate((1, 3, 6)):
        m.gdn(f"contextualDecoder_part1.{ci}",
              f"contextual_decoder1_igdns_{i}")
    for i, ci in enumerate((4, 7)):
        m.res_lrelu(f"contextualDecoder_part1.{ci}",
                    f"contextual_decoder1_res_{i}")

    m.conv("contextualDecoder_part2.0", "contextual_decoder2_conv1")
    m.res("contextualDecoder_part2.1", "contextual_decoder2_res_0")
    m.res("contextualDecoder_part2.2", "contextual_decoder2_res_1")
    m.conv("contextualDecoder_part2.3", "contextual_decoder2_conv2")

    # hyper codecs (:111-137)
    for name, ours, kind in (("priorEncoder", "prior_encoder_convs", "conv"),
                             ("mvpriorEncoder", "mv_prior_encoder_convs", "conv"),
                             ("priorDecoder", "prior_decoder_deconvs", "deconv"),
                             ("mvpriorDecoder", "mv_prior_decoder_deconvs",
                              "deconv")):
        for i, ci in enumerate((0, 2, 4)):
            getattr(m, kind)(f"{name}.{ci}", f"{ours}_{i}")

    # temporal prior encoder (:139-150)
    for i, ci in enumerate((0, 2, 4, 6)):
        m.conv(f"temporalPriorEncoder.{ci}", f"temporal_prior_convs_{i}")
    for i, ci in enumerate((1, 3, 5)):
        m.gdn(f"temporalPriorEncoder.{ci}", f"temporal_prior_gdns_{i}")

    # AR priors + entropy parameter nets (:152-171)
    m.masked_conv("auto_regressive", "auto_regressive")
    m.masked_conv("auto_regressive_mv", "auto_regressive_mv")
    for i, ci in enumerate((0, 2, 4)):
        m.conv(f"entropy_parameters.{ci}", "entropy_parameters", f"c{i + 1}")
        m.conv(f"entropy_parameters_mv.{ci}", "entropy_parameters_mv",
               f"c{i + 1}")

    m.bit_estimator("bitEstimator_z", "bit_estimator_z")
    m.bit_estimator("bitEstimator_z_mv", "bit_estimator_z_mv")
    return m.finish()

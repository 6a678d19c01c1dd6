"""Reference-checkpoint porting: DCVC-TCM torch state_dicts -> flax params.

Maps DCVC-TCM/src/models/video_net_dmc.py (GDN conv stacks, ConvTranspose
hyper decoders, single-shot entropy parameter net) onto our NHWC flax tree.
GDN beta/gamma transfer verbatim: both sides store the CompressAI
NonNegativeParametrizer sqrt-reparam form (DCVC-TCM/src/ops/parametrizers.py:21,
dcvc_tpu/layers/gdn.py).
"""

from __future__ import annotations

from . import torch_port as tp
from .port_dc import _Mapper, get_state_dict

__all__ = ["convert_dmc_tcm", "get_state_dict"]


class _TcmMapper(_Mapper):
    def deconv(self, t, *f):
        w = self._take(f"{t}.weight")
        self._set((*f, "kernel"), tp.conv_transpose_kernel(w))
        self._set((*f, "bias"), self._take(f"{t}.bias"))

    def gdn(self, t, *f):
        self.param(f"{t}.beta", (*f, "beta"))
        self.param(f"{t}.gamma", (*f, "gamma"))

    def resblock_hem(self, t, *f):
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")


def convert_dmc_tcm(state_dict: dict) -> dict:
    """DMC (DCVC-TCM, video_net_dmc.py:165-509) -> flax params."""
    m = _TcmMapper(get_state_dict(state_dict))

    for lvl in range(4):
        for j in range(1, 6):
            m.conv(f"optic_flow.moduleBasic.{lvl}.conv{j}",
                   "optic_flow", f"basic{lvl}", f"conv{j}")

    # mv codec: conv/GDN/ResBlock x3 + final conv (video_net_dmc.py:178-192)
    for i, base in enumerate((0, 4, 8)):
        m.conv(f"mv_encoder.{base}", "mv_encoder", f"down{i}")
        m.gdn(f"mv_encoder.{base + 1}", "mv_encoder", f"gdn{i}")
        m.resblock_hem(f"mv_encoder.{base + 2}", "mv_encoder", f"res{i}")
    m.conv("mv_encoder.12", "mv_encoder", "down3")

    m.deconv("mv_decoder.0", "mv_decoder", "up0")
    m.resblock_hem("mv_decoder.2", "mv_decoder", "res0")
    m.gdn("mv_decoder.3", "mv_decoder", "igdn0")
    m.deconv("mv_decoder.4", "mv_decoder", "up1")
    m.gdn("mv_decoder.5", "mv_decoder", "igdn1")
    m.deconv("mv_decoder.6", "mv_decoder", "up2")
    m.gdn("mv_decoder.7", "mv_decoder", "igdn2")
    m.deconv("mv_decoder.8", "mv_decoder", "up3")

    for name in ("mv_prior_encoder", "contextual_hyper_prior_encoder"):
        for i, ci in enumerate((0, 2, 4)):
            m.conv(f"{name}.{ci}", name, f"c{i + 1}")
    for name in ("mv_prior_decoder", "contextual_hyper_prior_decoder"):
        for i, ci in enumerate((0, 2, 4)):
            m.deconv(f"{name}.{ci}", name, f"d{i + 1}")

    m.conv("feature_adaptor_I", "feature_adaptor_I")
    m.conv("feature_adaptor_P", "feature_adaptor_P")
    m.conv("feature_extractor.conv1", "feature_extractor", "conv1")
    m.resblock("feature_extractor.res_block1", "feature_extractor", "res1")
    m.conv("feature_extractor.conv2", "feature_extractor", "conv2")
    m.resblock("feature_extractor.res_block2", "feature_extractor", "res2")
    m.conv("feature_extractor.conv3", "feature_extractor", "conv3")
    m.resblock("feature_extractor.res_block3", "feature_extractor", "res3")

    fuse = "context_fusion_net"
    m.subpel(f"{fuse}.conv3_up", fuse, "conv3_up", "conv")
    m.resblock(f"{fuse}.res_block3_up", fuse, "res3_up")
    m.conv(f"{fuse}.conv3_out", fuse, "conv3_out")
    m.resblock(f"{fuse}.res_block3_out", fuse, "res3_out")
    m.subpel(f"{fuse}.conv2_up", fuse, "conv2_up", "conv")
    m.resblock(f"{fuse}.res_block2_up", fuse, "res2_up")
    m.conv(f"{fuse}.conv2_out", fuse, "conv2_out")
    m.resblock(f"{fuse}.res_block2_out", fuse, "res2_out")
    m.conv(f"{fuse}.conv1_out", fuse, "conv1_out")
    m.resblock(f"{fuse}.res_block1_out", fuse, "res1_out")

    enc = "contextual_encoder"
    for i in (1, 2, 3):
        m.conv(f"{enc}.conv{i}", enc, f"conv{i}")
        m.gdn(f"{enc}.gdn{i}", enc, f"gdn{i}")
    m.conv(f"{enc}.conv4", enc, "conv4")
    m.resblock_hem(f"{enc}.res1", enc, "res1")
    m.resblock_hem(f"{enc}.res2", enc, "res2")

    dec = "contextual_decoder"
    for i in (1, 2, 3, 4):
        m.subpel(f"{dec}.up{i}", dec, f"up{i}")
    for i in (1, 2, 3):
        m.gdn(f"{dec}.gdn{i}", dec, f"igdn{i}")
    m.resblock_hem(f"{dec}.res1", dec, "res1")
    m.resblock_hem(f"{dec}.res2", dec, "res2")

    tpe = "temporal_prior_encoder"
    for i in (1, 2, 3):
        m.conv(f"{tpe}.conv{i}", tpe, f"conv{i}")
        m.gdn(f"{tpe}.gdn{i}", tpe, f"gdn{i}")
    m.conv(f"{tpe}.conv4", tpe, "conv4")

    for i, ci in enumerate((0, 2, 4)):
        m.conv(f"contextual_entropy_parameter.{ci}",
               "contextual_entropy_parameter", f"c{i + 1}")

    rg = "recon_generation_net"
    m.conv(f"{rg}.feature_conv.0", rg, "conv")
    m.resblock_hem(f"{rg}.feature_conv.1", rg, "res1")
    m.resblock_hem(f"{rg}.feature_conv.2", rg, "res2")
    m.conv(f"{rg}.recon_conv", rg, "recon_conv")

    m.bit_estimator("bit_estimator_z", "bit_estimator_z")
    m.bit_estimator("bit_estimator_z_mv", "bit_estimator_z_mv")
    return m.finish()

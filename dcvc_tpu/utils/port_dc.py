"""Reference-checkpoint porting: DCVC-DC torch state_dicts -> flax params.

Maps the reference's module tree (DCVC-DC/src/models/image_model.py:16-107,
video_model.py:235-423, layers.py:18-223, video_net.py:79-251) onto our
NHWC flax trees, converting kernel layouts via utils/torch_port.py. Used to
run published checkpoints on TPU and to validate full-model numerical parity
against the reference's own torch code (tests/test_full_model_parity.py).

Checkpoint unwrapping follows get_state_dict
(DCVC-DC/src/utils/stream_helper.py:40-47): accept {"state_dict": ...} /
{"net": ...} wrappers and strip "module." prefixes.
"""

from __future__ import annotations

import numpy as np

from . import torch_port as tp


def get_state_dict(ckpt) -> dict:
    if "state_dict" in ckpt:
        ckpt = ckpt["state_dict"]
    if "net" in ckpt:
        ckpt = ckpt["net"]
    return {(k[len("module."):] if k.startswith("module.") else k): v
            for k, v in ckpt.items()}


class _Mapper:
    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.used: set = set()
        self.out: dict = {}

    def _take(self, key):
        self.used.add(key)
        return self.sd[key]

    def _set(self, path, value):
        node = self.out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        assert path[-1] not in node, f"duplicate {path}"
        node[path[-1]] = value

    # ---- leaf converters ----

    def conv(self, t, *f):
        w = self._take(f"{t}.weight")
        self._set((*f, "kernel"), tp.conv_kernel(w))
        self._set((*f, "bias"), self._take(f"{t}.bias"))

    def dwconv(self, t, *f):
        w = self._take(f"{t}.weight")
        self._set((*f, "kernel"), tp.depthwise_kernel(w))
        self._set((*f, "bias"), self._take(f"{t}.bias"))

    def param(self, t, f_path, reshape=None):
        v = self._take(t)
        if reshape is not None:
            v = v.reshape(reshape)
        self._set(f_path if isinstance(f_path, tuple) else (f_path,), v)

    # ---- block converters (names follow layers.py / blocks.py) ----

    def rbws(self, t, *f):
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")
        if f"{t}.downsample.weight" in self.sd:
            self.conv(f"{t}.downsample", *f, "downsample")

    def rbu(self, t, *f):
        self.conv(f"{t}.subpel_conv.0", *f, "subpel_conv", "conv")
        self.conv(f"{t}.conv", *f, "conv")
        self.conv(f"{t}.upsample.0", *f, "upsample", "conv")

    def resblock(self, t, *f):
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")
        if f"{t}.adaptor.weight" in self.sd:
            self.conv(f"{t}.adaptor", *f, "adaptor")

    def subpel(self, t, *f):
        if not f or f[-1] != "conv":
            f = (*f, "conv")
        self.conv(f"{t}.0", *f)

    def dcb(self, t, *f, two: bool, seq: bool = False):
        """DepthConvBlock (two=False) / DepthConvBlock2 (two=True).

        ``seq=True`` handles the EVC enc/dec layer variant whose DepthConv
        wraps depth_conv/conv2 in Sequentials (EVC/src/models/layers.py:
        160-196) — weights are identical, key suffixes differ."""
        d = f"{t}.block.0"
        self.conv(f"{d}.conv1.0", *f, "depth_conv", "conv1")
        sfx = ".0" if seq else ""
        self.dwconv(f"{d}.depth_conv{sfx}", *f, "depth_conv", "depth_conv")
        self.conv(f"{d}.conv2{sfx}", *f, "depth_conv", "conv2")
        if f"{d}.adaptor.weight" in self.sd:
            self.conv(f"{d}.adaptor", *f, "depth_conv", "adaptor")
        ffn = f"{t}.block.1"
        if two:
            self.conv(f"{ffn}.conv", *f, "ffn", "conv")
            self.conv(f"{ffn}.conv_out", *f, "ffn", "conv_out")
        else:
            self.conv(f"{ffn}.conv.0", *f, "ffn", "conv1")
            self.conv(f"{ffn}.conv.2", *f, "ffn", "conv2")

    def dcb_upsample(self, t, *f):
        """DepthConvBlockUpsample (EVC/src/models/hyperprior.py:66-74)."""
        self.dcb(t, *f, "block", two=False)
        self.conv(f"{t}.block.2", *f, "subpel", "conv")

    def unet(self, t, *f, two: bool):
        self.dcb(f"{t}.conv1", *f, "conv1", two=two)
        self.dcb(f"{t}.conv2", *f, "conv2", two=two)
        self.dcb(f"{t}.conv3", *f, "conv3", two=two)
        for i in range(4):
            self.dcb(f"{t}.context_refine.{i}", *f, f"context_refine_{i}",
                     two=two)
        self.subpel(f"{t}.up3", *f, "up3")
        self.dcb(f"{t}.up_conv3", *f, "up_conv3", two=two)
        self.subpel(f"{t}.up2", *f, "up2")
        self.dcb(f"{t}.up_conv2", *f, "up_conv2", two=two)

    def bit_estimator(self, t, *f):
        for i in range(4):
            self.param(f"{t}.f{i + 1}.h", (*f, f"h{i}"), reshape=(-1,))
            self.param(f"{t}.f{i + 1}.b", (*f, f"b{i}"), reshape=(-1,))
            if i < 3:
                self.param(f"{t}.f{i + 1}.a", (*f, f"a{i}"), reshape=(-1,))

    def finish(self) -> dict:
        missing = sorted(set(self.sd) - self.used)
        assert not missing, f"unmapped reference keys: {missing[:8]} " \
                            f"(+{max(0, len(missing) - 8)} more)"
        return {"params": self.out}


def convert_intra_dc(state_dict: dict) -> dict:
    """IntraNoAR (DCVC-DC) torch state_dict -> flax params pytree."""
    m = _Mapper(get_state_dict(state_dict))

    # encoder (image_model.py:20-30)
    m.rbws("enc.enc_1.0", "enc", "enc1_rbs")
    m.dcb("enc.enc_1.1", "enc", "enc1_dcb", two=True)
    m.rbws("enc.enc_2.0", "enc", "enc2_rbs1")
    m.dcb("enc.enc_2.1", "enc", "enc2_dcb1", two=True)
    m.rbws("enc.enc_2.2", "enc", "enc2_rbs2")
    m.dcb("enc.enc_2.3", "enc", "enc2_dcb2", two=True)
    m.conv("enc.enc_2.4", "enc", "enc2_down")

    # hyper codec (:68-78)
    m.dcb("hyper_enc.0", "hyper_enc", "dcb", two=True)
    m.conv("hyper_enc.1", "hyper_enc", "down1")
    m.conv("hyper_enc.3", "hyper_enc", "down2")
    m.rbu("hyper_dec.0", "hyper_dec", "up1")
    m.rbu("hyper_dec.1", "hyper_dec", "up2")
    m.dcb("hyper_dec.2", "hyper_dec", "dcb", two=True)

    # prior fusion + spatial prior (:80-93)
    m.dcb("y_prior_fusion.0", "y_prior_fusion_1", two=True)
    m.dcb("y_prior_fusion.1", "y_prior_fusion_2", two=True)
    for i in (1, 2, 3):
        m.conv(f"y_spatial_prior_adaptor_{i}", f"y_spatial_prior_adaptor_{i}")
    m.dcb("y_spatial_prior.0", "y_spatial_prior_1", two=True)
    m.dcb("y_spatial_prior.1", "y_spatial_prior_2", two=True)
    m.dcb("y_spatial_prior.2", "y_spatial_prior_3", two=True)

    # decoder + refine (:40-57, :95-98)
    m.dcb("dec.dec_1.0", "dec", "dec1_dcb1", two=True)
    m.rbu("dec.dec_1.1", "dec", "dec1_up1")
    m.dcb("dec.dec_1.2", "dec", "dec1_dcb2", two=True)
    m.rbu("dec.dec_1.3", "dec", "dec1_up2")
    m.dcb("dec.dec_1.4", "dec", "dec1_dcb3", two=True)
    m.rbu("dec.dec_1.5", "dec", "dec1_up3")
    m.dcb("dec.dec_2.0", "dec", "dec2_dcb", two=True)
    m.rbu("dec.dec_2.1", "dec", "dec2_up")
    m.unet("refine.0", "refine_unet", two=True)
    m.conv("refine.1", "refine_conv")

    m.bit_estimator("bit_estimator_z", "bit_estimator_z")

    # q params: torch (1, C, 1, 1) -> NHWC (1, 1, 1, C); scales keep shape
    m.param("q_basic_enc", ("q_basic_enc",), reshape=None)
    m.out["q_basic_enc"] = m.out["q_basic_enc"].transpose(0, 2, 3, 1)
    m.param("q_basic_dec", ("q_basic_dec",), reshape=None)
    m.out["q_basic_dec"] = m.out["q_basic_dec"].transpose(0, 2, 3, 1)
    m.param("q_scale_enc", ("q_scale_enc",))
    m.param("q_scale_dec", ("q_scale_dec",))
    return m.finish()


def _evc_encoder(m: _Mapper, src: str, dst: tuple):
    m.rbws(f"{src}.0", *dst, "down1")
    m.dcb(f"{src}.1", *dst, "block1", two=False, seq=True)
    m.rbws(f"{src}.2", *dst, "down2")
    m.dcb(f"{src}.3", *dst, "block2", two=False, seq=True)
    m.rbws(f"{src}.4", *dst, "down3")
    m.dcb(f"{src}.5", *dst, "block3", two=False, seq=True)
    m.conv(f"{src}.6", *dst, "down4")


def _evc_tail(m: _Mapper):
    """Everything in an EVC checkpoint except the encoder(s)."""
    m.dcb("dec.0", "dec", "block0", two=False, seq=True)
    m.rbu("dec.1", "dec", "up1")
    m.dcb("dec.2", "dec", "block1", two=False, seq=True)
    m.rbu("dec.3", "dec", "up2")
    m.dcb("dec.4", "dec", "block2", two=False, seq=True)
    m.rbu("dec.5", "dec", "up3")
    m.dcb("dec.6", "dec", "block3", two=False, seq=True)
    m.subpel("dec.7", "dec", "up4")

    m.dcb("hyper_enc.0", "hyper_enc", "block", two=False)
    m.conv("hyper_enc.1", "hyper_enc", "down1")
    m.conv("hyper_enc.3", "hyper_enc", "down2")
    m.dcb_upsample("hyper_dec.0", "hyper_dec", "up1")
    m.dcb_upsample("hyper_dec.1", "hyper_dec", "up2")
    m.dcb("hyper_dec.2", "hyper_dec", "block", two=False)

    m.dcb("y_prior_fusion.0", "y_prior_fusion", "block1", two=False)
    m.dcb("y_prior_fusion.1", "y_prior_fusion", "block2", two=False)
    m.dcb("y_spatial_prior.0", "y_spatial_prior", "block1", two=False)
    m.dcb("y_spatial_prior.1", "y_spatial_prior", "block2", two=False)
    m.dcb("y_spatial_prior.2", "y_spatial_prior", "block3", two=False)

    m.bit_estimator("bit_estimator_z", "bit_estimator_z")
    m.param("q_basic", ("q_basic",))
    m.out["q_basic"] = m.out["q_basic"].transpose(0, 2, 3, 1)
    m.param("q_scale", ("q_scale",))


def convert_evc(state_dict: dict) -> dict:
    """EVC intra (any enc/dec size grid) torch state_dict -> flax params.

    Reference: EVC/src/models/image_model.py:16-28 + layers.py
    get_enc_dec_models + hyperprior.py get_hyperprior/get_dualprior.
    """
    m = _Mapper(get_state_dict(state_dict))
    _evc_encoder(m, "enc", ("enc",))
    _evc_tail(m)
    return m.finish()


def convert_evc_scalable(state_dict: dict, enc_num: int = 4) -> dict:
    """Scale_EVC_* / plain-EVC checkpoints -> ScalableEVC flax params.

    A trained scalable checkpoint carries encs.{i} encoder banks; a plain
    EVC checkpoint's single encoder is replicated onto every bank (the
    reference's shape-tolerant load_state_dict does the same remap,
    EVC/src/models/scalable_encoder_model.py:45-69).
    """
    import copy

    m = _Mapper(get_state_dict(state_dict))
    if any(k.startswith("encs.0.") for k in m.sd):
        for i in range(enc_num):
            _evc_encoder(m, f"encs.{i}", (f"encs_{i}",))
    else:
        _evc_encoder(m, "enc", ("encs_0",))
        for i in range(1, enc_num):
            m.out[f"encs_{i}"] = copy.deepcopy(m.out["encs_0"])
    _evc_tail(m)
    return m.finish()


def convert_dmc(state_dict: dict) -> dict:
    """DMC (DCVC-DC P-frame) torch state_dict -> flax params pytree."""
    m = _Mapper(get_state_dict(state_dict))

    # optic flow: ME_Spynet moduleBasic.{L}.conv{1..5} 7x7 convs
    # (video_net.py:79-126) -> optic_flow/basic{L}/conv{1..5}
    for lvl in range(4):
        for j in range(1, 6):
            m.conv(f"optic_flow.moduleBasic.{lvl}.conv{j}",
                   "optic_flow", f"basic{lvl}", f"conv{j}")

    # OffsetDiversity (video_model.py:26-63)
    m.conv("align.conv_offset.0", "align", "offset1")
    m.conv("align.conv_offset.2", "align", "offset2")
    m.conv("align.conv_offset.4", "align", "offset3")
    # grouped 1x1 fusion -> block-diagonal dense: torch weight [C_out, O*Cg, 1, 1]
    # with groups=G; ours (G, in_per_g, out_per_g) + bias
    w = m._take("align.fusion.weight")  # [48, 6, 1, 1], groups=16
    b = m._take("align.fusion.bias")
    G = 16
    out_per_g = w.shape[0] // G
    in_per_g = w.shape[1]
    wg = w[:, :, 0, 0].reshape(G, out_per_g, in_per_g).transpose(0, 2, 1)
    m._set(("align", "fusion_kernel"), wg)
    m._set(("align", "fusion_bias"), b)

    # mv codec (video_model.py:121-170)
    m.rbws("mv_encoder.enc_1.0", "mv_encoder", "enc1_rbs")
    m.dcb("mv_encoder.enc_1.1", "mv_encoder", "enc1_dcb", two=False)
    m.rbws("mv_encoder.enc_2", "mv_encoder", "enc2")
    m.dcb("mv_encoder.adaptor_0", "mv_encoder", "adaptor_0", two=False)
    m.dcb("mv_encoder.adaptor_1", "mv_encoder", "adaptor_1", two=False)
    m.rbws("mv_encoder.enc_3.0", "mv_encoder", "enc3_rbs")
    m.dcb("mv_encoder.enc_3.1", "mv_encoder", "enc3_dcb", two=False)
    m.conv("mv_encoder.enc_3.2", "mv_encoder", "enc3_down")

    m.dcb("mv_decoder.dec_1.0", "mv_decoder", "dec1_dcb1", two=False)
    m.rbu("mv_decoder.dec_1.1", "mv_decoder", "dec1_up1")
    m.dcb("mv_decoder.dec_1.2", "mv_decoder", "dec1_dcb2", two=False)
    m.rbu("mv_decoder.dec_1.3", "mv_decoder", "dec1_up2")
    m.dcb("mv_decoder.dec_1.4", "mv_decoder", "dec1_dcb3", two=False)
    m.rbu("mv_decoder.dec_2", "mv_decoder", "dec2")
    m.dcb("mv_decoder.dec_3.0", "mv_decoder", "dec3_dcb", two=False)
    m.subpel("mv_decoder.dec_3.1", "mv_decoder", "dec3_up", "conv")

    # mv hyper (video_net.py:227-251)
    m.conv("mv_hyper_prior_encoder.0", "mv_hyper_prior_encoder", "c1")
    m.conv("mv_hyper_prior_encoder.2", "mv_hyper_prior_encoder", "c2")
    m.conv("mv_hyper_prior_encoder.4", "mv_hyper_prior_encoder", "c3")
    m.conv("mv_hyper_prior_encoder.6", "mv_hyper_prior_encoder", "c4")
    m.conv("mv_hyper_prior_encoder.8", "mv_hyper_prior_encoder", "c5")
    m.conv("mv_hyper_prior_decoder.0", "mv_hyper_prior_decoder", "c1")
    m.subpel("mv_hyper_prior_decoder.2", "mv_hyper_prior_decoder", "up1")
    m.conv("mv_hyper_prior_decoder.4", "mv_hyper_prior_decoder", "c2")
    m.subpel("mv_hyper_prior_decoder.6", "mv_hyper_prior_decoder", "up2")
    m.conv("mv_hyper_prior_decoder.8", "mv_hyper_prior_decoder", "c3")

    for i in (0, 1):
        m.dcb(f"mv_y_prior_fusion_adaptor_{i}",
              f"mv_y_prior_fusion_adaptor_{i}", two=False)
    m.dcb("mv_y_prior_fusion.0", "mv_y_prior_fusion_1", two=False)
    m.dcb("mv_y_prior_fusion.1", "mv_y_prior_fusion_2", two=False)
    for i in (1, 2, 3):
        m.conv(f"mv_y_spatial_prior_adaptor_{i}",
               f"mv_y_spatial_prior_adaptor_{i}")
    m.dcb("mv_y_spatial_prior.0", "mv_y_spatial_prior_1", two=False)
    m.dcb("mv_y_spatial_prior.1", "mv_y_spatial_prior_2", two=False)
    m.dcb("mv_y_spatial_prior.2", "mv_y_spatial_prior_3", two=False)

    # feature extraction / fusion (video_model.py:66-118, 343-351)
    m.conv("feature_adaptor_I", "feature_adaptor_I")
    for i in range(3):
        m.conv(f"feature_adaptor.{i}", f"feature_adaptor_{i}")
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

    # contextual codec (video_model.py:173-232)
    enc = "contextual_encoder"
    m.conv(f"{enc}.conv1", enc, "conv1")
    m.resblock(f"{enc}.res1", enc, "res1")
    m.conv(f"{enc}.conv2", enc, "conv2")
    m.resblock(f"{enc}.res2", enc, "res2")
    m.conv(f"{enc}.conv3", enc, "conv3")
    m.conv(f"{enc}.conv4", enc, "conv4")

    dec = "contextual_decoder"
    m.subpel(f"{dec}.up1", dec, "up1")
    m.subpel(f"{dec}.up2", dec, "up2")
    m.resblock(f"{dec}.res1", dec, "res1")
    m.subpel(f"{dec}.up3", dec, "up3")
    m.resblock(f"{dec}.res2", dec, "res2")
    m.subpel(f"{dec}.up4", dec, "up4")

    rg = "recon_generation_net"
    m.conv(f"{rg}.first_conv", rg, "first_conv")
    m.unet(f"{rg}.unet_1", rg, "unet_1", two=False)
    m.unet(f"{rg}.unet_2", rg, "unet_2", two=False)
    m.conv(f"{rg}.recon_conv", rg, "recon_conv")

    # contextual hyper + temporal prior (video_net.py:217-226, video_model.py:375-399)
    m.conv("contextual_hyper_prior_encoder.0",
           "contextual_hyper_prior_encoder", "c1")
    m.conv("contextual_hyper_prior_encoder.2",
           "contextual_hyper_prior_encoder", "c2")
    m.conv("contextual_hyper_prior_encoder.4",
           "contextual_hyper_prior_encoder", "c3")
    m.conv("contextual_hyper_prior_decoder.0",
           "contextual_hyper_prior_decoder", "c1")
    m.subpel("contextual_hyper_prior_decoder.2",
             "contextual_hyper_prior_decoder", "up1")
    m.conv("contextual_hyper_prior_decoder.4",
           "contextual_hyper_prior_decoder", "c2")
    m.subpel("contextual_hyper_prior_decoder.6",
             "contextual_hyper_prior_decoder", "up2")
    m.conv("contextual_hyper_prior_decoder.8",
           "contextual_hyper_prior_decoder", "c3")
    m.conv("temporal_prior_encoder.0", "temporal_prior_encoder_1")
    m.conv("temporal_prior_encoder.2", "temporal_prior_encoder_2")

    for i in (0, 1):
        m.dcb(f"y_prior_fusion_adaptor_{i}", f"y_prior_fusion_adaptor_{i}",
              two=False)
    m.dcb("y_prior_fusion.0", "y_prior_fusion_1", two=False)
    m.dcb("y_prior_fusion.1", "y_prior_fusion_2", two=False)
    for i in (1, 2, 3):
        m.conv(f"y_spatial_prior_adaptor_{i}", f"y_spatial_prior_adaptor_{i}")
    m.dcb("y_spatial_prior.0", "y_spatial_prior_1", two=False)
    m.dcb("y_spatial_prior.1", "y_spatial_prior_2", two=False)
    m.dcb("y_spatial_prior.2", "y_spatial_prior_3", two=False)

    m.bit_estimator("bit_estimator_z", "bit_estimator_z")
    m.bit_estimator("bit_estimator_z_mv", "bit_estimator_z_mv")

    for n in ("mv_y_q_basic_enc", "mv_y_q_basic_dec",
              "y_q_basic_enc", "y_q_basic_dec"):
        m.param(n, (n,))
        m.out[n] = m.out[n].transpose(0, 2, 3, 1)
    for n in ("mv_y_q_scale_enc", "mv_y_q_scale_dec",
              "y_q_scale_enc", "y_q_scale_dec"):
        m.param(n, (n,))
    return m.finish()

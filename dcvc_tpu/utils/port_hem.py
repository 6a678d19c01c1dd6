"""Reference-checkpoint porting: DCVC-HEM torch state_dicts -> flax params.

Maps DCVC-HEM/src/models/{image_model.py,video_model.py} module trees
(ResBlock enc/dec stacks, conv hyper codecs, 3-conv prior fusions, SE-UNet
recon) onto our NHWC flax trees. Validated by tests/test_full_model_parity.py.
"""

from __future__ import annotations

from .port_dc import _Mapper, get_state_dict

__all__ = ["convert_intra_hem", "convert_dmc_hem", "convert_canf_dmc",
           "get_state_dict"]


class _HemMapper(_Mapper):
    def resblock_hem(self, t, *f):
        """HEM ResBlock (video_net.py:74-96): conv1/conv2, no adaptor."""
        self.conv(f"{t}.conv1", *f, "conv1")
        self.conv(f"{t}.conv2", *f, "conv2")

    def enc_stack(self, t, *f):
        """get_enc_dec_models encoder (video_net.py:226-236)."""
        self.rbws(f"{t}.0", *f, "d1")
        self.resblock_hem(f"{t}.1", *f, "r1")
        self.rbws(f"{t}.2", *f, "d2")
        self.resblock_hem(f"{t}.3", *f, "r2")
        self.rbws(f"{t}.4", *f, "d3")
        self.resblock_hem(f"{t}.5", *f, "r3")
        self.conv(f"{t}.6", *f, "d4")

    def dec_stack(self, t, *f):
        """get_enc_dec_models decoder (video_net.py:238-248)."""
        self.resblock_hem(f"{t}.0", *f, "r0")
        self.rbu(f"{t}.1", *f, "u1")
        self.resblock_hem(f"{t}.2", *f, "r1")
        self.rbu(f"{t}.3", *f, "u2")
        self.resblock_hem(f"{t}.4", *f, "r2")
        self.rbu(f"{t}.5", *f, "u3")
        self.resblock_hem(f"{t}.6", *f, "r3")
        self.subpel(f"{t}.7", *f, "u4")

    def hyper_enc_stack(self, t, *f):
        """get_hyper_enc_dec_models enc: convs at 0,2,4,6,8 -> c1..c5."""
        for i, ci in enumerate((0, 2, 4, 6, 8)):
            self.conv(f"{t}.{ci}", *f, f"c{i + 1}")

    def hyper_dec_stack(self, t, *f):
        """get_hyper_enc_dec_models dec: conv/subpel alternating."""
        self.conv(f"{t}.0", *f, "c1")
        self.subpel(f"{t}.2", *f, "u1")
        self.conv(f"{t}.4", *f, "c2")
        self.subpel(f"{t}.6", *f, "u2")
        self.conv(f"{t}.8", *f, "c3")

    def conv_stack3(self, t, *f):
        """3 convs at indexes 0,2,4 -> c0..c2 (prior fusion / spatial prior)."""
        for i, ci in enumerate((0, 2, 4)):
            self.conv(f"{t}.{ci}", *f, f"c{i}")

    def cbr(self, t, *f):
        """ConvBlockResidual (video_net.py:165-180) incl. SELayer Linears."""
        self.conv(f"{t}.conv.0", *f, "conv1")
        self.conv(f"{t}.conv.2", *f, "conv2")
        if f"{t}.conv.3.fc.0.weight" in self.sd:
            w0 = self._take(f"{t}.conv.3.fc.0.weight")
            w1 = self._take(f"{t}.conv.3.fc.2.weight")
            self._set((*f, "se", "fc1", "kernel"), w0.T)
            self._set((*f, "se", "fc2", "kernel"), w1.T)
        self.conv(f"{t}.up_dim", *f, "up_dim")

    def hem_unet(self, t, *f):
        self.cbr(f"{t}.conv1", *f, "conv1")
        self.cbr(f"{t}.conv2", *f, "conv2")
        self.cbr(f"{t}.conv3", *f, "conv3")
        for i in range(4):
            self.resblock_hem(f"{t}.context_refine.{i}", *f,
                              f"context_refine_{i}")
        self.subpel(f"{t}.up3", *f, "up3")
        self.cbr(f"{t}.up_conv3", *f, "up_conv3")
        self.subpel(f"{t}.up2", *f, "up2")
        self.cbr(f"{t}.up_conv2", *f, "up_conv2")

    def ctx_enc(self, t, *f):
        """ContextualEncoder (video_model.py:71-93)."""
        self.conv(f"{t}.conv1", *f, "conv1")
        self.resblock(f"{t}.res1", *f, "res1")
        self.conv(f"{t}.conv2", *f, "conv2")
        self.resblock(f"{t}.res2", *f, "res2")
        self.conv(f"{t}.conv3", *f, "conv3")
        self.conv(f"{t}.conv4", *f, "conv4")

    def ctx_dec(self, t, *f):
        """ContextualDecoder (video_model.py:95-112)."""
        self.subpel(f"{t}.up1", *f, "up1")
        self.subpel(f"{t}.up2", *f, "up2")
        self.resblock(f"{t}.res1", *f, "res1")
        self.subpel(f"{t}.up3", *f, "up3")
        self.resblock(f"{t}.res2", *f, "res2")
        self.subpel(f"{t}.up4", *f, "up4")

    def recon_gen(self, t, *f):
        """ReconGeneration (video_model.py:115-128)."""
        self.conv(f"{t}.first_conv", *f, "first_conv")
        self.hem_unet(f"{t}.unet_1", *f, "unet_1")
        self.hem_unet(f"{t}.unet_2", *f, "unet_2")
        self.conv(f"{t}.recon_conv", *f, "recon_conv")

    def drop(self, prefix):
        """Consume reference keys with no counterpart in our tree."""
        for k in list(self.sd):
            if k.startswith(prefix):
                self.used.add(k)


def convert_intra_hem(state_dict: dict) -> dict:
    """IntraNoAR (DCVC-HEM, image_model.py:15-171) -> flax params."""
    m = _HemMapper(get_state_dict(state_dict))
    m.enc_stack("enc", "enc")
    m.dec_stack("dec", "dec")
    m.hyper_enc_stack("hyper_enc", "hyper_enc")
    m.hyper_dec_stack("hyper_dec", "hyper_dec")
    m.conv_stack3("y_prior_fusion", "y_prior_fusion")
    m.conv_stack3("y_spatial_prior", "y_spatial_prior")
    m.hem_unet("refine.0", "refine_unet")
    m.conv("refine.1", "refine_conv")
    m.bit_estimator("bit_estimator_z", "bit_estimator_z")
    m.param("q_basic", ("q_basic",))
    m.out["q_basic"] = m.out["q_basic"].transpose(0, 2, 3, 1)
    m.param("q_scale", ("q_scale",))
    return m.finish()


def _map_dmc_trunk(m: _HemMapper):
    """The DMC machinery shared by DMC (HEM) and the fork's CANFVC_DMC:
    flow, mv codec, feature pyramid, hyper codecs, priors, estimators."""
    for lvl in range(4):
        for j in range(1, 6):
            m.conv(f"optic_flow.moduleBasic.{lvl}.conv{j}",
                   "optic_flow", f"basic{lvl}", f"conv{j}")

    m.enc_stack("mv_encoder", "mv_encoder")
    m.dec_stack("mv_decoder", "mv_decoder")
    m.hyper_enc_stack("mv_hyper_prior_encoder", "mv_hyper_prior_encoder")
    m.hyper_dec_stack("mv_hyper_prior_decoder", "mv_hyper_prior_decoder")
    m.conv_stack3("mv_y_prior_fusion", "mv_y_prior_fusion")
    m.conv_stack3("mv_y_spatial_prior", "mv_y_spatial_prior")

    m.conv("feature_adaptor_I", "feature_adaptor_I")
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

    # our reduced hyper encoder names its convs c1..c3
    for i, ci in enumerate((0, 2, 4)):
        m.conv(f"contextual_hyper_prior_encoder.{ci}",
               "contextual_hyper_prior_encoder", f"c{i + 1}")
    m.hyper_dec_stack("contextual_hyper_prior_decoder",
                      "contextual_hyper_prior_decoder")
    m.conv("temporal_prior_encoder.0", "temporal_prior_encoder_1")
    m.conv("temporal_prior_encoder.2", "temporal_prior_encoder_2")
    m.conv_stack3("y_prior_fusion", "y_prior_fusion")
    m.conv_stack3("y_spatial_prior", "y_spatial_prior")

    m.bit_estimator("bit_estimator_z", "bit_estimator_z")
    m.bit_estimator("bit_estimator_z_mv", "bit_estimator_z_mv")
    for n in ("mv_y_q_basic", "y_q_basic"):
        m.param(n, (n,))
        m.out[n] = m.out[n].transpose(0, 2, 3, 1)
    for n in ("mv_y_q_scale", "y_q_scale"):
        m.param(n, (n,))


def convert_dmc_hem(state_dict: dict) -> dict:
    """DMC (DCVC-HEM, video_model.py:131-519) -> flax params."""
    m = _HemMapper(get_state_dict(state_dict))
    _map_dmc_trunk(m)
    m.conv("feature_adaptor_P", "feature_adaptor_P")
    m.ctx_enc("contextual_encoder", "contextual_encoder")
    m.ctx_dec("contextual_decoder", "contextual_decoder")
    m.recon_gen("recon_generation_net", "recon_generation_net")
    return m.finish()


def convert_canf_dmc(state_dict: dict) -> dict:
    """CANFVC_DMC (fork, video_model.py:523-840) -> flax params.

    The contextual enc/dec/recon are replaced by the 2-layer conditional
    ANF ladder (analysis{i} wraps ContextualEncoder; synthesis{i} wraps
    ContextualDecoder + ReconGeneration) plus the DQ post-filter. The
    checkpoint still carries feature_adaptor_P from the DMC base class,
    but the fork pins ref_feature=None (:655) so it is never used — drop.
    """
    m = _HemMapper(get_state_dict(state_dict))
    _map_dmc_trunk(m)
    cc = "contextual_coder"
    for i in range(2):
        m.ctx_enc(f"{cc}.analysis{i}.model", cc, f"analysis_{i}")
        m.ctx_dec(f"{cc}.synthesis{i}.model_part1", cc, f"synthesis_dec_{i}")
        m.recon_gen(f"{cc}.synthesis{i}.model_part2", cc,
                    f"synthesis_recon_{i}")
    m.conv("DQ.conv1", "dq", "conv1")
    for i in range(6):
        m.conv(f"DQ.resblock.{i}.0", "dq", f"res{i}_c1")
        m.conv(f"DQ.resblock.{i}.2", "dq", f"res{i}_c2")
    m.conv("DQ.conv2", "dq", "conv2")
    m.conv("DQ.conv3", "dq", "conv3")
    m.drop("feature_adaptor_P.")
    return m.finish()


def canf_params_from_hem(hem_params: dict, canf_like: dict) -> dict:
    """Cross-architecture training init: build CANFVC_DMC params from a
    DMC (HEM) param tree by replicating the contextual encoder/decoder/
    recon into BOTH ANF ladder layers — the fork's checkpoint surgery
    (train_CANFVC_DMC.py:855-880). Everything else transfers by name; the
    DQ post-filter (absent in HEM) keeps its fresh init from
    ``canf_like``; HEM's feature_adaptor_P (absent in CANF) is dropped.
    """
    import copy

    hem = hem_params["params"]
    out = copy.deepcopy(canf_like["params"])
    for k in list(out):
        if k == "contextual_coder":
            for i in (0, 1):
                out[k][f"analysis_{i}"] = copy.deepcopy(
                    hem["contextual_encoder"])
                out[k][f"synthesis_dec_{i}"] = copy.deepcopy(
                    hem["contextual_decoder"])
                out[k][f"synthesis_recon_{i}"] = copy.deepcopy(
                    hem["recon_generation_net"])
        elif k != "dq" and k in hem:
            out[k] = copy.deepcopy(hem[k])
    return {"params": out}

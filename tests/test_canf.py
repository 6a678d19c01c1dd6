"""CANF-VC fork model tests: ANF ladder invertibility + forward pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.video_canf import CANFVCDmc, CanfMainCoder


def _img(h=64, w=64, seed=0, shift=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8 + 2, w // 8 + 2, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h + 16, w + 16, 3), "linear")
    return jnp.clip(img[:, shift:shift + h, shift:shift + w, :], 0, 1
                    ).astype(jnp.float32)


def test_canf_ladder_algebra():
    """Check the 2-layer additive ladder against its algebraic expansion.

    encode: code = enc0(x) + enc1(x - synth0(enc0(x))); decode (from zeros,
    the CANF-VC generative direction — the residual is only *trained* toward
    zero via x2_mse): x_rec = synth1(y) + synth0(y - enc1(synth1(y))).
    """
    module = CanfMainCoder(2, channel_N=8, channel_M=12)
    x = _img(seed=0)
    contexts = tuple(
        jnp.asarray(np.random.default_rng(i).normal(0, 1, (1, s, s, 8)),
                    jnp.float32)
        for i, s in zip(range(3), (64, 32, 16)))
    params = module.init(jax.random.PRNGKey(0), x, contexts)

    def enc_i(i, v):
        return module.apply(params, v, *contexts,
                            method=lambda m, v, *c: m.analysis[i](v, *c))

    def synth_i(i, code):
        return module.apply(params, code, contexts,
                            method=lambda m, code, c: m._synth(i, code, c))

    x2, code = module.apply(params, x, contexts, method=CanfMainCoder.encode)
    code0 = enc_i(0, x)
    x1_exp = x - synth_i(0, code0)
    code_exp = code0 + enc_i(1, x1_exp)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x1_exp), atol=2e-5)
    np.testing.assert_allclose(np.asarray(code), np.asarray(code_exp),
                               atol=2e-5)

    x_rec = module.apply(params, jnp.zeros_like(x), contexts, code,
                         method=CanfMainCoder.decode)
    s1 = synth_i(1, code)
    rec_exp = s1 + synth_i(0, code - enc_i(1, s1))
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(rec_exp),
                               atol=2e-5)


def test_canfvc_roundtrip():
    from dcvc_tpu.models.runtime import HemVideoRuntime

    module = CANFVCDmc(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb0 = {"ref_frame": x, "ref_feature": None, "ref_y": None,
            "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb0, jnp.ones(()),
                         jnp.ones(()))
    rt = HemVideoRuntime(module, params)
    rt.update(force=True)

    ref = _img(seed=7)
    xx = _img(seed=7, shift=1)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    comp = rt.compress(xx, dpb, 0.9, 0.8)
    dec = rt.decompress(dpb, comp["bit_stream"], 64, 64, 0.9, 0.8)
    for key in ("ref_frame", "ref_y", "ref_mv_y"):
        np.testing.assert_allclose(np.asarray(comp["dpb"][key]),
                                   np.asarray(dec["dpb"][key]),
                                   atol=1e-5, err_msg=key)


def test_canfvc_forward_chain():
    module = CANFVCDmc(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None, "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))

    fwd = jax.jit(lambda p, x, dpb: module.apply(p, x, dpb, 1.0, 1.0))
    ref = _img(seed=1)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    for i in range(2):
        out = fwd(params, _img(seed=1, shift=i + 1), dpb)
        dpb = out["dpb"]
        assert np.isfinite(float(out["bpp"][0]))
        assert np.isfinite(float(out["x2_mse"][0]))
    assert dpb["ref_frame"].shape == (1, 64, 64, 3)


def test_canf_init_from_hem_surgery():
    """The fork's cross-architecture init (train_CANFVC_DMC.py:855-880):
    HEM contextual enc/dec/recon replicate into both ANF ladder layers,
    the trunk transfers by name, DQ keeps its fresh init."""
    import numpy as np

    from dcvc_tpu.models.video_hem import DMCHem
    from dcvc_tpu.utils.port_hem import canf_params_from_hem

    kw = dict(channel_mv=16, channel_N=16, channel_M=24)
    hem = DMCHem(**kw)
    x = jnp.zeros((1, 64, 64, 3))
    dpb_h = {"ref_frame": x, "ref_feature": None, "ref_y": None,
             "ref_mv_y": None}
    hp = hem.init(jax.random.PRNGKey(1), x, dpb_h, jnp.ones(()), jnp.ones(()))

    canf = CANFVCDmc(**kw)
    cp_like = canf.init(jax.random.PRNGKey(2), x, dpb_h, jnp.ones(()),
                        jnp.ones(()))
    cp = canf_params_from_hem(hp, cp_like)

    cc = cp["params"]["contextual_coder"]
    for i in (0, 1):
        np.testing.assert_array_equal(
            np.asarray(cc[f"analysis_{i}"]["conv1"]["kernel"]),
            np.asarray(hp["params"]["contextual_encoder"]["conv1"]["kernel"]))
    # trunk transfers; DQ stays fresh
    np.testing.assert_array_equal(
        np.asarray(cp["params"]["mv_encoder"]["d1"]["conv1"]["kernel"]),
        np.asarray(hp["params"]["mv_encoder"]["d1"]["conv1"]["kernel"]))
    np.testing.assert_array_equal(
        np.asarray(cp["params"]["dq"]["conv1"]["kernel"]),
        np.asarray(cp_like["params"]["dq"]["conv1"]["kernel"]))
    # the surgered tree runs the full forward
    out = canf.apply(cp, x, dpb_h, jnp.ones(()), jnp.ones(()))
    assert np.isfinite(float(jnp.sum(out["bpp"])))

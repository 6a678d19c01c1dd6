"""FULL-MODEL numerical parity vs the reference's own torch code.

Instantiates the reference IntraNoAR / DMC (DCVC-DC) with random init,
ports the weights through utils/port_dc.py, and compares the complete
forward paths (reconstruction + estimated bpp) on identical inputs. This is
the end-to-end checkpoint-porting validation: any topology, layout, padding,
activation or entropy-model mismatch shows up as a diff here.

Reference: DCVC-DC/src/models/image_model.py:109-147 (forward),
video_model.py:559-628 (forward_one_frame).
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

sys.path.insert(0, "/root/reference/DCVC-DC")

import jax.numpy as jnp  # noqa: E402

from dcvc_tpu.utils import port_dc  # noqa: E402

if not os.path.isdir("/root/reference/DCVC-DC"):
    pytest.skip("reference repo unavailable", allow_module_level=True)


def _seed_all():
    torch.manual_seed(0)
    np.random.seed(0)


def _t2n(x):
    return x.detach().cpu().numpy()


@pytest.fixture(scope="module")
def intra_pair():
    from src.models.image_model import IntraNoAR as TorchIntra

    _seed_all()
    tm = TorchIntra()
    tm.eval()
    from dcvc_tpu.models.intra_dc import IntraNoAR

    jm = IntraNoAR()
    params = port_dc.convert_intra_dc(tm.state_dict())
    params = {"params": {k: jnp.asarray(v) if not isinstance(v, dict)
                         else jax_tree(v) for k, v in params["params"].items()}}
    return tm, jm, params


def jax_tree(d):
    return {k: jnp.asarray(v) if not isinstance(v, dict) else jax_tree(v)
            for k, v in d.items()}


def test_intra_full_forward_parity(intra_pair):
    tm, jm, params = intra_pair
    _seed_all()
    x = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        ref = tm(x, q_in_ckpt=True, q_index=0)
    out = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)),
                   jnp.ones(()), jnp.ones(()))
    ref_xhat = _t2n(ref["x_hat"]).transpose(0, 2, 3, 1)
    d_xhat = float(np.max(np.abs(np.asarray(out["x_hat"]) - ref_xhat)))
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    assert d_xhat < 3e-4, f"x_hat maxdiff {d_xhat}"
    assert d_bpp < 2e-3, f"bpp diff {d_bpp}"


@pytest.fixture(scope="module")
def dmc_pair():
    from src.models.video_model import DMC as TorchDMC

    _seed_all()
    tm = TorchDMC()
    tm.eval()
    from dcvc_tpu.models.video_dc import DMC

    jm = DMC()
    params = {"params": jax_tree(
        port_dc.convert_dmc(tm.state_dict())["params"])}
    return tm, jm, params


def test_dmc_full_forward_parity(dmc_pair):
    tm, jm, params = dmc_pair
    _seed_all()
    H, W = 64, 96
    x = torch.rand(1, 3, H, W)
    ref_frame = torch.rand(1, 3, H, W)
    ref_feature = torch.rand(1, 48, H, W) * 0.5
    ref_mv_feature = torch.rand(1, 64, H // 4, W // 4) * 0.5
    ref_y = torch.rand(1, 128, H // 16, W // 16) * 0.5
    ref_mv_y = torch.rand(1, 64, H // 16, W // 16) * 0.5
    dpb_t = {"ref_frame": ref_frame, "ref_feature": ref_feature,
             "ref_mv_feature": ref_mv_feature, "ref_y": ref_y,
             "ref_mv_y": ref_mv_y}
    with torch.no_grad():
        ref = tm.forward_one_frame(x, dpb_t, q_in_ckpt=True, q_index=0,
                                   frame_idx=1)

    def nhwc(t):
        return jnp.asarray(_t2n(t).transpose(0, 2, 3, 1))

    dpb_j = {"ref_frame": nhwc(ref_frame), "ref_feature": nhwc(ref_feature),
             "ref_mv_feature": nhwc(ref_mv_feature), "ref_y": nhwc(ref_y),
             "ref_mv_y": nhwc(ref_mv_y)}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    out = jm.apply(params, nhwc(x), dpb_j, qs, 1)

    ref_xhat = _t2n(ref["dpb"]["ref_frame"]).transpose(0, 2, 3, 1)
    d_xhat = float(np.max(np.abs(
        np.asarray(out["dpb"]["ref_frame"]) - ref_xhat)))
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    assert d_xhat < 1e-3, f"x_hat maxdiff {d_xhat}"
    assert d_bpp < 5e-3, f"bpp diff {d_bpp}"


def test_evc_full_forward_parity():
    evc_path = "/root/reference/EVC"
    if evc_path not in sys.path:
        sys.path.insert(0, evc_path)
    # both repos use the package name `src`; isolate the EVC import
    for mod in [m for m in list(sys.modules) if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    sys.path.remove("/root/reference/DCVC-DC")
    try:
        from src.models.image_model import EVC as TorchEVC
    finally:
        sys.path.insert(0, "/root/reference/DCVC-DC")

    _seed_all()
    tm = TorchEVC()
    tm.eval()
    from dcvc_tpu.models.evc import make_evc

    jm = make_evc("LL")
    params = {"params": jax_tree(
        port_dc.convert_evc(tm.state_dict())["params"])}
    _seed_all()
    x = torch.rand(1, 3, 64, 128)  # y must be a multiple of 4 (EVC pads to 64)
    with torch.no_grad():
        ref = tm(x, q_scale=torch.ones(1))
    out = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)),
                   jnp.ones(()))
    ref_xhat = _t2n(ref["x_hat"]).transpose(0, 2, 3, 1)
    d_xhat = float(np.max(np.abs(np.asarray(out["x_hat"]) - ref_xhat)))
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    for mod in [m for m in list(sys.modules) if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    assert d_xhat < 3e-4, f"x_hat maxdiff {d_xhat}"
    assert d_bpp < 2e-3, f"bpp diff {d_bpp}"


def _import_hem():
    import types

    if "pytorch_msssim" not in sys.modules:
        ms = types.ModuleType("pytorch_msssim")

        class MS_SSIM:  # noqa: N801 - stub (training-only in the reference)
            def __init__(self, *a, **k):
                pass

            def __call__(self, *a, **k):
                return torch.tensor(1.0)

        ms.MS_SSIM = MS_SSIM
        ms.ms_ssim = lambda *a, **k: torch.tensor(1.0)
        sys.modules["pytorch_msssim"] = ms
    hem = "/root/reference/DCVC-HEM"
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    for p in [p for p in list(sys.path) if "reference" in p]:
        sys.path.remove(p)
    sys.path.insert(0, hem)
    from src.models.image_model import IntraNoAR as HemIntra
    from src.models.video_model import CANFVC_DMC as HemCANF
    from src.models.video_model import DMC as HemDMC
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    sys.path.remove(hem)
    sys.path.insert(0, "/root/reference/DCVC-DC")
    return HemIntra, HemDMC, HemCANF


def _tree_paths(tree, pre=""):
    out = set()
    for k, v in tree.items():
        if isinstance(v, dict):
            out |= _tree_paths(v, f"{pre}{k}/")
        else:
            out.add((f"{pre}{k}", tuple(np.shape(v))))
    return out


def test_hem_intra_full_forward_parity():
    """Random-init HEM nets have unbounded magnitudes (no trained scaling),
    so quantization-boundary flips make end-to-end x_hat comparison
    meaningless; validate the stages tightly instead: converted tree
    structure, analysis transform (continuous), estimated bpp, and the
    synthesis transform fed with the REFERENCE's own y_hat."""
    import jax

    from dcvc_tpu.utils import port_hem

    HemIntra, _, _ = _import_hem()
    _seed_all()
    tm = HemIntra()
    tm.eval()
    from dcvc_tpu.models.intra_hem import IntraNoARHem

    jm = IntraNoARHem()
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.ones(()))
    params_t = port_hem.convert_intra_hem(tm.state_dict())
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}
    _seed_all()
    x = torch.rand(1, 3, 64, 128)
    with torch.no_grad():
        ref = tm(x, torch.ones(1))
        y_ref = tm.enc(x)
    out = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)),
                   jnp.ones(()))
    y_ours = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)),
                      method=lambda m, v: m.enc(v))
    y_ref_n = _t2n(y_ref).transpose(0, 2, 3, 1)
    rel = np.max(np.abs(np.asarray(y_ours) - y_ref_n)) / (
        np.max(np.abs(y_ref_n)) + 1e-6)
    assert rel < 1e-4, f"analysis rel diff {rel}"
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    assert d_bpp < 0.05, f"bpp diff {d_bpp}"
    _seed_all()
    y_hat_t = torch.rand(1, 192, 4, 8) * 2 - 1
    with torch.no_grad():
        x_syn_ref = tm.refine(tm.dec(y_hat_t))
    x_syn = jm.apply(params, jnp.asarray(_t2n(y_hat_t).transpose(0, 2, 3, 1)),
                     jnp.ones(()), method=lambda m, yh, q: m.synthesize(yh, q))
    ref_n = _t2n(x_syn_ref).transpose(0, 2, 3, 1)
    rel = np.max(np.abs(np.asarray(x_syn) - ref_n)) / (
        np.max(np.abs(ref_n)) + 1e-6)
    assert rel < 1e-4, f"synthesis rel diff {rel}"


def test_hem_dmc_full_forward_parity():
    """Tree structure + motion path (flow) + entropy path (bpp, relative);
    end-to-end x_hat explodes on random init (see intra docstring)."""
    import jax

    from dcvc_tpu.utils import port_hem

    _, HemDMC, _ = _import_hem()
    _seed_all()
    tm = HemDMC(anchor_num=4)
    tm.eval()
    from dcvc_tpu.models.video_hem import DMCHem

    jm = DMCHem()
    params_t = port_hem.convert_dmc_hem(tm.state_dict())
    dpb0 = {"ref_frame": jnp.zeros((1, 64, 64, 3)), "ref_feature": None,
            "ref_y": None, "ref_mv_y": None}
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), dpb0,
                   jnp.ones(()), jnp.ones(()))
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    H, W = 64, 128
    x = torch.rand(1, 3, H, W)
    ref_frame = torch.rand(1, 3, H, W)
    ref_feature = torch.rand(1, 64, H, W) * 0.5
    ref_y = torch.rand(1, 96, H // 16, W // 16) * 0.5
    ref_mv_y = torch.rand(1, 64, H // 16, W // 16) * 0.5
    dpb_t = {"ref_frame": ref_frame, "ref_feature": ref_feature,
             "ref_y": ref_y, "ref_mv_y": ref_mv_y}
    with torch.no_grad():
        ref = tm.forward_one_frame(x, dpb_t,
                                   mv_y_q_scale=tm.mv_y_q_scale[0:1],
                                   y_q_scale=tm.y_q_scale[0:1])
        mv_ref = tm.optic_flow(x, ref_frame)

    def nhwc(t):
        return jnp.asarray(_t2n(t).transpose(0, 2, 3, 1))

    dpb_j = {"ref_frame": nhwc(ref_frame), "ref_feature": nhwc(ref_feature),
             "ref_y": nhwc(ref_y), "ref_mv_y": nhwc(ref_mv_y)}
    out = jm.apply(params, nhwc(x), dpb_j, jnp.ones(()), jnp.ones(()))

    mv_ours = jm.apply(params, nhwc(x), nhwc(ref_frame),
                       method=lambda m, a, b: m.optic_flow(a, b))
    mv_ref_n = _t2n(mv_ref).transpose(0, 2, 3, 1)
    rel_mv = np.max(np.abs(np.asarray(mv_ours) - mv_ref_n)) / (
        np.max(np.abs(mv_ref_n)) + 1e-6)
    assert rel_mv < 1e-3, f"optic_flow rel diff {rel_mv}"
    rel_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0])) / (
        abs(float(ref["bpp"])) + 1e-6)
    assert rel_bpp < 0.02, f"bpp rel diff {rel_bpp}"


def test_tcm_dmc_full_forward_parity():
    """Tree structure + flow + entropy path for the TCM generation."""
    import types

    import jax

    from dcvc_tpu.utils import port_tcm

    if "pytorch_msssim" not in sys.modules:
        ms = types.ModuleType("pytorch_msssim")
        ms.MS_SSIM = type("MS_SSIM", (), {"__init__": lambda s, *a, **k: None,
                                          "__call__": lambda s, *a, **k:
                                          torch.tensor(1.0)})
        ms.ms_ssim = lambda *a, **k: torch.tensor(1.0)
        sys.modules["pytorch_msssim"] = ms
    tcm = "/root/reference/DCVC-TCM"
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    for p in [p for p in list(sys.path) if "reference" in p]:
        sys.path.remove(p)
    sys.path.insert(0, tcm)
    from src.models.video_net_dmc import DMC as TcmDMC
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    sys.path.remove(tcm)
    sys.path.insert(0, "/root/reference/DCVC-DC")

    _seed_all()
    tm = TcmDMC()
    tm.eval()
    from dcvc_tpu.models.video_tcm import DMCTcm

    jm = DMCTcm()
    params_t = port_tcm.convert_dmc_tcm(tm.state_dict())
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 64, 64, 3)), None)
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    H, W = 64, 128
    x = torch.rand(1, 3, H, W)
    ref_frame = torch.rand(1, 3, H, W)
    with torch.no_grad():
        ref = tm.forward_one_frame(x, ref_frame, None)
        mv_ref = tm.optic_flow(x, ref_frame)

    def nhwc(t):
        return jnp.asarray(_t2n(t).transpose(0, 2, 3, 1))

    out = jm.apply(params, nhwc(x), nhwc(ref_frame), None)
    mv_ours = jm.apply(params, nhwc(x), nhwc(ref_frame),
                       method=lambda m, a, b: m.optic_flow(a, b))
    mv_ref_n = _t2n(mv_ref).transpose(0, 2, 3, 1)
    rel_mv = np.max(np.abs(np.asarray(mv_ours) - mv_ref_n)) / (
        np.max(np.abs(mv_ref_n)) + 1e-6)
    assert rel_mv < 1e-3, f"optic_flow rel diff {rel_mv}"
    rel_bpp = abs(float(ref["bpp"]) - float(np.asarray(out["bpp"]).reshape(-1)[0])) / (
        abs(float(ref["bpp"])) + 1e-6)
    assert rel_bpp < 0.02, f"bpp rel diff {rel_bpp}"


def test_gen1_dcvc_full_forward_parity():
    """Gen-1 DCVC_net: tree structure, flow and full estimated-bpp parity
    (the AR prior + entropy parameter nets feed bpp, so this covers them)."""
    import types

    import jax

    from dcvc_tpu.utils import port_gen1

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToPILImage = object
        tvt.ToTensor = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    gen1 = "/root/reference/DCVC"
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    for p in [p for p in list(sys.path) if "reference" in p]:
        sys.path.remove(p)
    sys.path.insert(0, gen1)
    from src.models.DCVC_net import DCVC_net
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    sys.path.remove(gen1)
    sys.path.insert(0, "/root/reference/DCVC-DC")

    _seed_all()
    tm = DCVC_net()
    tm.eval()
    from dcvc_tpu.models.video_dcvc import DCVCNet

    jm = DCVCNet()
    params_t = port_gen1.convert_dcvc_gen1(tm.state_dict())
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.zeros((1, 64, 64, 3)))
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    x = torch.rand(1, 3, 64, 128)
    ref_frame = torch.rand(1, 3, 64, 128)
    with torch.no_grad():
        ref = tm(ref_frame, x)
        mv_ref = tm.opticFlow(x, ref_frame)

    def nhwc(t):
        return jnp.asarray(_t2n(t).transpose(0, 2, 3, 1))

    out = jm.apply(params, nhwc(ref_frame), nhwc(x))
    mv_ours = jm.apply(params, nhwc(x), nhwc(ref_frame),
                       method=lambda m, a, b: m.optic_flow(a, b))
    mv_ref_n = _t2n(mv_ref).transpose(0, 2, 3, 1)
    rel_mv = np.max(np.abs(np.asarray(mv_ours) - mv_ref_n)) / (
        np.max(np.abs(mv_ref_n)) + 1e-6)
    assert rel_mv < 1e-3, f"optic_flow rel diff {rel_mv}"
    rel_bpp = abs(float(ref["bpp"]) -
                  float(np.asarray(out["bpp"]).reshape(-1)[0])) / (
        abs(float(ref["bpp"])) + 1e-6)
    assert rel_bpp < 0.01, f"bpp rel diff {rel_bpp}"


def _import_gen1_models(*names):
    """Import model classes from the gen-1 reference (/root/reference/DCVC),
    isolating its `src` package from the DCVC-DC one already on sys.path."""
    import types

    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.ToPILImage = object
        tvt.ToTensor = object
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    gen1 = "/root/reference/DCVC"
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    for p in [p for p in list(sys.path) if "reference" in p]:
        sys.path.remove(p)
    sys.path.insert(0, gen1)
    from src.models import priors as _gp
    from src.models import waseda as _gw
    pool = {**vars(_gp), **vars(_gw)}
    out = tuple(pool[n] for n in names)
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]
    sys.path.remove(gen1)
    sys.path.insert(0, "/root/reference/DCVC-DC")
    return out


@pytest.mark.parametrize("kind", ["factorized", "scale", "meanscale"])
def test_zoo_full_forward_parity(kind):
    """CompressAI-style intra zoo (gen-1's I-frame codecs): end-to-end
    x_hat parity ~1e-7 with ported weights."""
    import jax

    from dcvc_tpu.utils import port_zoo

    FactorizedPrior, ScaleHyperprior, MeanScaleHyperprior = \
        _import_gen1_models("FactorizedPrior", "ScaleHyperprior",
                            "MeanScaleHyperprior")

    from dcvc_tpu.models import intra_zoo

    TM, JM = {"factorized": (FactorizedPrior, intra_zoo.FactorizedPrior),
              "scale": (ScaleHyperprior, intra_zoo.ScaleHyperprior),
              "meanscale": (MeanScaleHyperprior,
                            intra_zoo.MeanScaleHyperprior)}[kind]
    _seed_all()
    tm = TM(128, 192)
    tm.eval()
    jm = JM(N=128, M=192)
    params_t = port_zoo.convert_zoo(tm.state_dict(), kind)
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    x = torch.rand(1, 3, 64, 128)
    with torch.no_grad():
        ref = tm(x)
    out = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)))
    ref_xhat = _t2n(ref["x_hat"]).transpose(0, 2, 3, 1)
    d = float(np.max(np.abs(np.asarray(out["x_hat"]) - ref_xhat)))
    assert d < 1e-4, f"x_hat maxdiff {d}"


@pytest.mark.parametrize("kind", ["joint", "cheng2020"])
def test_zoo_ar_forward_parity(kind):
    """mbt2018 / cheng2020-anchor staged parity with ported weights.

    The reference forward reconstructs from means-UNAWARE rounding
    (DCVC/src/models/priors.py:497 y_hat = round(y)) while its actual
    compress/decompress path (:585-607) and our model use means-aware
    rounding, so x_hat is compared staged through g_s on the reference's
    own y_hat; everything else end-to-end."""
    import jax

    from dcvc_tpu.models import intra_zoo
    from dcvc_tpu.utils import port_zoo

    TJ, TC = _import_gen1_models("JointAutoregressiveHierarchicalPriors",
                                 "Cheng2020Anchor")
    _seed_all()
    if kind == "joint":
        tm = TJ(64, 96)
        jm = intra_zoo.JointAutoregressiveHierarchicalPriors(N=64, M=96)
    else:
        tm = TC(64)
        jm = intra_zoo.Cheng2020Anchor(N=64, M=64)
    tm.eval()
    params_t = port_zoo.convert_zoo(tm.state_dict(), kind)
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    x = torch.rand(1, 3, 64, 128)
    with torch.no_grad():
        y = tm.g_a(x)
        z = tm.h_a(y)
        z_hat, _ = tm.entropy_bottleneck(z)
        hyper = tm.h_s(z_hat)
        y_hat = torch.round(y)
        ctx = tm.context_prediction(y_hat)
        gp_ref = tm.entropy_parameters(torch.cat((hyper, ctx), dim=1))
        x_staged = tm.g_s(y_hat)
        ref = tm(x)

    def nhwc(t):
        return jnp.asarray(_t2n(t).transpose(0, 2, 3, 1))

    def rel(a, b):
        b = np.asarray(b)
        return float(np.max(np.abs(np.asarray(a) - b)) /
                     (np.max(np.abs(b)) + 1e-9))

    y_ours = jm.apply(params, nhwc(x), method=lambda m, v: m.g_a(v))
    assert rel(y_ours, _t2n(y).transpose(0, 2, 3, 1)) < 1e-4
    z_ours = jm.apply(params, y_ours, method=lambda m, v: m.h_a(v))
    assert rel(z_ours, _t2n(z).transpose(0, 2, 3, 1)) < 1e-4

    gp_ours = jm.apply(
        params, nhwc(z_hat), nhwc(y_hat),
        method=lambda m, zh, yh: m.entropy_parameters(
            jnp.concatenate([m.h_s(zh), m.context_prediction(yh)], axis=-1)))
    assert rel(gp_ours, _t2n(gp_ref).transpose(0, 2, 3, 1)) < 5e-4

    xh_ours = jm.apply(params, nhwc(y_hat), method=lambda m, v: m.g_s(v))
    d = float(np.max(np.abs(np.asarray(xh_ours) -
                            _t2n(x_staged).transpose(0, 2, 3, 1))))
    assert d < 1e-4, f"x_hat (staged) maxdiff {d}"

    pix = x.shape[2] * x.shape[3]
    bits_ref = float(sum((-torch.log2(lk)).sum()
                         for lk in ref["likelihoods"].values()))
    out = jm.apply(params, nhwc(x))
    bpp_ours = float(np.asarray(out["bpp"]).reshape(-1)[0])
    rel_bpp = abs(bits_ref / pix - bpp_ours) / (bits_ref / pix + 1e-9)
    assert rel_bpp < 0.01, f"bpp rel diff {rel_bpp}"


def test_canf_dmc_full_forward_parity():
    """CANFVC_DMC (fork): converted tree structure, flow, the full ANF
    encode/decode ladder via x2 + BDQ stages, and estimated bpp."""
    import jax

    from dcvc_tpu.utils import port_hem

    _, _, HemCANF = _import_hem()
    _seed_all()
    tm = HemCANF(anchor_num=4)
    tm.eval()
    from dcvc_tpu.models.video_canf import CANFVCDmc

    jm = CANFVCDmc()
    params_t = port_hem.convert_canf_dmc(tm.state_dict())
    dpb0 = {"ref_frame": jnp.zeros((1, 64, 64, 3)), "ref_feature": None,
            "ref_y": None, "ref_mv_y": None}
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), dpb0,
                   jnp.ones(()), jnp.ones(()))
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    H, W = 64, 128
    x = torch.rand(1, 3, H, W)
    ref_frame = torch.rand(1, 3, H, W)
    ref_y = torch.rand(1, 96, H // 16, W // 16) * 0.5
    ref_mv_y = torch.rand(1, 64, H // 16, W // 16) * 0.5
    dpb_t = {"ref_frame": ref_frame, "ref_feature": None,
             "ref_y": ref_y, "ref_mv_y": ref_mv_y}
    with torch.no_grad():
        ref = tm.forward_one_frame(x, dpb_t,
                                   mv_y_q_scale=tm.mv_y_q_scale[0:1],
                                   y_q_scale=tm.y_q_scale[0:1])
        mv_ref = tm.optic_flow(x, ref_frame)

    def nhwc(t):
        return jnp.asarray(_t2n(t).transpose(0, 2, 3, 1))

    dpb_j = {"ref_frame": nhwc(ref_frame), "ref_feature": None,
             "ref_y": nhwc(ref_y), "ref_mv_y": nhwc(ref_mv_y)}
    out = jm.apply(params, nhwc(x), dpb_j, jnp.ones(()), jnp.ones(()))

    mv_ours = jm.apply(params, nhwc(x), nhwc(ref_frame),
                       method=lambda m, a, b: m.optic_flow(a, b))
    mv_ref_n = _t2n(mv_ref).transpose(0, 2, 3, 1)
    rel_mv = np.max(np.abs(np.asarray(mv_ours) - mv_ref_n)) / (
        np.max(np.abs(mv_ref_n)) + 1e-6)
    assert rel_mv < 1e-3, f"optic_flow rel diff {rel_mv}"
    rel_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0])) / (
        abs(float(ref["bpp"])) + 1e-6)
    assert rel_bpp < 0.02, f"bpp rel diff {rel_bpp}"
    # x2 (ANF last-layer residual regularizer), sum-over-CHW/(H*W) in both
    ref_x2 = float(ref["x2_mse"])
    ours_x2 = float(out["x2_mse"][0])
    assert abs(ref_x2 - ours_x2) / (abs(ref_x2) + 1e-6) < 0.05, \
        f"x2_mse rel diff {ref_x2} vs {ours_x2}"


def _purge_src_modules():
    for mod in [m for m in list(sys.modules)
                if m == "src" or m.startswith("src.")]:
        del sys.modules[mod]


def test_evc_scalable_checkpoint_porting():
    """Scale_EVC: native scalable checkpoints (encs.{i} banks) and plain
    EVC checkpoints (single encoder replicated, the reference's remap in
    scalable_encoder_model.py:45-69) both port; forward parity at a fixed
    forward_enc_id."""
    import jax

    # hermetic reference import: restore sys.path exactly and purge the
    # shared `src` package name afterwards, or later parity tests import
    # the wrong reference repo
    saved_path = list(sys.path)
    _purge_src_modules()
    sys.path[:] = [p for p in sys.path if "reference" not in p]
    sys.path.insert(0, "/root/reference/EVC")
    try:
        from src.models.scalable_encoder_model import ScalableEnc
    finally:
        sys.path[:] = saved_path
    try:
        _body_evc_scalable(ScalableEnc)
    finally:
        # a mid-test failure must not leak EVC's `src` package into later
        # parity tests that import the DCVC-DC reference
        _purge_src_modules()


def _body_evc_scalable(ScalableEnc):
    import jax


    _seed_all()
    tm = ScalableEnc(forward_enc_id=1)
    tm.eval()
    from dcvc_tpu.models.evc_scalable import ScalableEVC

    jm = ScalableEVC()
    params_t = port_dc.convert_evc_scalable(tm.state_dict())
    like = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   jnp.ones(()))
    assert _tree_paths(like["params"]) == _tree_paths(params_t["params"])
    params = {"params": jax_tree(params_t["params"])}

    _seed_all()
    x = torch.rand(1, 3, 64, 128)
    with torch.no_grad():
        ref = tm(x, q_scale=torch.ones(1))
    out = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)),
                   jnp.ones(()), 1)
    ref_xhat = _t2n(ref["x_hat"]).transpose(0, 2, 3, 1)
    d_xhat = float(np.max(np.abs(np.asarray(out["x_hat"]) - ref_xhat)))
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    assert d_xhat < 3e-4, f"x_hat maxdiff {d_xhat}"
    assert d_bpp < 2e-3, f"bpp diff {d_bpp}"

    # plain-EVC checkpoint: single encoder replicated onto every bank;
    # build a scalable-compatible dict by reusing the scalable model's
    # non-enc weights with one encoder renamed to the plain `enc.` prefix
    sd = tm.state_dict()
    plain = {k: v for k, v in sd.items() if not k.startswith("encs.")}
    enc0 = {k.replace("encs.1.", "enc."): v for k, v in sd.items()
            if k.startswith("encs.1.")}
    plain.update(enc0)
    params_r = port_dc.convert_evc_scalable(plain)
    assert _tree_paths(like["params"]) == _tree_paths(params_r["params"])
    r = params_r["params"]
    for i in (1, 2, 3):
        a = np.asarray(r[f"encs_{i}"]["down1"]["conv1"]["kernel"])
        b = np.asarray(r["encs_0"]["down1"]["conv1"]["kernel"])
        np.testing.assert_array_equal(a, b)

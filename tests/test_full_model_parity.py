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

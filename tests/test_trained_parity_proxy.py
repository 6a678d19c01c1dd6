"""Trained-weight porting-parity proxy (VERDICT round-1 item #2 fallback).

Published checkpoints remain undownloadable in this environment, so the
strongest available proxy for trained-weight RD parity is: take the
reference's own torch model, TRAIN it for a few dozen RD steps on synthetic
data (weights leave the random-init regime and acquire trained-like
statistics: means drift, scales tighten, bit estimators sharpen), port the
resulting state_dict through our converters, and assert full-forward parity
at the same tolerances as the random-init tests. Error amplification through
trained dynamics differs from random init — this catches it without the
downloads.

Reference: DCVC-DC/src/models/image_model.py:109-147,
video_model.py:559-628.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

if not os.path.isdir("/root/reference/DCVC-DC"):
    pytest.skip("reference repo unavailable", allow_module_level=True)

sys.path.insert(0, "/root/reference/DCVC-DC")

import jax.numpy as jnp  # noqa: E402

from dcvc_tpu.utils import port_dc  # noqa: E402


def _seed_all():
    torch.manual_seed(0)
    np.random.seed(0)


def _t2n(x):
    return x.detach().cpu().numpy()


def _jax_tree(d):
    return {k: jnp.asarray(v) if not isinstance(v, dict) else _jax_tree(v)
            for k, v in d.items()}


def _synthetic_batch(rng, B, H, W):
    """Smooth textures (blurred noise) — gives non-trivial rate/distortion
    structure unlike white noise."""
    from scipy import ndimage

    x = rng.random((B, 3, H, W))
    x = ndimage.gaussian_filter(x, sigma=(0, 0, 2, 2))
    x = (x - x.min()) / (x.max() - x.min() + 1e-9)
    return torch.tensor(x, dtype=torch.float32)


def test_intra_parity_after_torch_training():
    from src.models.image_model import IntraNoAR as TorchIntra

    _seed_all()
    tm = TorchIntra()
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-4)
    rng = np.random.default_rng(0)
    for step in range(30):
        x = _synthetic_batch(rng, 2, 64, 64)
        out = tm(x, q_in_ckpt=True, q_index=step % 4)
        mse = torch.mean((out["x_hat"] - x) ** 2)
        loss = 256.0 * mse + out["bpp"].mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0)
        opt.step()
    tm.eval()

    from dcvc_tpu.models.intra_dc import IntraNoAR

    jm = IntraNoAR()
    params = {"params": _jax_tree(
        port_dc.convert_intra_dc(tm.state_dict())["params"])}

    _seed_all()
    x = torch.rand(1, 3, 64, 96)
    with torch.no_grad():
        ref = tm(x, q_in_ckpt=True, q_index=0)
    out = jm.apply(params, jnp.asarray(_t2n(x).transpose(0, 2, 3, 1)),
                   jnp.ones(()), jnp.ones(()))
    ref_xhat = _t2n(ref["x_hat"]).transpose(0, 2, 3, 1)
    d_xhat = float(np.max(np.abs(np.asarray(out["x_hat"]) - ref_xhat)))
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    assert d_xhat < 3e-4, f"x_hat maxdiff {d_xhat} after training"
    assert d_bpp < 2e-3, f"bpp diff {d_bpp} after training"


def test_dmc_parity_after_torch_training():
    from src.models.video_model import DMC as TorchDMC

    _seed_all()
    tm = TorchDMC()
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=1e-4)
    rng = np.random.default_rng(1)
    H = W = 64
    for step in range(12):
        x = _synthetic_batch(rng, 1, H, W)
        # shifted reference: real motion through the warp path
        ref_frame = torch.roll(x, shifts=2, dims=3)
        dpb = {"ref_frame": ref_frame, "ref_feature": None,
               "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
        out = tm.forward_one_frame(x, dpb, q_in_ckpt=True,
                                   q_index=step % 4, frame_idx=0)
        mse = torch.mean((out["dpb"]["ref_frame"] - x) ** 2)
        loss = 256.0 * mse + out["bpp"].mean()
        opt.zero_grad()
        loss.backward()
        torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0)
        opt.step()
    tm.eval()

    from dcvc_tpu.models.video_dc import DMC

    jm = DMC()
    params = {"params": _jax_tree(
        port_dc.convert_dmc(tm.state_dict())["params"])}

    _seed_all()
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

    dpb_j = {k: nhwc(v) for k, v in dpb_t.items()}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    out = jm.apply(params, nhwc(x), dpb_j, qs, 1)

    ref_xhat = _t2n(ref["dpb"]["ref_frame"]).transpose(0, 2, 3, 1)
    d_xhat = float(np.max(np.abs(
        np.asarray(out["dpb"]["ref_frame"]) - ref_xhat)))
    d_bpp = abs(float(ref["bpp"]) - float(out["bpp"][0]))
    assert d_xhat < 1e-3, f"x_hat maxdiff {d_xhat} after training"
    assert d_bpp < 5e-3, f"bpp diff {d_bpp} after training"

"""Pallas block warp (ops/block_warp.py) correctness.

The kernel runs in Pallas interpret mode on CPU; `block_warp_ref` is the
pure-jnp semantic oracle. Exactness contract: equals ops/warp.flow_warp
(reference grid_sample border semantics, DCVC-DC/src/models/video_net.py:
8-38) wherever per-pixel offsets stay within (-Dh..Dh)x(-Rv..Rv) of the
block's rounded median flow; bounded window clamp beyond.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dcvc_tpu.ops.block_warp import block_warp, block_warp_ref
from dcvc_tpu.ops.warp import flow_warp


def _rand(shape, rng, lo=0.0, hi=1.0):
    return jnp.asarray(rng.random(shape) * (hi - lo) + lo, jnp.float32)


@pytest.mark.parametrize("shape,blk", [
    ((2, 24, 48, 3), dict(Dh=4, Rv=2, BH=8, BW=16)),
    ((1, 16, 40, 2), dict(Dh=3, Rv=1, BH=8, BW=8)),
    ((3, 17, 33, 1), dict(Dh=4, Rv=2, BH=8, BW=16)),  # pad-to-block path
])
def test_kernel_matches_oracle(shape, blk):
    rng = np.random.default_rng(0)
    im = _rand(shape, rng)
    for scale, shift in [(0.5, (3.0, -2.0)), (8.0, (0.0, 0.0)),
                         (0.3, (25.0, -40.0))]:
        flow = jnp.asarray(
            rng.normal(0, scale, shape[:3] + (2,)) + np.array(shift),
            jnp.float32)
        ref = block_warp_ref(im, flow, **blk)
        ker = block_warp(im, flow, interpret=True, **blk)
        np.testing.assert_allclose(np.asarray(ker), np.asarray(ref),
                                   atol=1e-6)


@pytest.mark.parametrize("depth", [3, 4, 8, 64])
def test_pipeline_depth_matches_oracle(depth):
    """The DMA pipeline depth (slots in flight) must not change results —
    including depth > total blocks (clamped) and non-power-of-two."""
    rng = np.random.default_rng(7)
    im = _rand((2, 24, 48, 3), rng)
    flow = jnp.asarray(rng.normal(0, 4.0, (2, 24, 48, 2)), jnp.float32)
    blk = dict(Dh=4, Rv=2, BH=8, BW=16)
    ref = block_warp_ref(im, flow, **blk)
    ker = block_warp(im, flow, interpret=True, depth=depth, **blk)
    np.testing.assert_allclose(np.asarray(ker), np.asarray(ref), atol=1e-6)


def test_exact_within_window():
    """Smooth flow (any global magnitude, sub-window local deviation)
    must reproduce flow_warp exactly, including image borders."""
    rng = np.random.default_rng(1)
    im = _rand((2, 24, 48, 3), rng)
    for shift in [(0.0, 0.0), (3.3, -2.7), (-30.0, 15.0), (200.0, 200.0)]:
        flow = jnp.asarray(
            rng.normal(0, 0.5, (2, 24, 48, 2)) + np.array(shift),
            jnp.float32)
        ref = block_warp_ref(im, flow, Dh=4, Rv=2, BH=8, BW=16)
        exact = flow_warp(im, flow)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(exact),
                                   atol=1e-5)


def test_ramp_flows_exact():
    """Linear zoom/shear ramps stay within the window at these scales."""
    rng = np.random.default_rng(2)
    H, W = 32, 64
    im = _rand((1, H, W, 2), rng)
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    for fx, fy in [(0.04 * (xs - W / 2), 0.04 * (ys - H / 2)),  # zoom
                   (0.06 * ys, np.zeros_like(ys))]:             # shear
        flow = jnp.asarray(np.stack([fx, fy], -1)[None], jnp.float32)
        ref = block_warp_ref(im, flow, Dh=8, Rv=2, BH=8, BW=32)
        exact = flow_warp(im, flow)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(exact),
                                   atol=1e-5)


def test_clamp_is_bounded():
    """Wild flow clamps to the window but output stays a convex combo of
    source texels (no NaN / out-of-range reads)."""
    rng = np.random.default_rng(3)
    im = _rand((1, 16, 32, 1), rng)
    flow = jnp.asarray(rng.normal(0, 20.0, (1, 16, 32, 2)), jnp.float32)
    out = np.asarray(block_warp_ref(im, flow, Dh=4, Rv=1, BH=8, BW=16))
    assert np.isfinite(out).all()
    assert out.min() >= float(im.min()) - 1e-6
    assert out.max() <= float(im.max()) + 1e-6


def test_bf16_cast_path():
    rng = np.random.default_rng(4)
    im = _rand((1, 16, 32, 2), rng).astype(jnp.bfloat16)
    flow = jnp.asarray(rng.normal(0, 0.5, (1, 16, 32, 2)), jnp.float32)
    out = block_warp(im, flow, Dh=4, Rv=1, BH=8, BW=16, interpret=True)
    assert out.dtype == jnp.bfloat16
    ref = block_warp_ref(im.astype(jnp.float32), flow, Dh=4, Rv=1,
                         BH=8, BW=16)
    np.testing.assert_allclose(np.asarray(out, dtype=np.float32),
                               np.asarray(ref), atol=1e-2)


def test_dmc_mc_warp_mode_wiring():
    """DMC forward with mc_warp_mode + od_warp_mode block modes runs and
    stays close to the exact-warp forward (random-init flows are tiny, so
    block bases are ~0 and the approximation is in its exact regime)."""
    import jax
    from dcvc_tpu.models.video_dc import DMC

    x = jnp.asarray(np.random.default_rng(0).random((1, 64, 64, 3)),
                    jnp.float32)
    dpb = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}

    outs = {}
    for name, kw in [("exact", {}),
                     ("block", dict(od_warp_mode="block:4,2,8,128",
                                    mc_warp_mode="block:4,2,8,128"))]:
        m = DMC(**kw)
        params = m.init(jax.random.PRNGKey(0), x, dpb, qs, 0)
        outs[name] = m.apply(params, x, dpb, qs, 1)
    for k in ("bit", "bpp"):
        np.testing.assert_allclose(np.asarray(outs["block"][k]),
                                   np.asarray(outs["exact"][k]), rtol=5e-3)
    d = np.abs(np.asarray(outs["block"]["dpb"]["ref_frame"]
                          - outs["exact"]["dpb"]["ref_frame"]))
    assert d.max() < 5e-3, d.max()

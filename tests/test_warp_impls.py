"""flow_warp gather formulations must be interchangeable.

The TPU-fast formulations (rowpair: [1,2,C] slices; packed: row pairs folded
into channels, [1,2,2C] slices) must reproduce the naive advanced-indexing
form — which is itself golden-tested against torch grid_sample(border,
align_corners=True) in test_torch_parity — including border collapse and
batched inputs (reference semantics: DCVC-DC/src/models/video_net.py:8-38).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.ops import warp as warp_mod


CASES = [
    # (B, H, W, C, flow_scale)
    (1, 33, 47, 3, 200.0),   # flows far outside the image: border collapse
    (1, 24, 31, 48, 9.0),
    (2, 16, 20, 5, 7.0),     # batched -> lax.map path
    (3, 12, 14, 2, 3.0),
]


@pytest.mark.parametrize("impl", ["rowpair", "packed"])
@pytest.mark.parametrize("case", CASES)
def test_fast_impl_matches_naive(impl, case):
    B, H, W, C, scale = case
    im = jax.random.uniform(jax.random.PRNGKey(C), (B, H, W, C))
    flow = (jax.random.uniform(jax.random.PRNGKey(1), (B, H, W, 2)) - 0.5) * scale
    ref = warp_mod._flow_warp_naive(im, flow)
    fast = (warp_mod._flow_warp_rowpair if impl == "rowpair"
            else warp_mod._flow_warp_packed)
    if B == 1:
        out = fast(im, flow)
    else:
        out = jax.lax.map(lambda ab: fast(ab[0][None], ab[1][None])[0],
                          (im, flow))
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-6


def test_bf16_packed_close_to_f32():
    im = jax.random.uniform(jax.random.PRNGKey(0), (1, 24, 31, 8))
    flow = (jax.random.uniform(jax.random.PRNGKey(1), (1, 24, 31, 2)) - 0.5) * 5
    ref = warp_mod._flow_warp_naive(im, flow)
    out = warp_mod._flow_warp_packed(im.astype(jnp.bfloat16), flow)
    assert float(jnp.max(jnp.abs(ref - out.astype(jnp.float32)))) < 2e-2


def test_default_flow_warp_jits_and_grads():
    im = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 18, 4))
    flow = (jax.random.uniform(jax.random.PRNGKey(1), (1, 16, 18, 2)) - 0.5) * 4

    def loss(f):
        return jnp.sum(warp_mod.flow_warp(im, f) ** 2)

    g = jax.jit(jax.grad(loss))(flow)
    assert g.shape == flow.shape
    assert bool(jnp.all(jnp.isfinite(g)))


class TestTileWarp:
    """tile_warp (approximate row-tile warp): exact within its residual
    bound, bounded approximation outside, batch/odd-width handling."""

    def _smooth_off(self, H, W, amp=3.0):
        gy, gx = jnp.meshgrid(jnp.linspace(0, 6.28, H),
                              jnp.linspace(0, 6.28, W), indexing="ij")
        return jnp.stack([amp * jnp.sin(gx), amp * jnp.cos(gy)],
                         -1)[None]

    def test_matches_exact_within_bound(self):
        from dcvc_tpu.ops.warp import flow_warp, tile_warp

        rng = np.random.default_rng(0)
        im = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
        off = self._smooth_off(64, 128)
        a = np.asarray(flow_warp(im, off))
        b = np.asarray(tile_warp(im, off, 16, 2))
        # interior: smooth offsets deviate <R from any 16-run mean
        assert np.max(np.abs(a - b)[:, 4:-4, 16:-16]) < 1e-5

    def test_tile_constant_offsets_exact_everywhere(self):
        from dcvc_tpu.ops.warp import flow_warp, tile_warp

        rng = np.random.default_rng(1)
        im = jnp.asarray(rng.random((1, 32, 64, 5)), jnp.float32)
        for ox, oy in ((0.0, 0.0), (2.5, -1.25), (-3.0, 4.5)):
            off = jnp.zeros((1, 32, 64, 2)).at[..., 0].set(ox).at[..., 1].set(oy)
            a = np.asarray(flow_warp(im, off))
            b = np.asarray(tile_warp(im, off, 16, 2))
            np.testing.assert_allclose(b, a, atol=1e-5)

    def test_batch_matches_loop(self):
        from dcvc_tpu.ops.warp import tile_warp

        rng = np.random.default_rng(2)
        im = jnp.asarray(rng.random((3, 32, 64, 2)), jnp.float32)
        off = jnp.concatenate([self._smooth_off(32, 64, a)
                               for a in (1.0, 2.0, 3.0)])
        full = np.asarray(tile_warp(im, off, 16, 2))
        for b in range(3):
            one = np.asarray(tile_warp(im[b:b + 1], off[b:b + 1], 16, 2))
            np.testing.assert_allclose(full[b:b + 1], one, atol=1e-6)

    def test_width_not_multiple_of_tile(self):
        from dcvc_tpu.ops.warp import flow_warp, tile_warp

        rng = np.random.default_rng(3)
        im = jnp.asarray(rng.random((1, 32, 56, 3)), jnp.float32)
        # low amplitude: at W=56 the field varies fast per 16-px run, and
        # amp=3 legitimately exceeds the residual bound at tile boundaries
        off = self._smooth_off(32, 56, amp=1.0)
        a = np.asarray(flow_warp(im, off))
        b = np.asarray(tile_warp(im, off, 16, 2))
        assert b.shape == a.shape
        assert np.max(np.abs(a - b)[:, 4:-4, 16:-16]) < 1e-5

    def test_median_base_exact_within_bound(self):
        from dcvc_tpu.ops.warp import flow_warp, tile_warp

        rng = np.random.default_rng(5)
        im = jnp.asarray(rng.random((1, 64, 128, 3)), jnp.float32)
        off = self._smooth_off(64, 128)
        a = np.asarray(flow_warp(im, off))
        b = np.asarray(tile_warp(im, off, 16, 2, "median"))
        assert np.max(np.abs(a - b)[:, 4:-4, 16:-16]) < 1e-5

    def test_median_base_beats_mean_at_motion_boundary(self):
        """A run spanning two motions: the median base keeps the majority
        pixels exact; the mean drifts toward the minority and clamps them."""
        from dcvc_tpu.ops.warp import flow_warp, tile_warp

        rng = np.random.default_rng(6)
        im = jnp.asarray(rng.random((1, 16, 32, 3)), jnp.float32)
        # per 16-run: columns 0..11 offset 0, columns 12..15 offset 12
        off_col = np.zeros((32,), np.float32)
        off_col[12:16] = 12.0
        off_col[28:32] = 12.0
        off = jnp.asarray(
            np.broadcast_to(off_col[None, :, None], (16, 32, 2)))[None]
        exact = np.asarray(flow_warp(im, off))
        med = np.asarray(tile_warp(im, off, 16, 2, "median"))
        mean = np.asarray(tile_warp(im, off, 16, 2, "mean"))
        # majority pixels (cols 2..11, away from x-borders)
        maj = np.s_[:, 2:-2, 2:12]
        med_err = np.max(np.abs(exact - med)[maj])
        mean_err = np.max(np.abs(exact - mean)[maj])
        assert med_err < 1e-5
        assert mean_err > 0.01  # mean base = round(3) pushes majority off

    def test_offset_diversity_tile_mode_runs(self):
        import jax

        from dcvc_tpu.models.video_net import OffsetDiversity

        m = OffsetDiversity(in_channel=12, group_num=4, head_ch=8,
                            warp_mode="tile:16,2")
        x = jnp.ones((1, 32, 64, 12))
        aux = jnp.ones((1, 32, 64, 8))
        flow = jnp.zeros((1, 32, 64, 2))
        params = m.init(jax.random.PRNGKey(0), x, aux, flow)
        out = m.apply(params, x, aux, flow)
        assert out.shape == (1, 32, 64, 12)
        assert np.all(np.isfinite(np.asarray(out)))


def test_packed_custom_grad_matches_naive():
    """flow_warp's packed path differentiates through the naive formulation
    (same function, ~17x faster scatter lowering on TPU); reverse- AND
    forward-mode derivatives must equal the naive formulation's exactly."""
    from dcvc_tpu.ops import warp as W

    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((2, 24, 32, 5)), jnp.float32)
    flow = jnp.asarray((rng.random((2, 24, 32, 2)) - 0.5) * 6, jnp.float32)
    ct_key = jnp.asarray(rng.random((2, 24, 32, 5)), jnp.float32)

    def loss_custom(a, b):
        return jnp.sum(W._warp_packed_naive_grad(a, b) * ct_key)

    def loss_naive(a, b):
        return jnp.sum(W._flow_warp_naive(a, b) * ct_key)

    gc = jax.grad(loss_custom, argnums=(0, 1))(im, flow)
    gn = jax.grad(loss_naive, argnums=(0, 1))(im, flow)
    for a, b in zip(gc, gn):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-6)
    # forward value matches
    np.testing.assert_allclose(
        np.asarray(W._warp_packed_naive_grad(im, flow)),
        np.asarray(W._flow_warp_naive(im, flow)), atol=1e-5)
    # forward-mode (jvp) still works and matches naive
    t = (jnp.ones_like(im), jnp.ones_like(flow) * 0.5)
    _, jc = jax.jvp(W._warp_packed_naive_grad, (im, flow), t)
    _, jn = jax.jvp(W._flow_warp_naive, (im, flow), t)
    np.testing.assert_allclose(np.asarray(jc), np.asarray(jn),
                               rtol=1e-6, atol=1e-6)


def test_tile_warp_gradients_match_naive_within_bound():
    """tile_warp gradients equal the exact warp's when offsets stay within
    the residual bound (the grad flows through the fractional weights; the
    integer base has zero grad in both formulations)."""
    from dcvc_tpu.ops.warp import _flow_warp_naive, tile_warp

    rng = np.random.default_rng(0)
    im = jnp.asarray(rng.random((1, 32, 64, 3)), jnp.float32)
    gy, gx = jnp.meshgrid(jnp.linspace(0, 6.28, 32),
                          jnp.linspace(0, 6.28, 64), indexing="ij")
    off = jnp.stack([1.0 * jnp.sin(gx), 1.0 * jnp.cos(gy)], -1)[None]
    gt = jax.grad(lambda a, b: jnp.sum(tile_warp(a, b, 16, 2) ** 2),
                  argnums=(0, 1))(im, off)
    gn = jax.grad(lambda a, b: jnp.sum(_flow_warp_naive(a, b) ** 2),
                  argnums=(0, 1))(im, off)
    for a, b in zip(gt, gn):
        a, b = np.asarray(a), np.asarray(b)
        assert np.all(np.isfinite(a))
        assert np.max(np.abs(a - b)) / (np.max(np.abs(b)) + 1e-9) < 1e-4


def test_tile_warp_chunked_matches_unchunked():
    """chunk is a memory/speed knob only: identical numerics."""
    from dcvc_tpu.ops.warp import tile_warp

    rng = np.random.default_rng(9)
    im = jnp.asarray(rng.random((8, 32, 64, 3)), jnp.float32)
    off = jnp.asarray(rng.normal(0, 2, (8, 32, 64, 2)), jnp.float32)
    full = np.asarray(tile_warp(im, off, 16, 2, "median", chunk=0))
    for chunk in (1, 2, 4):
        out = np.asarray(tile_warp(im, off, 16, 2, "median", chunk=chunk))
        np.testing.assert_allclose(out, full, atol=1e-6)


def test_default_od_warp_mode_resolver(monkeypatch):
    """Inference default: exact on cpu/gpu, the RD-gated Pallas block mode
    on TPU backends (RDNOTES.md §3b/§4 gate), env override wins
    everywhere; mc/me sites resolve through their own env vars."""
    from dcvc_tpu.ops.warp import (RD_GATED_BLOCK_MODE, RD_GATED_TILE_MODE,
                                   default_mc_warp_mode,
                                   default_me_warp_mode,
                                   default_od_warp_mode)

    monkeypatch.delenv("DCVC_TPU_OD_WARP", raising=False)
    assert jax.default_backend() == "cpu"  # conftest pins the CPU mesh
    assert default_od_warp_mode() == "exact"
    assert default_mc_warp_mode() == "exact"
    assert default_me_warp_mode() == "exact"
    monkeypatch.setenv("DCVC_TPU_OD_WARP", "tile:32,2,median")
    assert default_od_warp_mode() == "tile:32,2,median"
    # the gated constants must parse as modes resolve_warp_fn accepts
    assert RD_GATED_TILE_MODE.startswith("tile:")
    assert RD_GATED_BLOCK_MODE.startswith("block:")
    monkeypatch.delenv("DCVC_TPU_OD_WARP", raising=False)
    monkeypatch.setattr(jax, "default_backend", lambda: "axon")
    # round-5 policy (RDNOTES §6): block at the OD site only; the mc/me
    # sites default to exact (the converged-proxy gate failed them) and
    # the block mode is opt-in via env/flags.
    assert default_od_warp_mode() == RD_GATED_BLOCK_MODE
    assert default_mc_warp_mode() == "exact"
    assert default_me_warp_mode() == "exact"
    monkeypatch.setenv("DCVC_TPU_MC_WARP", RD_GATED_BLOCK_MODE)
    assert default_mc_warp_mode() == RD_GATED_BLOCK_MODE
    assert default_me_warp_mode() == "exact"

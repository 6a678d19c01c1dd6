"""Sharded DMC numerics parity (VERDICT round-1 item #3).

The risky ops under (data x tile) GSPMD sharding are exactly the ones the
EVC-only test skips: flow_warp / OffsetDiversity gathers whose indices can
cross tile boundaries, and the four-part prior's iota parity masks under a
sharded H axis. This asserts the full DMC forward_one_frame AND a train-step
gradient match unsharded execution at f32 tolerance on the virtual 8-device
mesh.
"""

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dcvc_tpu.models.video_dc import DMC
from dcvc_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def dmc():
    module = DMC()
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    return module, params


def _inputs(B=2, H=128, W=64):
    key = jax.random.PRNGKey(7)
    k1, k2 = jax.random.split(key)
    x = jax.random.uniform(k1, (B, H, W, 3))
    # a P-frame state (ref_frame shifted) so real motion flows through the
    # warp path rather than near-zero offsets
    ref = jnp.roll(x, shift=2, axis=1) * 0.9 + 0.1 * jax.random.uniform(
        k2, (B, H, W, 3))
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones((B, 1, 1, 1)) for k in ("mv_enc", "mv_dec",
                                              "y_enc", "y_dec")}
    return x, dpb, qs


def _shard(mesh, x, dpb, qs, params):
    xsh = NamedSharding(mesh, P("data", "tile", None, None))
    repl = NamedSharding(mesh, P())
    qsh = NamedSharding(mesh, P("data", None, None, None))
    x_s = jax.device_put(x, xsh)
    dpb_s = dict(dpb)
    dpb_s["ref_frame"] = jax.device_put(dpb["ref_frame"], xsh)
    qs_s = {k: jax.device_put(v, qsh) for k, v in qs.items()}
    p_s = jax.device_put(params, jax.tree.map(lambda _: repl, params))
    return x_s, dpb_s, qs_s, p_s


def test_dmc_forward_sharded_matches_unsharded(dmc):
    module, params = dmc
    mesh = make_mesh(8, tile=4)  # data=2 x tile=4
    x, dpb, qs = _inputs()

    def fwd(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1)
        return out["dpb"]["ref_frame"], out["bpp"]

    fwd = jax.jit(fwd)
    ref_frame, ref_bpp = jax.tree.map(np.asarray, fwd(params, x, dpb, qs))

    x_s, dpb_s, qs_s, p_s = _shard(mesh, x, dpb, qs, params)
    out_frame, out_bpp = jax.tree.map(np.asarray, fwd(p_s, x_s, dpb_s, qs_s))

    np.testing.assert_allclose(out_frame, ref_frame, atol=3e-5)
    np.testing.assert_allclose(out_bpp, ref_bpp, rtol=2e-4)


def test_dmc_train_grad_sharded_matches_unsharded(dmc):
    module, params = dmc
    mesh = make_mesh(8, tile=4)
    x, dpb, qs = _inputs()
    lambdas = jnp.asarray([85.0, 380.0])

    def loss_fn(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1, "ste")
        pixel_num = x.shape[1] * x.shape[2]
        mse = jnp.sum((x - out["dpb"]["ref_frame"]) ** 2,
                      axis=(1, 2, 3)) / pixel_num
        return jnp.mean(lambdas * mse + out["bpp"])

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    ref_loss, ref_grads = grad_fn(params, x, dpb, qs)
    ref_loss = float(ref_loss)

    x_s, dpb_s, qs_s, p_s = _shard(mesh, x, dpb, qs, params)
    out_loss, out_grads = grad_fn(p_s, x_s, dpb_s, qs_s)
    out_loss = float(out_loss)

    assert abs(out_loss - ref_loss) < 1e-4 * max(1.0, abs(ref_loss))
    ref_flat, _ = ravel_pytree(ref_grads)
    out_flat, _ = ravel_pytree(out_grads)
    ref_flat, out_flat = np.asarray(ref_flat), np.asarray(out_flat)
    # relative L2 over the whole gradient + elementwise tolerance scaled to
    # the gradient magnitude (f32 accumulation-order differences only)
    denom = np.linalg.norm(ref_flat) + 1e-12
    assert np.linalg.norm(out_flat - ref_flat) / denom < 1e-3


def test_dmc_forward_sharded_tile_warp_mode(dmc):
    """The TPU inference DEFAULT is the row-tile warp
    (ops/warp.py:default_od_warp_mode) — its CLIP-mode window gathers must
    survive GSPMD (data x tile) spatial sharding too, not just the exact
    warp. Sharded vs unsharded at f32 tolerance with the tile mode forced.
    """
    _, params = dmc
    module = DMC(od_warp_mode="tile:16,2,median")
    mesh = make_mesh(8, tile=4)
    x, dpb, qs = _inputs()

    def fwd(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1)
        return out["dpb"]["ref_frame"], out["bpp"]

    fwd = jax.jit(fwd)
    ref_frame, ref_bpp = jax.tree.map(np.asarray, fwd(params, x, dpb, qs))

    x_s, dpb_s, qs_s, p_s = _shard(mesh, x, dpb, qs, params)
    out_frame, out_bpp = jax.tree.map(np.asarray, fwd(p_s, x_s, dpb_s, qs_s))

    np.testing.assert_allclose(out_frame, ref_frame, atol=3e-5)
    np.testing.assert_allclose(out_bpp, ref_bpp, rtol=2e-4)

"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Validates that spatial-tile (H-axis) sharding under GSPMD produces the same
numerics as unsharded execution (XLA inserts conv halo exchange), and that
data-parallel batches shard cleanly — SURVEY §2.6 X3/X6 equivalents.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from dcvc_tpu.models.evc import EVCIntra
from dcvc_tpu.parallel.mesh import frame_sharding, make_mesh, replicated


@pytest.fixture(scope="module")
def evc():
    module = EVCIntra(enc_channels=(8, 8, 16, 32), dec_channels=(8, 8, 16, 32),
                      N=32)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                         jnp.ones(()))
    return module, params


def test_mesh_construction():
    mesh = make_mesh(8)
    assert mesh.shape["data"] * mesh.shape["tile"] == 8


def test_spatial_tile_sharding_matches_unsharded(evc):
    module, params = evc
    mesh = make_mesh(8, tile=4)

    x = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 64, 3))
    q = jnp.ones(())

    fwd = jax.jit(lambda p, x, q: module.apply(p, x, q)["x_hat"])
    ref = np.asarray(fwd(params, x, q))

    x_sh = jax.device_put(x, frame_sharding(mesh))
    p_sh = jax.device_put(params, jax.tree.map(lambda _: replicated(mesh),
                                               params))
    out = np.asarray(fwd(p_sh, x_sh, q))
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_data_parallel_sharding_matches(evc):
    module, params = evc
    mesh = make_mesh(8, tile=1)
    x = jax.random.uniform(jax.random.PRNGKey(2), (8, 64, 64, 3))
    fwd = jax.jit(lambda p, x, q: module.apply(p, x, q)["bpp"])
    ref = np.asarray(fwd(params, x, jnp.ones(())))
    x_sh = jax.device_put(x, NamedSharding(mesh, P("data", None, None, None)))
    out = np.asarray(fwd(params, x_sh, jnp.ones(())))
    np.testing.assert_allclose(out, ref, rtol=1e-5)

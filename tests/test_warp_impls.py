"""flow_warp gather formulations must be interchangeable.

The TPU-fast formulations (rowpair: [1,2,C] slices; packed: row pairs folded
into channels, [1,2,2C] slices) must reproduce the naive advanced-indexing
form — which is itself golden-tested against torch grid_sample(border,
align_corners=True) in test_torch_parity — including border collapse and
batched inputs (reference semantics: DCVC-DC/src/models/video_net.py:8-38).
"""

import jax
import jax.numpy as jnp
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

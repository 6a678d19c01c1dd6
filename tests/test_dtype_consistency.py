"""Steady-state DPB avals must be a FIXED POINT of the P-frame step.

If any submodule drops the model dtype (e.g. a conv built without
``dtype=self.dtype`` promotes bf16 -> f32, and a residual add propagates
it), the P->P output DPB's avals differ from the I->P output's: every GOP
chain then compiles TWO executables instead of one (minutes per extra
compile on remote TPU) and part of the network silently runs in f32.
Caught live in round 4: ``temporal_prior_encoder_*`` / adaptor convs
leaked f32 through ``y_prior_fusion_adaptor_1``'s residual into ref_y.

eval_shape only — no compiles, runs in seconds on CPU.
"""

import jax
import jax.numpy as jnp
import pytest


def _aval_tree(t):
    return jax.tree.map(lambda a: (tuple(a.shape), str(a.dtype)), t)


def _fixed_point_check(apply_pp, dpb_ip):
    """dpb_ip: output-DPB avals of the I->P step. apply_pp(dpb) -> out dpb
    avals for a populated dpb. Asserts one application of the P->P step is
    aval-stable."""
    dpb_pp = apply_pp(dpb_ip)
    assert _aval_tree(dpb_pp) == _aval_tree(apply_pp(dpb_pp)), \
        "P->P output DPB avals are not a fixed point"
    return dpb_pp


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_dmc_dpb_aval_fixed_point(dtype):
    from dcvc_tpu.models.video_dc import DMC

    module = DMC(dtype=dtype)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    # trace-only throughout: params as avals (init itself is eval_shape'd)
    params = jax.eval_shape(
        lambda k: module.init(k, x, dpb0, qs, 0), jax.random.PRNGKey(0))

    def out_dpb(dpb):
        return jax.eval_shape(
            lambda p, xx, d, q: module.apply(p, xx, d, q, 1)["dpb"],
            params, x, dpb, qs)

    dpb_ip = out_dpb(dpb0)
    dpb_pp = _fixed_point_check(out_dpb, dpb_ip)
    # and the I->P output itself must already be the steady-state aval —
    # otherwise frame 2 compiles a second executable
    assert _aval_tree(dpb_ip) == _aval_tree(dpb_pp), \
        "I->P and P->P output DPB avals differ (per-GOP double compile)"


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_hem_dpb_aval_fixed_point(dtype):
    from dcvc_tpu.models.video_hem import DMCHem

    module = DMCHem(dtype=dtype)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x, "ref_feature": None, "ref_y": None,
            "ref_mv_y": None}
    params = jax.eval_shape(
        lambda k: module.init(k, x, dpb0, jnp.ones(()), jnp.ones(())),
        jax.random.PRNGKey(0))

    def out_dpb(dpb):
        return jax.eval_shape(
            lambda p, xx, d: module.apply(p, xx, d, jnp.ones(()),
                                          jnp.ones(()))["dpb"],
            params, x, dpb)

    dpb_ip = out_dpb(dpb0)
    dpb_pp = _fixed_point_check(out_dpb, dpb_ip)
    assert _aval_tree(dpb_ip) == _aval_tree(dpb_pp)

#!/usr/bin/env python
"""Per-stage DMC cost on the axon TPU with trustworthy timing.

Each stage is wrapped as state -> state (same shapes), chained N dependent
iterations, ONE host readback at the end. This avoids both the non-blocking
block_until_ready and the ~36 ms/readback latency of the axon platform.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp


def chain(tag, step, state, iters=8):
    state0 = step(state)
    _ = float(jnp.sum(state0[0]))  # compile + settle
    t0 = time.time()
    s = state
    for _ in range(iters):
        s = step(s)
    _ = float(jnp.sum(s[0]))
    dt = (time.time() - t0) / iters
    print(f"{tag}: {dt * 1000:.1f} ms", flush=True)
    return dt


def main():
    H = int(os.environ.get("DIAG_H", 704))
    W = int(os.environ.get("DIAG_W", 1280))
    from dcvc_tpu.models.video_dc import DMC
    from dcvc_tpu.ops.warp import flow_warp

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    _ = float(jnp.sum(params["params"]["feature_adaptor_I"]["kernel"]))
    print("init done", flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    mv = jnp.full((1, H, W, 2), 0.3, jnp.float32)
    feat = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 48))

    # 0. bare flow_warp, 48ch full-res
    @jax.jit
    def s_warp(s):
        f, = s
        return (flow_warp(f, mv),)

    chain("flow_warp 48ch", s_warp, (feat,))

    # 1. optic flow (SPyNet)
    @jax.jit
    def s_flow(s):
        a, b = s
        out = module.apply(params, a, b,
                           method=lambda m, i, j: m.optic_flow(i, j))
        return (a + jnp.mean(out), b)

    chain("optic_flow", s_flow, (x, ref))

    # 2. feature extractor only
    @jax.jit
    def s_feat(s):
        f, = s
        o1, o2, o3 = module.apply(
            params, f, method=lambda m, g: m.feature_extractor(
                m.feature_adaptor_I(g[..., :3]) if g.shape[-1] == 3 else g))
        return (f + jnp.mean(o1) + jnp.mean(o2) + jnp.mean(o3),)

    chain("feature_extractor(48ch)", s_feat, (feat,))

    # 3. OffsetDiversity alone — big operands THREADED THROUGH STATE:
    # closure constants are embedded into the HLO, and at 1080p the 400MB
    # feature plane exceeds the remote-compile request limit (HTTP 413)
    aux = jnp.concatenate([feat, ref, mv], axis=-1)

    @jax.jit
    def s_align(s):
        f, a, v = s
        out = module.apply(params, f, a, v,
                           method=lambda m, p, b, c: m.align(p, b, c))
        return (f + out.astype(f.dtype), a, v)

    chain("offset_diversity", s_align, (feat, aux, mv))

    # 4. full motion_compensation (I-dpb and P-dpb)
    dpb_i = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
             "ref_y": None, "ref_mv_y": None}
    dpb_p = {"ref_frame": ref, "ref_feature": feat,
             "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}

    @jax.jit
    def s_mc(s):
        xx, dpb, v = s
        c1, c2, c3, _ = module.apply(
            params, dpb, v,
            method=lambda m, d, w: m.motion_compensation(d, w, 1))
        return (xx + jnp.mean(c1) + jnp.mean(c2) + jnp.mean(c3), dpb, v)

    chain("motion_comp I-dpb", s_mc, (x, dpb_i, mv))
    chain("motion_comp P-dpb", s_mc, (x, dpb_p, mv))

    # 5. contextual encoder + hyper
    c1 = jax.random.uniform(jax.random.PRNGKey(4), (1, H, W, 48))
    c2 = jax.random.uniform(jax.random.PRNGKey(5), (1, H // 2, W // 2, 64))
    c3 = jax.random.uniform(jax.random.PRNGKey(6), (1, H // 4, W // 4, 96))

    @jax.jit
    def s_enc(s):
        xx, b1, b2, b3 = s
        y = module.apply(
            params, xx, b1, b2, b3,
            method=lambda m, a, b, cc, d: m.contextual_encoder(
                a, b, cc, d, m.y_q_basic_enc))
        return (xx + jnp.mean(y), b1, b2, b3)

    chain("ctx_encoder", s_enc, (x, c1, c2, c3))

    # 6. four-part prior forward (y branch)
    y = jax.random.uniform(jax.random.PRNGKey(7), (1, H // 16, W // 16, 128))
    pr = jax.random.uniform(jax.random.PRNGKey(8), (1, H // 16, W // 16, 384))

    from dcvc_tpu.models import priors

    @jax.jit
    def s_prior(s):
        yy, = s
        def go(m, yv, pv):
            return priors.forward_four_part_prior(
                yv, pv, m.spatial_prior_fns("y"))
        _, y_q, y_hat, scales = module.apply(params, yy, pr, method=go)
        return (yy + jnp.mean(y_hat) + jnp.mean(scales),)

    chain("four_part_prior(y)", s_prior, (y,))

    # 7. contextual decoder + recon
    y_hat = y

    @jax.jit
    def s_dec(s):
        yy, b1, b2, b3 = s
        def go(m, yv, e1, e2, e3):
            return m.get_recon_and_feature(yv, e1, e2, e3, m.y_q_basic_dec)
        x_hat, f = module.apply(params, yy, b1, b2, b3, method=go)
        return (yy + jnp.mean(x_hat) + jnp.mean(f), b1, b2, b3)

    chain("ctx_dec+recon", s_dec, (y_hat, c1, c2, c3))

    # 8. mv branch: encoder+hyper+prior+dec
    @jax.jit
    def s_mvb(s):
        xx, dpb = s
        def go(m, a, d):
            mv_y, mv_z, ss = m._mv_branch_analysis(a, d, m.mv_y_q_basic_enc)
            mv_z_hat = jnp.round(mv_z)
            mp = m.mv_prior_param_decoder(mv_z_hat, d["ref_mv_y"], ss)
            _, _, mv_y_hat, _ = priors.forward_four_part_prior(
                mv_y, mp, m.spatial_prior_fns("mv"))
            mh, mf = m.mv_decoder(mv_y_hat, m.mv_y_q_basic_dec)
            return mh, mf
        mh, mf = module.apply(params, xx, dpb, method=go)
        return (xx + jnp.mean(mh) + jnp.mean(mf), dpb)

    chain("mv_branch(flow+enc+prior+dec)", s_mvb, (x, dpb_i))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""One-shot serialized DMC TPU diagnostic: timings + compiled cost analysis.

Runs everything in ONE process (the remote compile helper dies if multiple
TPU clients race). Measures the full P-frame program with both I-frame and
steady-state DPB pytrees and prints the compiled executables' cost/memory
analysis to localize padding or buffer-compression pathologies.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp


def main():
    H = int(os.environ.get("DIAG_H", 704))
    W = int(os.environ.get("DIAG_W", 1280))
    from dcvc_tpu.models.video_dc import DMC

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    t0 = time.time()
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    jax.block_until_ready(params)
    print(f"init: {time.time() - t0:.1f}s", flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    dpb_i = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
             "ref_y": None, "ref_mv_y": None}

    def fwd(p, x, dpb, qs):
        return module.apply(p, x, dpb, qs, 1)["dpb"]

    def report(tag, dpb):
        lowered = jax.jit(fwd).lower(params, x, dpb, qs)
        t0 = time.time()
        compiled = lowered.compile()
        print(f"{tag}: compile {time.time() - t0:.1f}s", flush=True)
        try:
            ca = compiled.cost_analysis()
            print(f"{tag}: flops={ca.get('flops', 0) / 1e9:.1f}G "
                  f"bytes={ca.get('bytes accessed', 0) / 1e9:.2f}GB", flush=True)
        except Exception as e:
            print(f"{tag}: cost_analysis failed: {e}", flush=True)
        try:
            ma = compiled.memory_analysis()
            print(f"{tag}: mem {ma}", flush=True)
        except Exception as e:
            print(f"{tag}: memory_analysis failed: {e}", flush=True)
        out = compiled(params, x, dpb, qs)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(3):
            out = compiled(params, x, dpb, qs)
        jax.block_until_ready(out)
        print(f"{tag}: steady {(time.time() - t0) / 3 * 1000:.0f} ms", flush=True)
        return out

    out_i = report("I-dpb", dpb_i)
    out_p = report("P-dpb", out_i)

    # split-program variant: mv+motion stage | y+recon stage, chained at the
    # Python level — isolates whole-program fusion/scheduling pathologies
    from dcvc_tpu.models import priors
    from dcvc_tpu.models.intra_dc import pad_for_y

    def stage_a(p, x, dpb, qs):
        def go(m, x, dpb, qs):
            mv_y_q_enc = m.mv_y_q_basic_enc * qs["mv_enc"]
            mv_y, mv_z, ss = m._mv_branch_analysis(x, dpb, mv_y_q_enc)
            mv_z_hat = jnp.round(mv_z)
            mv_params = m.mv_prior_param_decoder(mv_z_hat, dpb["ref_mv_y"], ss)
            _, _, mv_y_hat, _ = priors.forward_four_part_prior(
                mv_y, mv_params, m.spatial_prior_fns("mv"))
            mv_hat, mv_feature = m.mv_decoder(
                mv_y_hat, m.mv_y_q_basic_dec * qs["mv_dec"])
            c1, c2, c3, _ = m.motion_compensation(dpb, mv_hat, 1)
            return c1, c2, c3, mv_y_hat, mv_feature
        return module.apply(p, x, dpb, qs, method=go)

    def stage_b(p, x, dpb, qs, ctx):
        def go(m, x, dpb, qs, ctx):
            c1, c2, c3 = ctx
            y = m.contextual_encoder(x, c1, c2, c3,
                                     m.y_q_basic_enc * qs["y_enc"])
            y_pad, ss = pad_for_y(y)
            z = m.contextual_hyper_prior_encoder(y_pad)
            z_hat = jnp.round(z)
            pr = m.res_prior_param_decoder(z_hat, dpb["ref_y"], c3, ss)
            _, _, y_hat, _ = priors.forward_four_part_prior(
                y, pr, m.spatial_prior_fns("y"))
            x_hat, feature = m.get_recon_and_feature(
                y_hat, c1, c2, c3, m.y_q_basic_dec * qs["y_dec"])
            return x_hat, feature, y_hat
        return module.apply(p, x, dpb, qs, ctx, method=go)

    ja = jax.jit(stage_a)
    jb = jax.jit(stage_b)
    t0 = time.time()
    c1, c2, c3, mv_y_hat, mv_feature = ja(params, x, out_i, qs)
    x_hat, feature, y_hat = jb(params, x, out_i, qs, (c1, c2, c3))
    jax.block_until_ready(x_hat)
    print(f"split: compile+run {time.time() - t0:.1f}s", flush=True)
    t0 = time.time()
    for _ in range(3):
        c1, c2, c3, mv_y_hat, mv_feature = ja(params, x, out_i, qs)
        x_hat, feature, y_hat = jb(params, x, out_i, qs, (c1, c2, c3))
    jax.block_until_ready(x_hat)
    print(f"split steady: {(time.time() - t0) / 3 * 1000:.0f} ms", flush=True)


if __name__ == "__main__":
    main()

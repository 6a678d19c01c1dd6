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
    report("P-dpb", out_i)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Where do EVC's 1080p milliseconds go? (bench_evc measured 3.5 fps for
evc_SS — a conv-only codec that should be MXU-bound at ~100x that.)

Times each stage as its own jitted probe (chained n-iter, one readback):
enc, hyper branch (hyper_enc+hyper_dec+fusion), dual-prior driver,
dec (synthesis), bit estimation (y_gaussian_bits + z_bits), full forward.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np


def _time(fn, args, n=8):
    out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _i in range(n):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n * 1e3


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "evc_SS"
    H, W = 1088, 1920
    from dcvc_tpu.models.registry import build

    module, params, _ = build(variant, dtype=jnp.bfloat16)
    mt = type(module)
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3), jnp.float32)
    print(json.dumps({"backend": jax.default_backend(),
                      "variant": variant}), flush=True)

    q = jnp.ones(())

    @jax.jit
    def full(p, x):
        return module.apply(p, x, q)["x_hat"]

    @jax.jit
    def enc(p, x):
        def f(m, x):
            return m.enc(x) / m.get_curr_q(q)
        return module.apply(p, x, method=f)

    y = enc(params, x)

    @jax.jit
    def hyper(p, y):
        def f(m, y):
            z_hat = jnp.round(m.hyper_enc(y))
            return m.prior_params(z_hat)
        return module.apply(p, y, method=f)

    q_step, scales, means = hyper(params, y)

    @jax.jit
    def dual(p, y, q_step, scales, means):
        from dcvc_tpu.models import priors

        def f(m, y, q_step, scales, means):
            return priors.forward_dual_prior(y, means, scales, q_step,
                                             m.spatial_prior_chunks)[2]
        return module.apply(p, y, q_step, scales, means, method=f)

    y_hat = dual(params, y, q_step, scales, means)

    @jax.jit
    def dec(p, y_hat):
        return module.apply(p, y_hat, q, method=mt.synthesize)

    @jax.jit
    def bitcost(p, y_hat, scales):
        from dcvc_tpu.entropy import bits

        def f(m, y_hat, scales):
            by = bits.y_gaussian_bits(y_hat, jnp.clip(scales, 0.11, 1e10))
            bz = bits.z_bits(jnp.round(m.hyper_enc(y_hat)), m.z_cdf)
            return jnp.sum(by) + jnp.sum(bz)
        return module.apply(p, y_hat, scales, method=f)

    t = {}
    t["enc_ms"] = round(_time(enc, (params, x)), 1)
    t["hyper_ms"] = round(_time(hyper, (params, y)), 1)
    t["dual_prior_ms"] = round(_time(dual, (params, y, q_step, scales,
                                            means)), 1)
    t["dec_ms"] = round(_time(dec, (params, y_hat)), 1)
    t["bits_ms"] = round(_time(bitcost, (params, y_hat, scales)), 1)
    t["full_ms"] = round(_time(full, (params, x)), 1)
    print(json.dumps({"section": "evc_stages", **t}), flush=True)


if __name__ == "__main__":
    main()

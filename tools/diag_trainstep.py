#!/usr/bin/env python
"""Training-step wall-clock on the attached accelerator (VERDICT #8).

Times the cascaded DMC train step (2-frame cascade, bf16 remat) at
crop 256 for B in --batches, reporting coded-frames/s and whether the
B=4 remat configuration compiles at all (round-1 open question: the
remote tpu_compile_helper exited 1 there — tunnel infra vs real limit).

  python tools/diag_trainstep.py [--crop 256] [--batches 2,4] [--iters 3]
"""

import argparse
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


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--batches", default="2,4")
    p.add_argument("--cascade", type=int, default=2)
    p.add_argument("--iters", type=int, default=3)
    p.add_argument("--no-remat", action="store_true")
    args = p.parse_args()

    from dcvc_tpu.models.video_dc import DMC
    from dcvc_tpu.training.step import make_dmc_train_step, make_optimizer

    print(json.dumps({"backend": jax.default_backend(),
                      "crop": args.crop, "cascade": args.cascade,
                      "remat": not args.no_remat}), flush=True)

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    optimizer = make_optimizer()
    opt_state = optimizer.init(params)
    step = jax.jit(make_dmc_train_step(
        module, optimizer, cascade_frames=args.cascade,
        remat=not args.no_remat))

    S = args.crop
    rng = np.random.default_rng(0)
    for B in (int(b) for b in args.batches.split(",")):
        clip = jnp.asarray(rng.random((B, args.cascade + 1, S, S, 3)),
                           jnp.float32)
        lambdas = jnp.full((B,), 256.0, jnp.float32)
        try:
            t0 = time.time()
            p2, o2, aux = step(params, opt_state, clip, qs, lambdas)
            float(aux["loss"])  # host readback = the only real sync
            compile_s = time.time() - t0
            t0 = time.time()
            p_cur, o_cur = p2, o2
            for _ in range(args.iters):
                p_cur, o_cur, aux = step(p_cur, o_cur, clip, qs, lambdas)
            float(aux["loss"])
            dt = (time.time() - t0) / args.iters
            print(json.dumps({
                "batch": B, "compile_s": round(compile_s, 1),
                "step_s": round(dt, 3),
                "coded_frames_per_s": round(B * args.cascade / dt, 3),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"batch": B, "error": repr(e)[:800]}),
                  flush=True)


if __name__ == "__main__":
    main()

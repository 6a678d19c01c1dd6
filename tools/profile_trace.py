#!/usr/bin/env python
"""Capture a jax profiler trace of codec hot paths (SURVEY §5 tracing).

The reference has no profiler integration — only cuda.synchronize wall-clock
brackets (DCVC-DC/src/models/video_model.py:526-540). The TPU-native
equivalent: a real XLA trace viewable in TensorBoard/Perfetto, plus the
per-stage chained-timing breakdown (tools/diag_stages.py).

Usage:
  python tools/profile_trace.py --model dmc_dc --height 720 --width 1280 \
      --trace_dir /tmp/jax_trace --iters 4
Then: tensorboard --logdir /tmp/jax_trace (or open the .perfetto trace).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="dmc_dc")
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--iters", type=int, default=4)
    p.add_argument("--trace_dir", default="/tmp/jax_trace")
    args = p.parse_args()

    from dcvc_tpu.models.registry import build

    _, _, rt = build(args.model)
    H, W = args.height, args.width
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 3))

    if args.model.startswith("dmc") or args.model in ("canfvc_dmc",):
        dpb = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
               "ref_y": None, "ref_mv_y": None}
        if args.model == "dmc_dc":
            step = lambda d: rt.forward_one_frame(x, d, False, 0, 1)["dpb"]
        elif args.model == "dmc_tcm":
            step = lambda d: {
                "ref_frame": rt.forward_one_frame(
                    x, d["ref_frame"], d.get("ref_feature"))["recon_image"]}
        else:
            step = lambda d: rt.forward_one_frame(x, d, 1.0, 1.0)["dpb"]
        state = step(dpb)  # warm (steady-state dpb) + compile
        state = step(state)
        _ = float(jnp.sum(state["ref_frame"]))
    else:
        step = lambda _=None: rt.forward(x) if args.model.startswith("b") \
            or "2018" in args.model or "2020" in args.model \
            else rt.forward(x, jnp.ones(()))
        out = step()
        _ = float(jnp.sum(out["x_hat"]))
        state = None

    with jax.profiler.trace(args.trace_dir):
        t0 = time.time()
        for _ in range(args.iters):
            if state is not None:
                state = step(state)
            else:
                out = step()
        probe = (jnp.sum(state["ref_frame"]) if state is not None
                 else jnp.sum(out["x_hat"]))
        _ = float(probe)
        dt = (time.time() - t0) / args.iters
    print(f"{args.model} {H}x{W}: {dt * 1e3:.1f} ms/frame; "
          f"trace -> {args.trace_dir}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Warm codec server CLI.

    python tools/serve.py --socket /tmp/dcvc.sock \
        --i_frame_model intra_dc --p_frame_model dmc_dc \
        --model_path_i intra.pth --model_path_p dmc.pth \
        --warmup 1080 1920

Builds the codec(s) once, optionally pre-compiles at the given resolution,
then serves encode/decode requests until a client sends `shutdown`
(see dcvc_tpu/serving/). The point on TPU: the jit compile is tens of
seconds for the big models — pay it once per deployment, not per clip.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--socket", required=True)
    p.add_argument("--i_frame_model", default="evc_SS")
    p.add_argument("--p_frame_model", default=None)
    p.add_argument("--model_path_i", default=None)
    p.add_argument("--model_path_p", default=None)
    p.add_argument("--ec_thread", type=int, default=0)
    p.add_argument("--stream_part", type=int, default=1)
    p.add_argument("--od_warp", default="auto")
    p.add_argument("--warmup", type=int, nargs=2, metavar=("H", "W"),
                   default=None, help="pre-compile at this resolution")
    args = p.parse_args()

    from dcvc_tpu.serving import CodecServer

    server = CodecServer(
        i_frame_model=args.i_frame_model, p_frame_model=args.p_frame_model,
        model_path_i=args.model_path_i, model_path_p=args.model_path_p,
        ec_thread=bool(args.ec_thread), stream_part=args.stream_part,
        od_warp=args.od_warp)
    if args.warmup:
        print(f"warming up at {args.warmup[0]}x{args.warmup[1]} ...",
              flush=True)
        server.warmup(*args.warmup)
    print(f"serving on {args.socket}", flush=True)
    server.serve(args.socket)


if __name__ == "__main__":
    main()

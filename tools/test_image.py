#!/usr/bin/env python
"""Image RD evaluation CLI — parity with EVC/test_image.py:73-423.

Runs an intra codec over an image folder x rate points, reports bpp / PSNR /
MS-SSIM and enc/dec latency, writes the averaged RD JSON
(avg_imagejson semantics).
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=str, default="evc_LL")
    p.add_argument("--model_path", type=str, default=None)
    p.add_argument("--img_folder", type=str, required=True)
    p.add_argument("--rate_num", type=int, default=4)
    p.add_argument("--write_stream", type=int, default=0)
    p.add_argument("--stream_path", type=str, default="bitstreams")
    p.add_argument("--calc_ssim", type=int, default=0)
    p.add_argument("--output_path", type=str, default="out/image_results.json")
    p.add_argument("--verbose", type=int, default=1)
    return p.parse_args()


def main():
    args = parse_args()
    import jax.numpy as jnp
    from PIL import Image

    from dcvc_tpu.models.registry import build
    from dcvc_tpu.ops.warp import get_padding_size
    from dcvc_tpu.utils import metrics
    from dcvc_tpu.utils.results import dump_json
    from dcvc_tpu.utils.stream import (decode_i_strings, decode_i_ushort_q,
                                       encode_i_strings, encode_i_ushort_q,
                                       filesize, get_rounded_q)

    images = sorted(glob.glob(os.path.join(args.img_folder, "*.png")))
    if not images:
        sys.exit(f"error: no .png images found in {args.img_folder}")

    _, params, rt = build(args.model)
    if args.model_path:
        from dcvc_tpu.utils.checkpoint import load_params

        rt.params = load_params(args.model_path, rt.params, model=args.model)
    rt.update(force=True)

    # q_scales: anchors from the checkpoint (ones at fresh init) log-interp'd.
    # The CompressAI-zoo families are per-rate models with no q parameter
    # (DCVC/src/models/priors.py) — one rate point per checkpoint. The DC
    # generation's I-codec uses (q_in_ckpt, q_index) into its 64-point fine
    # table + the DC flag+q container (stream_helper.py:94-117 semantics).
    from dcvc_tpu.models.runtime import IntraDcRuntime

    is_dc = isinstance(rt, IntraDcRuntime)
    if is_dc:
        q_scales = [int(round(v)) for v in np.linspace(
            0, 63, args.rate_num)] if args.rate_num > 1 else [0]
    elif "q_scale" in rt.params["params"]:
        anchors = np.asarray(rt.params["params"]["q_scale"]).reshape(-1)
        q_scales = np.exp(
            np.linspace(np.log(anchors[0]), np.log(anchors[-1]),
                        args.rate_num)) if args.rate_num > 1 else anchors[:1]
    else:
        if args.rate_num > 1:
            print(f"{args.model} is a per-rate model; running 1 rate point")
        q_scales = [None]

    results = {}
    for img_path in images:
        name = os.path.basename(img_path)
        img = np.asarray(Image.open(img_path).convert("RGB"),
                         dtype=np.float32) / 255.0
        h, w = img.shape[:2]
        l, r, t, b = get_padding_size(h, w, 64)
        padded = np.pad(img, ((t, b), (l, r), (0, 0)), mode="edge")
        x = jnp.asarray(padded)[None]

        for rate_idx, q in enumerate(q_scales):
            t0 = time.time()
            if args.write_stream and is_dc:
                from dcvc_tpu.utils.stream import decode_i, encode_i

                comp = rt.compress(x, q_in_ckpt=False, q_index=int(q))
                os.makedirs(args.stream_path, exist_ok=True)
                bin_path = os.path.join(args.stream_path,
                                        f"{name}_{rate_idx}.bin")
                encode_i(h, w, False, int(q), comp["bit_stream"], bin_path)
                bit = filesize(bin_path) * 8
                t1 = time.time()
                hh, ww, q_in_ckpt, q_idx, stream = decode_i(bin_path)
                dec = rt.decompress(stream, hh, ww, q_in_ckpt, q_idx)
                x_hat = dec["x_hat"]
            elif is_dc:
                out = rt.forward(x, q_in_ckpt=False, q_index=int(q))
                bit = float(out["bit"])
                t1 = time.time()
                x_hat = out["x_hat"]
            elif args.write_stream and q is None:  # per-rate zoo model
                comp = rt.compress(x)
                os.makedirs(args.stream_path, exist_ok=True)
                bin_path = os.path.join(args.stream_path,
                                        f"{name}_{rate_idx}.bin")
                encode_i_strings(h, w, comp["strings"], bin_path)
                bit = filesize(bin_path) * 8
                t1 = time.time()
                hh, ww, strings = decode_i_strings(bin_path)
                pl, pr, pt, pb = get_padding_size(hh, ww, 64)
                ds = 16 if rt.kind == "factorized" else 64
                shape_hw = ((hh + pt + pb) // ds, (ww + pl + pr) // ds)
                dec = rt.decompress(strings, shape_hw)
                x_hat = dec["x_hat"]
            elif args.write_stream:
                q_rounded, q_index = get_rounded_q(float(q))
                comp = rt.compress(x, jnp.asarray(q_rounded))
                os.makedirs(args.stream_path, exist_ok=True)
                bin_path = os.path.join(args.stream_path,
                                        f"{name}_{rate_idx}.bin")
                encode_i_ushort_q(h, w, q_index, comp["bit_stream"], bin_path)
                bit = filesize(bin_path) * 8
                t1 = time.time()
                hh, ww, q_idx, stream = decode_i_ushort_q(bin_path)
                dec = rt.decompress(stream, hh, ww, jnp.asarray(q_idx / 100))
                x_hat = dec["x_hat"]
            else:
                out = (rt.forward(x) if q is None
                       else rt.forward(x, jnp.asarray(float(q))))
                bit = float(out["bit"])
                t1 = time.time()
                x_hat = out["x_hat"]
            # host readback is the only reliable device sync on remote
            # tunnels (block_until_ready can return early there)
            recon = np.asarray(x_hat[0, :h, :w])
            t2 = time.time()
            fr = {
                "bpp": bit / (h * w),
                "psnr": metrics.calc_psnr(img, recon, data_range=1),
                "enc_time": t1 - t0,
                "dec_time": t2 - t1,
                "latency": t2 - t0,
            }
            if args.calc_ssim:
                fr["msssim"] = metrics.calc_msssim_rgb(img, recon, data_range=1)
            results.setdefault(name, {})[f"rate_{rate_idx}"] = fr
            if args.verbose:
                print(f"{name} rate{rate_idx}: bpp={fr['bpp']:.4f} "
                      f"psnr={fr['psnr']:.2f} latency={fr['latency']:.3f}s")

    # RD averaging over images per rate (avg_imagejson)
    avg = {}
    for rate_idx in range(len(q_scales)):
        keys = [v[f"rate_{rate_idx}"] for v in results.values()]
        avg[f"rate_{rate_idx}"] = {
            k: float(np.mean([f[k] for f in keys])) for k in keys[0]}
    dump_json({"per_image": results, "average": avg}, args.output_path)
    print(f"results -> {args.output_path}")


if __name__ == "__main__":
    main()

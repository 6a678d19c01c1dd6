#!/usr/bin/env python
"""Video RD evaluation CLI — parity with DCVC-DC/test_video.py:26-56.

Reads a JSON dataset config (reference schema), runs the selected I/P codec
pair over (sequence x rate) work items, writes the nested results JSON.
Rate points: q_indexes from the checkpoint anchors (q_in_ckpt) or the
64-point fine table (rate_num up to 64).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--model_path_i", type=str, default=None)
    p.add_argument("--model_path_p", type=str, default=None)
    p.add_argument("--i_frame_model", type=str, default="intra_dc")
    p.add_argument("--p_frame_model", type=str, default="dmc_dc")
    p.add_argument("--rate_num", type=int, default=4)
    p.add_argument("--q_indexes", type=int, nargs="+", default=None)
    p.add_argument("--test_config", type=str, required=True)
    p.add_argument("--force_intra", action="store_true")
    p.add_argument("--force_intra_period", type=int, default=0)
    p.add_argument("--force_frame_num", type=int, default=-1)
    p.add_argument("--write_stream", type=int, default=0)
    p.add_argument("--stream_path", type=str, default="bitstreams")
    p.add_argument("--decoded_frame_path", type=str, default=None)
    p.add_argument("--calc_ssim", type=int, default=0)
    p.add_argument("--yuv420", type=int, default=0)
    p.add_argument("--ec_thread", type=int, default=0)
    p.add_argument("--stream_part_i", type=int, default=1)
    p.add_argument("--stream_part_p", type=int, default=1)
    p.add_argument("--aligned_enc", type=int, default=None,
                   help="1: derive P-frame coding indexes from the "
                        "DECODER'S own executables (bf16 fusion-"
                        "divergence guard; dmc_dc/dmc_hem/dmc_tcm — EVC-"
                        "family I-codecs are always aligned). Defaults "
                        "to the DCVC_TPU_ALIGNED_ENC env setting")
    p.add_argument("--output_path", type=str, default="out/results.json")
    p.add_argument("--verbose", type=int, default=1)
    p.add_argument("--worker_num", type=int, default=1,
                   help="intra-host process pool over (sequence x rate) "
                        "items (reference test_video.py:276-338). Each "
                        "worker process builds its own runtimes and "
                        "evaluates a round-robin shard. CPU eval only — a "
                        "single TPU chip cannot be shared across processes "
                        "(multi-host TPU fan-out is parallel/jobs.py)")
    p.add_argument("--chroma_upsample_order", type=int, default=0,
                   choices=[0, 1],
                   help="420->444 model-input chroma upsample: 0 nearest "
                        "(reference default), 1 bilinear (RD cross-check)")
    p.add_argument("--od_warp", default="auto",
                   help="OffsetDiversity warp mode for dmc_dc: 'auto' = "
                        "the RD-gated Pallas block mode on TPU backends, "
                        "exact on cpu/gpu (see RDNOTES.md); or 'exact' / "
                        "'tile:T,R[,median|mean]' / "
                        "'block:Dh,Rv[,BH,BW[,base]]' explicitly")
    p.add_argument("--mc_warp", default="auto",
                   help="motion-compensation warp mode (warpframe + "
                        "context warps, dmc_dc/hem/tcm/gen1): same grammar "
                        "as --od_warp")
    p.add_argument("--me_warp", default="auto",
                   help="SPyNet pyramid warp mode (dmc_dc): same grammar "
                        "as --od_warp")
    return p.parse_args()


def _build_runtimes(args):
    """Build + adapt the I/P runtimes for this process (used by the main
    process and by each --worker_num pool worker)."""
    from dcvc_tpu.models.registry import build

    # pad-to-multiple contract (single source of truth: runner/adapters.py)
    from dcvc_tpu.runner.adapters import pad_for_model as _pad_for

    pad_i = _pad_for(args.i_frame_model)
    pad_multiple = (pad_i if args.force_intra
                    else max(pad_i, _pad_for(args.p_frame_model)))
    if args.write_stream and not args.force_intra \
            and pad_i != _pad_for(args.p_frame_model):
        # decompress derives latent shapes from each generation's OWN pad
        # contract; frames padded for the other generation desync the rANS
        # symbol counts. Estimated-bits mode is shape-agnostic and fine.
        sys.exit(f"error: --write_stream needs I/P models from the same "
                 f"padding generation ({args.i_frame_model} pads to "
                 f"{pad_i}, {args.p_frame_model} to "
                 f"{_pad_for(args.p_frame_model)}); pick a matching intra "
                 f"(e.g. intra_hem / a zoo model) or use --force_intra")

    from dcvc_tpu.runner.adapters import adapt_i_runtime, adapt_p_runtime

    _, _, i_rt = build(args.i_frame_model)
    if args.model_path_i:
        from dcvc_tpu.utils.checkpoint import load_params

        i_rt.params = load_params(args.model_path_i, i_rt.params,
                                   model=args.i_frame_model)
    i_rt.ec_thread, i_rt.stream_part = bool(args.ec_thread), args.stream_part_i
    i_rt.update(force=True)
    i_rt = adapt_i_runtime(i_rt)

    p_rt = None
    if not args.force_intra:
        p_kwargs = {}
        from dcvc_tpu.ops.warp import (default_coding_warp_modes,
                                       default_mc_warp_mode,
                                       default_me_warp_mode,
                                       default_od_warp_mode)

        if args.write_stream:
            # write-stream runtimes default to the coding modes (tile OD +
            # exact mc/me): Pallas-bearing programs slow the roundtrip-heavy
            # real path on remote platforms (see default_coding_warp_modes)
            od_d, mc_d, me_d = default_coding_warp_modes()
        else:
            od_d, mc_d, me_d = (default_od_warp_mode(),
                                default_mc_warp_mode(),
                                default_me_warp_mode())

        def _mode(flag, default):
            return (default or "exact") if flag == "auto" else flag

        if args.p_frame_model == "dmc_dc":
            p_kwargs["od_warp_mode"] = _mode(args.od_warp, od_d)
            me = _mode(args.me_warp, me_d)
            if me != "exact":
                p_kwargs["me_warp_mode"] = me
        if args.p_frame_model in ("dmc_dc", "dmc_hem", "dmc_tcm",
                                  "dcvc_gen1"):
            mc = _mode(args.mc_warp, mc_d)
            if mc != "exact":
                p_kwargs["mc_warp_mode"] = mc
        _, _, p_rt = build(args.p_frame_model, **p_kwargs)
        if args.model_path_p:
            from dcvc_tpu.utils.checkpoint import load_params

            p_rt.params = load_params(args.model_path_p, p_rt.params,
                                       model=args.p_frame_model)
        p_rt.ec_thread, p_rt.stream_part = bool(args.ec_thread), args.stream_part_p
        if args.aligned_enc is not None and hasattr(p_rt, "aligned_enc"):
            p_rt.aligned_enc = bool(args.aligned_enc)
        p_rt.update(force=True)
        p_rt = adapt_p_runtime(p_rt)
    return i_rt, p_rt, pad_multiple


def _q_indexes(args):
    if args.q_indexes:
        return args.q_indexes
    if args.rate_num == 4:
        return [0, 1, 2, 3]
    import numpy as np

    return [int(v) for v in np.linspace(0, 63, args.rate_num)]


def _eval_one(i_rt, p_rt, pad_multiple, seq, rate_idx, q, args):
    from dcvc_tpu.runner.video import EvalConfig, run_sequence

    cfg = EvalConfig(
        pad_multiple=pad_multiple,
        intra_period=(1 if args.force_intra else
                      (args.force_intra_period or seq.gop)),
        frame_num=(args.force_frame_num if args.force_frame_num > 0
                   else seq.frames),
        write_stream=bool(args.write_stream),
        stream_path=args.stream_path,
        decoded_path=args.decoded_frame_path,
        calc_ssim=bool(args.calc_ssim),
        yuv420_metrics=bool(args.yuv420),
        verbose=args.verbose,
        q_in_ckpt=(args.rate_num == 4 and not args.q_indexes),
        chroma_upsample_order=args.chroma_upsample_order,
    )
    return run_sequence(i_rt, p_rt, seq, cfg, q_index_i=q, q_index_p=q)


def _pool_worker(args_dict, names_rates):
    """One --worker_num pool process: rebuild the runtimes once, evaluate a
    round-robin shard of (sequence, rate) items (the reference's worker
    protocol, DCVC-DC/test_video.py:276-338; errors recorded per item like
    parallel/jobs.py:run_sharded instead of killing the pool)."""
    import argparse as _ap

    args = _ap.Namespace(**args_dict)
    from dcvc_tpu.runner.video import load_dataset_config

    with open(args.test_config) as f:
        specs = {s.name: s for s in load_dataset_config(json.load(f))}
    i_rt, p_rt, pad_multiple = _build_runtimes(args)
    qi = _q_indexes(args)
    out = []
    for name, rate_idx in names_rates:
        try:
            s = _eval_one(i_rt, p_rt, pad_multiple, specs[name], rate_idx,
                          qi[rate_idx], args)
        except Exception as e:  # noqa: BLE001
            s = {"error": repr(e)}
        out.append((name, rate_idx, s))
    return out


def main():
    args = parse_args()
    from dcvc_tpu.runner.video import load_dataset_config
    from dcvc_tpu.utils.results import dump_json

    with open(args.test_config) as f:
        specs = load_dataset_config(json.load(f))
    q_indexes = _q_indexes(args)

    if args.worker_num > 1:
        import jax

        if jax.default_backend() != "cpu":
            sys.exit("error: --worker_num > 1 is CPU-eval only (a single "
                     "TPU chip cannot be shared across processes; use "
                     "parallel/jobs.py for multi-host fan-out)")
        import concurrent.futures as cf
        import multiprocessing as mp

        from dcvc_tpu.parallel.jobs import shard_work

        items = [(seq.name, r) for seq in specs
                 for r in range(len(q_indexes))]
        chunks = [shard_work(items, w, args.worker_num)
                  for w in range(args.worker_num)]
        results = {}
        t0 = time.time()
        with cf.ProcessPoolExecutor(
                max_workers=args.worker_num,
                mp_context=mp.get_context("spawn")) as ex:
            futs = [ex.submit(_pool_worker, vars(args), c)
                    for c in chunks if c]
            for f in futs:
                for name, rate_idx, summary in f.result():
                    results.setdefault(name, {})[f"rate_{rate_idx}"] = summary
                    if args.verbose and "error" not in summary:
                        print(f"[{time.time() - t0:7.1f}s] {name} "
                              f"rate {rate_idx} "
                              f"bpp={summary['ave_all_frame_bpp']:.4f} "
                              f"psnr={summary['ave_all_frame_psnr']:.3f}")
        dump_json(results, args.output_path)
        print(f"results -> {args.output_path}")
        return

    i_rt, p_rt, pad_multiple = _build_runtimes(args)

    results = {}
    t0 = time.time()
    for seq in specs:
        for rate_idx, q in enumerate(q_indexes):
            summary = _eval_one(i_rt, p_rt, pad_multiple, seq, rate_idx, q,
                                args)
            results.setdefault(seq.name, {})[f"rate_{rate_idx}"] = summary
            if args.verbose:
                print(f"[{time.time() - t0:7.1f}s] {seq.name} rate {rate_idx} "
                      f"bpp={summary['ave_all_frame_bpp']:.4f} "
                      f"psnr={summary['ave_all_frame_psnr']:.3f}")

    dump_json(results, args.output_path)
    print(f"results -> {args.output_path}")


if __name__ == "__main__":
    main()

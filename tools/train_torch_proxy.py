#!/usr/bin/env python
"""Torch-train the REFERENCE DMC on real-motion clips, port, RD-gate.

Second independent datapoint for the tile-warp RD gate (VERDICT #1/#2):
`tools/train_warp_proxy.py` trains OUR model with OUR trainer; this trains
the reference's own torch DMC (DCVC-DC/src/models/video_model.py:235) with
the reference's own dynamics — supervised SPyNet warmup on ground-truth
flow (MotionClips), then RD training — and ports the result through
`utils/port_dc.convert_dmc` so `tools/od_warp_study.py dmc --restore`
can measure exact-vs-tile end-metric deltas on reference-trained weights.

Runs entirely on CPU (torch) + CPU JAX for the port check.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--crop", type=int, default=64)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--flow_steps", type=int, default=400)
    p.add_argument("--rd_steps", type=int, default=1000)
    # the reference's OffsetDiversity .view() rejects B>1 inputs whose
    # repeat() strides span contiguous subspaces — RD phase runs at B=1
    p.add_argument("--rd_batch_size", type=int, default=1)
    p.add_argument("--max_v", type=float, default=5.0)
    p.add_argument("--workdir", default="out/torch_proxy")
    args = p.parse_args()

    import torch

    torch.manual_seed(0)
    np.random.seed(0)
    sys.path.insert(0, "/root/reference/DCVC-DC")
    from src.models.video_model import DMC as TorchDMC

    from dcvc_tpu.training.data import MotionClips

    os.makedirs(args.workdir, exist_ok=True)
    tm = TorchDMC()
    tm.train()
    data = MotionClips(crop=args.crop, max_v=args.max_v, pool=256, seed=0)

    def to_t(x):  # [B,H,W,C] numpy -> [B,C,H,W] torch
        return torch.tensor(np.transpose(x, (0, 3, 1, 2)),
                            dtype=torch.float32)

    # ---------------- phase A: supervised SPyNet warmup ----------------
    state_path = os.path.join(args.workdir, "torch_dmc.pt")
    flow_path = os.path.join(args.workdir, "torch_flow.pt")
    if args.flow_steps and os.path.exists(flow_path):
        print(f"phase A: restoring {flow_path}", flush=True)
        tm.load_state_dict(torch.load(flow_path, weights_only=True))
        args.flow_steps = 0
    if args.flow_steps:
        opt = torch.optim.Adam(tm.optic_flow.parameters(), lr=2e-4)
        t0 = time.time()
        it = data.batches_with_flow(args.batch_size, args.flow_steps)
        for i, (clips, flows) in enumerate(it):
            cur, ref = to_t(clips[:, 1]), to_t(clips[:, 0])
            gt = to_t(flows)
            est = tm.optic_flow(cur, ref)
            loss = torch.mean(torch.abs(est - gt))
            opt.zero_grad()
            loss.backward()
            opt.step()
            if (i + 1) % 100 == 0:
                print(f"[flow] step {i + 1} EPE-ish {float(loss):.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        torch.save(tm.state_dict(), flow_path)

    # ---------------- phase B: RD training (reference loss shape) -------
    # periodic checkpoint + resume: the converged-proxy runs (VERDICT r2 #3,
    # thousands of steps at crop>=256 on a 1-vCPU host) span hours — a kill
    # must not lose the run. rd_state.pt carries model+opt+step.
    rd_ckpt = os.path.join(args.workdir, "rd_state.pt")
    rd_start = 0
    if args.rd_steps:
        opt = torch.optim.Adam(tm.parameters(), lr=1e-4)
        if os.path.exists(rd_ckpt):
            st = torch.load(rd_ckpt, weights_only=False)
            tm.load_state_dict(st["model"])
            opt.load_state_dict(st["opt"])
            rd_start = int(st["step"])
            print(f"phase B: resuming {rd_ckpt} at step {rd_start}",
                  flush=True)
        lambdas = [85.0, 170.0, 380.0, 840.0]
        t0 = time.time()
        for i, clips in enumerate(data.batches(args.rd_batch_size,
                                               args.rd_steps)):
            if i < rd_start:
                continue  # replay the data stream to the resume point
            cur, ref = to_t(clips[:, 1]), to_t(clips[:, 0])
            dpb = {"ref_frame": ref, "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            qi = i % 4
            out = tm.forward_one_frame(cur, dpb, q_in_ckpt=True,
                                       q_index=qi, frame_idx=0)
            mse = torch.mean((out["dpb"]["ref_frame"] - cur) ** 2)
            loss = lambdas[qi] * 3.0 * mse + out["bpp"].mean()
            opt.zero_grad()
            loss.backward()
            torch.nn.utils.clip_grad_norm_(tm.parameters(), 5.0)
            opt.step()
            if (i + 1) % 50 == 0:
                print(f"[rd] step {i + 1} loss {float(loss):.3f} "
                      f"mse {float(mse):.5f} bpp "
                      f"{float(out['bpp'].mean()):.3f} "
                      f"({time.time() - t0:.0f}s)", flush=True)
            if (i + 1) % 100 == 0:
                torch.save({"model": tm.state_dict(),
                            "opt": opt.state_dict(), "step": i + 1},
                           rd_ckpt)
    tm.eval()
    torch.save(tm.state_dict(), state_path)

    # ---------------- port + motion-compensation check in JAX ----------
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from dcvc_tpu.models.video_dc import DMC
    from dcvc_tpu.utils import port_dc
    from dcvc_tpu.utils.checkpoint import save_params

    def jax_tree(d):
        return {k: jnp.asarray(v) if not isinstance(v, dict)
                else jax_tree(v) for k, v in d.items()}

    params = {"params": jax_tree(
        port_dc.convert_dmc(tm.state_dict())["params"])}
    ckpt = os.path.join(args.workdir, "proxy.npz")
    save_params(ckpt, params)

    module = DMC()
    clips, flows = next(data.batches_with_flow(4, 1))
    cur = jnp.asarray(clips[:, 1])
    ref = jnp.asarray(clips[:, 0])
    est = np.asarray(module.apply(
        params, cur, ref, method=lambda m, a, b: m.optic_flow(a, b)))
    epe = float(np.mean(np.linalg.norm(est - flows, axis=-1)))
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    out = jax.jit(lambda p, x, d, q: module.apply(p, x, d, q, 1))(
        params, cur, dpb, qs)
    x_hat = np.asarray(out["dpb"]["ref_frame"], np.float32)
    mse = float(np.mean((np.asarray(cur) - x_hat) ** 2))
    copy_mse = float(np.mean((np.asarray(cur) - np.asarray(ref)) ** 2))
    rec = {
        "flow_epe_px": round(epe, 3),
        "recon_psnr": round(10 * np.log10(1 / max(mse, 1e-12)), 2),
        "copy_psnr": round(10 * np.log10(1 / max(copy_mse, 1e-12)), 2),
        "bpp": round(float(np.mean(np.asarray(out["bpp"], np.float32))), 4),
    }
    print(json.dumps(rec), flush=True)
    with open(os.path.join(args.workdir, "proxy_check.json"), "w") as f:
        json.dump(rec, f, indent=2)


if __name__ == "__main__":
    main()

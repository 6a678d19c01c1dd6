#!/usr/bin/env python
"""Row-tile warp (ops/warp.py:tile_warp) accuracy/RD study — the round-2
gate for making it the TPU OffsetDiversity default (VERDICT item #1).

Three modes:
  stats  — clamp-fraction + warp-error tables over realistic flow families
           (global pan/zoom/rotation, layered motion with discontinuities,
           turbulence), per (T, R, base_mode). CPU-friendly.
  dmc    — end-metric deltas on the full DMC P-frame forward: recon PSNR
           drift + bpp drift, exact vs tile modes, same params (random init
           or --restore a trained checkpoint).
  bench  — TPU wall-clock A/B of the DMC frame per warp mode.

The exact warp is issue-bound (~17ns/slice, G*O*H*W slices); tile mode is
byte-bound — see PLAN.md for the v5e cost model.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


# ---------------------------------------------------------------------------
# realistic flow families
# ---------------------------------------------------------------------------

def flow_global(H, W, dx, dy, noise=0.0, rng=None):
    f = np.zeros((H, W, 2), np.float32)
    f[..., 0], f[..., 1] = dx, dy
    if noise and rng is not None:
        f += rng.normal(0, noise, f.shape).astype(np.float32)
    return f


def flow_affine(H, W, scale=1.02, angle_deg=1.0, tx=0.0, ty=0.0):
    """Flow of an affine warp about the image center (zoom/rotation pans
    grow linearly toward the borders — the classic large-|flow| case)."""
    ys, xs = np.mgrid[0:H, 0:W].astype(np.float32)
    cx, cy = (W - 1) / 2, (H - 1) / 2
    a = np.deg2rad(angle_deg)
    ca, sa = np.cos(a) * scale, np.sin(a) * scale
    sx = ca * (xs - cx) - sa * (ys - cy) + cx + tx
    sy = sa * (xs - cx) + ca * (ys - cy) + cy + ty
    return np.stack([sx - xs, sy - ys], axis=-1).astype(np.float32)


def flow_layered(H, W, rng, n_objects=6, bg=(1.5, -0.8), obj_mag=12.0):
    """Background translation + rigid objects with distinct motions —
    motion discontinuities at object borders (the tile mode's worst case)."""
    f = flow_global(H, W, *bg)
    for _ in range(n_objects):
        h = int(rng.integers(H // 8, H // 3))
        w = int(rng.integers(W // 8, W // 3))
        top = int(rng.integers(0, H - h))
        left = int(rng.integers(0, W - w))
        v = rng.uniform(-obj_mag, obj_mag, 2).astype(np.float32)
        f[top:top + h, left:left + w] = v
    return f


def flow_turbulence(H, W, rng, amp=4.0, sigma=24):
    from scipy import ndimage

    f = rng.standard_normal((H, W, 2)).astype(np.float32)
    f = ndimage.gaussian_filter(f, (sigma, sigma, 0))
    f *= amp / (np.abs(f).max() + 1e-9)
    return f


def od_offsets(flow, rng, n_maps=4, learned_amp=1.5, sigma=16):
    """OffsetDiversity-style per-map offsets: shared flow + smooth learned
    perturbation (conv-head outputs are smooth, tanh-bounded; trained nets
    keep them small)."""
    from scipy import ndimage

    H, W, _ = flow.shape
    outs = []
    for _ in range(n_maps):
        p = rng.standard_normal((H, W, 2)).astype(np.float32)
        p = ndimage.gaussian_filter(p, (sigma, sigma, 0))
        p *= learned_amp / (np.abs(p).max() + 1e-9)
        outs.append(flow + p)
    return outs


FAMILIES = {
    "pan_small": lambda H, W, rng: flow_global(H, W, 1.3, -0.6, 0.05, rng),
    "pan_large": lambda H, W, rng: flow_global(H, W, 17.4, 9.2, 0.05, rng),
    "zoom_rot": lambda H, W, rng: flow_affine(H, W, 1.015, 1.2, 2.0, -1.0),
    "layered": lambda H, W, rng: flow_layered(H, W, rng),
    "turbulence": lambda H, W, rng: flow_turbulence(H, W, rng),
}


# ---------------------------------------------------------------------------
# stats mode
# ---------------------------------------------------------------------------

def clamp_fraction(off, T, R, base_mode):
    H, W, _ = off.shape
    W_t = W - W % T
    o = off[:, :W_t].reshape(H, W_t // T, T, 2)
    if base_mode == "mean":
        base = np.round(o.mean(axis=2, keepdims=True))
    else:
        base = np.round(np.median(o, axis=2, keepdims=True))
    res = o - base
    bad = (res[..., 0] < -R) | (res[..., 0] >= R) \
        | (res[..., 1] < -R) | (res[..., 1] >= R)
    return float(bad.mean())


def run_stats(args):
    import jax.numpy as jnp

    from dcvc_tpu.ops.warp import flow_warp, resolve_warp_fn

    rng = np.random.default_rng(0)
    H, W = args.height, args.width
    from scipy import ndimage

    tex = ndimage.gaussian_filter(rng.random((H, W, 3)), (1.5, 1.5, 0)) \
        .astype(np.float32)
    tex = (tex - tex.min()) / (tex.max() - tex.min())

    # tile grid (with per-(T,R) mean/median), plus any modes passed via
    # --tile_modes (e.g. "block:8,2+block:16,2" for the Pallas block warp)
    modes = [f"tile:{T},{R},{b}"
             for T, R in [(16, 1), (16, 2), (32, 1), (32, 2), (64, 1)]
             for b in ("mean", "median")]
    modes += [m for m in args.tile_modes.split("+") if m not in modes]

    rows = []
    for fam, make in FAMILIES.items():
        maps = od_offsets(make(H, W, rng), rng, n_maps=args.maps)
        for mode in modes:
            warp = resolve_warp_fn(mode)
            if mode.startswith("tile"):
                spec = mode.split(":")[1].split(",")
                cf = np.mean([clamp_fraction(m, int(spec[0]), int(spec[1]),
                                             spec[2]) for m in maps])
            else:
                cf = None
            errs, psnrs = [], []
            for m in maps:
                fl = jnp.asarray(m)[None]
                im = jnp.asarray(tex)[None]
                exact = np.asarray(flow_warp(im, fl))
                approx = np.asarray(warp(im, fl))
                err = np.abs(exact - approx)
                errs.append(err.max())
                mse = np.mean((exact - approx) ** 2)
                psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
            rows.append({
                "family": fam, "mode": mode,
                "clamp_frac": None if cf is None else round(cf, 5),
                "max_err": round(float(np.max(errs)), 4),
                "psnr_vs_exact": round(float(np.mean(psnrs)), 2)})
    for r in rows:
        print(json.dumps(r))
    return rows


# ---------------------------------------------------------------------------
# dmc mode: end-metric deltas on the full model forward
# ---------------------------------------------------------------------------

def _moving_clip(H, W, rng, mag=6.0):
    """Textured frame pair with layered motion (ground-truth style)."""
    from scipy import ndimage

    base = ndimage.gaussian_filter(rng.random((H + 64, W + 64, 3)),
                                   (2, 2, 0)).astype(np.float32)
    base = (base - base.min()) / (base.max() - base.min())
    f0 = base[32:32 + H, 32:32 + W]
    fl = flow_layered(H, W, rng, bg=(mag / 3, -mag / 4), obj_mag=mag)
    ys, xs = np.mgrid[0:H, 0:W]
    sx = np.clip(xs + 32 + fl[..., 0], 0, W + 63).astype(np.float32)
    sy = np.clip(ys + 32 + fl[..., 1], 0, H + 63).astype(np.float32)
    f1 = np.stack([ndimage.map_coordinates(base[..., c], [sy, sx], order=1)
                   for c in range(3)], axis=-1)
    return f0, f1.astype(np.float32)


def run_dmc(args):
    import jax
    import jax.numpy as jnp

    from dcvc_tpu.models.video_dc import DMC
    from dcvc_tpu.utils.checkpoint import load_params

    H, W = args.height, args.width
    rng = np.random.default_rng(1)

    def build(mode):
        # "mc<spec>" applies <spec> to OffsetDiversity + the motion-
        # compensation warps (warpframe + context1/2/3); "all<spec>" also
        # to the SPyNet pyramid warps; bare "<spec>" to OD only.
        # --model hem/tcm: those generations have no OffsetDiversity, so
        # every mode string gates their mc (+ SPyNet via MESpynet) warps —
        # the VERDICT r2 #3 "HEM/TCM datapoint for the mc_warp modes".
        spec = mode
        for pre in ("all", "mc"):
            if mode.startswith(pre) and mode != "exact":
                spec = mode[len(pre):]
                break
        dt = jnp.bfloat16 if args.bf16 else None
        if args.model == "hem":
            from dcvc_tpu.models.video_hem import DMCHem

            module = DMCHem(mc_warp_mode=None if spec == "exact" else spec,
                            dtype=dt)
        elif args.model == "tcm":
            from dcvc_tpu.models.video_tcm import DMCTcm

            module = DMCTcm(mc_warp_mode=None if spec == "exact" else spec,
                            dtype=dt)
        elif mode.startswith("all"):
            module = DMC(od_warp_mode=mode[3:], mc_warp_mode=mode[3:],
                         me_warp_mode=mode[3:], dtype=dt)
        elif mode.startswith("mc"):
            module = DMC(od_warp_mode=mode[2:], mc_warp_mode=mode[2:],
                         dtype=dt)
        else:
            module = DMC(od_warp_mode=mode, dtype=dt)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
        init = module.init
        if jax.default_backend() != "cpu":
            # one compiled program on accelerators; eager on CPU (the jitted
            # whole-init program compiles pathologically slowly there)
            init = jax.jit(init, static_argnums=(4,) if args.model == "dmc"
                           else None)
        if args.model == "hem":
            dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_y": None,
                    "ref_mv_y": None}
            params = init(jax.random.PRNGKey(0), x0, dpb0,
                          jnp.ones(()), jnp.ones(()))
        elif args.model == "tcm":
            params = init(jax.random.PRNGKey(0), x0, x0, None)
        else:
            dpb0 = {"ref_frame": x0, "ref_feature": None,
                    "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            params = init(jax.random.PRNGKey(0), x0, dpb0, qs, 0)
        if args.restore:
            params = load_params(args.restore, params)
        return module, params, qs

    # evaluation pairs: synthetic layered-motion clips, or in-distribution
    # MotionClips (what tools/train_warp_proxy.py trains on)
    pairs = []
    if args.data == "motion":
        from dcvc_tpu.training.data import MotionClips

        mc = MotionClips(crop=min(H, W), max_v=args.motion, pool=64,
                         seed=123)
        clips, _ = next(mc.batches_with_flow(args.n_pairs, 1))
        for b in range(args.n_pairs):
            pairs.append((clips[b, 0], clips[b, 1]))
    else:
        for _ in range(args.n_pairs):
            pairs.append(_moving_clip(H, W, rng, mag=args.motion))

    modes = ["exact"] + args.tile_modes.split("+")
    built = {}
    for mode in modes:
        module, params, qs = build(mode)
        if args.model == "hem":
            fwd = jax.jit(lambda p, x, dpb, qd, m=module: m.apply(
                p, x, {k: dpb[k] for k in ("ref_frame", "ref_feature",
                                           "ref_y", "ref_mv_y")},
                qd["y_enc"], qd["y_dec"]))
        elif args.model == "tcm":
            fwd = jax.jit(lambda p, x, dpb, qd, m=module: m.apply(
                p, x, dpb["ref_frame"], None))
        else:
            fwd = jax.jit(
                lambda p, x, dpb, qd, m=module: m.apply(p, x, dpb, qd, 1))
        built[mode] = (params, fwd)

    # Multiple rate points (VERDICT r4 #2b): scale the encoder q up / the
    # decoder q down by s (finer quantization = more bits), giving a real
    # RD sweep on the same weights — the reference's y_q_scale grid does
    # the same thing with learned per-index values (video_model.py q_scale
    # vectors). With >=3 points a BD-rate vs exact is reported per mode.
    q_list = [float(s) for s in args.q_scales.split(",")]
    rd_curves = {m: {"bpp": [], "psnr": []} for m in modes}
    for qv in q_list:
        qd = {"mv_enc": jnp.asarray(qv), "mv_dec": jnp.asarray(1.0 / qv),
              "y_enc": jnp.asarray(qv), "y_dec": jnp.asarray(1.0 / qv)}
        results = {}
        for mode in modes:
            params, fwd = built[mode]
            psnrs, bpps, xhats = [], [], []
            for f0, f1 in pairs:
                x = jnp.asarray(f1)[None]
                dpb = {"ref_frame": jnp.asarray(f0)[None],
                       "ref_feature": None, "ref_mv_feature": None,
                       "ref_y": None, "ref_mv_y": None}
                out = fwd(params, x, dpb, qd)
                rec = (out["dpb"]["ref_frame"] if "dpb" in out
                       else out["recon_image"])  # TCM has no DPB dict
                x_hat = np.asarray(rec, np.float32)
                mse = float(np.mean(
                    (np.asarray(x, np.float32) - x_hat) ** 2))
                psnrs.append(10 * np.log10(1.0 / max(mse, 1e-12)))
                bpps.append(float(np.mean(np.asarray(out["bpp"],
                                                     np.float32))))
                xhats.append(x_hat)
            results[mode] = {"psnr": psnrs, "bpp": bpps, "x_hat": xhats}
        ex = results["exact"]
        for mode, r in results.items():
            dpsnr = np.asarray(r["psnr"]) - np.asarray(ex["psnr"])
            dbpp = 100 * (np.asarray(r["bpp"]) - np.asarray(ex["bpp"])) \
                / np.maximum(np.asarray(ex["bpp"]), 1e-9)
            drift = np.asarray([float(np.mean((a - b) ** 2))
                                for a, b in zip(r["x_hat"], ex["x_hat"])])
            rd_curves[mode]["bpp"].append(float(np.mean(r["bpp"])))
            rd_curves[mode]["psnr"].append(float(np.mean(r["psnr"])))
            print(json.dumps({
                "mode": mode,
                "q": qv,
                "psnr": round(float(np.mean(r["psnr"])), 4),
                "dpsnr_vs_exact_mean": round(float(dpsnr.mean()), 4),
                "dpsnr_vs_exact_worst": round(float(dpsnr.min()), 4),
                "bpp": round(float(np.mean(r["bpp"])), 6),
                "dbpp_pct_mean": round(float(dbpp.mean()), 3),
                "dbpp_pct_worst": round(float(np.max(np.abs(dbpp))), 3),
                "recon_drift_psnr": round(float(10 * np.log10(
                    1.0 / max(drift.mean(), 1e-12))), 2),
                "n_pairs": len(pairs),
            }), flush=True)
    if len(q_list) >= 3:
        from dcvc_tpu.utils.rd_numbers import bd_psnr, bd_rate

        exc = rd_curves["exact"]
        for mode in modes:
            if mode == "exact":
                continue
            c = rd_curves[mode]
            try:
                line = {
                    "mode": mode,
                    "bd_rate_pct_vs_exact": round(bd_rate(
                        exc["bpp"], exc["psnr"], c["bpp"], c["psnr"]), 4),
                    "bd_psnr_db_vs_exact": round(bd_psnr(
                        exc["bpp"], exc["psnr"], c["bpp"], c["psnr"]), 5),
                    "n_rate_points": len(q_list),
                }
            except ValueError as e:  # degenerate curve (e.g. random init)
                line = {"mode": mode, "bd_error": str(e)}
            print(json.dumps(line), flush=True)
    return rd_curves


# ---------------------------------------------------------------------------
# bench mode: TPU wall-clock A/B (chained frames, one readback probe)
# ---------------------------------------------------------------------------

def run_bench(args):
    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    import jax.numpy as jnp

    from dcvc_tpu.models.video_dc import DMC

    H, W = args.height, args.width
    dt = jnp.bfloat16 if args.bf16 else jnp.float32

    for mode in ["exact"] + args.tile_modes.split("+"):
      try:
        if mode.startswith("all"):
            module = DMC(od_warp_mode=mode[3:], mc_warp_mode=mode[3:],
                         me_warp_mode=mode[3:])
        elif mode.startswith("mc"):
            module = DMC(od_warp_mode=mode[2:], mc_warp_mode=mode[2:])
        else:
            module = DMC(od_warp_mode=mode)
        x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
        dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
                "ref_y": None, "ref_mv_y": None}
        qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
        params = jax.jit(module.init, static_argnums=(4,))(
            jax.random.PRNGKey(0), x0, dpb0, qs, 0)
        if args.bf16:
            params = jax.tree.map(
                lambda v: v.astype(dt) if v.dtype == jnp.float32 else v,
                params)

        @jax.jit
        def p_frame(p, x, dpb, qs):
            out = module.apply(p, x, dpb, qs, 1)
            # scalar probe: host readback of this value is the only reliable
            # sync on the remote-tunnel platform
            return out["dpb"], jnp.sum(out["dpb"]["ref_frame"])

        x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3), dt)
        dpb = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
               "ref_y": None, "ref_mv_y": None}
        n = args.iters
        dpb, probe = p_frame(params, x, dpb, qs)   # build steady-state dpb
        dpb, probe = p_frame(params, x, dpb, qs)   # steady-shape warm pass
        float(probe)
        t0 = time.time()
        for _ in range(n):
            dpb, probe = p_frame(params, x, dpb, qs)
        float(probe)
        dt_s = (time.time() - t0) / n
        print(json.dumps({"mode": mode, "ms_per_frame": round(dt_s * 1e3, 1),
                          "fps": round(1 / dt_s, 3)}), flush=True)
      except Exception as e:  # noqa: BLE001 — one mode failing (e.g. a
        # Mosaic lowering rejection on a new kernel) must not kill the A/B
        print(json.dumps({"mode": mode, "error": repr(e)[:500]}), flush=True)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["stats", "dmc", "bench"])
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=448)
    p.add_argument("--maps", type=int, default=4)
    p.add_argument("--motion", type=float, default=8.0)
    p.add_argument("--restore", default=None)
    p.add_argument("--model", choices=["dmc", "hem", "tcm"], default="dmc",
                   help="dmc mode generation: hem/tcm gate the mc warp "
                        "sites of those generations (no OffsetDiversity)")
    p.add_argument("--data", choices=["synthetic", "motion"],
                   default="synthetic",
                   help="dmc mode eval pairs: layered synthetic, or "
                        "in-distribution MotionClips (proxy training data)")
    p.add_argument("--n_pairs", type=int, default=1)
    p.add_argument("--q_scales", default="1.0",
                   help="comma list of q multipliers (enc*s, dec/s) — "
                        ">=3 values adds a BD-rate-vs-exact line per mode")
    p.add_argument("--tile_modes", default="tile:16,2+tile:32,1+tile:64,1")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()
    {"stats": run_stats, "dmc": run_dmc, "bench": run_bench}[args.mode](args)


if __name__ == "__main__":
    main()

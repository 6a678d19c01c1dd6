#!/usr/bin/env python
"""Where do the real-coding seconds go at 1080p on the tunnel?

BENCH real_enc_fps=0.02 (50 s/frame) contradicts the round-1 steady-state
measurements (compress ~0.8 s, decompress ~1.5 s @720p). Hypothesis: the
decompress path dispatches ~19 DISTINCT executables (static step/which
argnums fork 8 scales-step + 8 update-step programs + 3 stage programs),
and remote-tunnel program swaps cost seconds each (PLAN.md round-1 note).

Sections:
  swap    — two trivial jitted programs alternated vs repeated (isolates
            pure program-swap cost at a DMC-like operand size)
  stages  — per-stage wall time inside one decompress (which executables
            dominate)
  pattern — compress x4 consecutive, decompress x4 consecutive, then
            alternating enc/dec x4 (the bench/reference protocol,
            video_model.py:526-540)
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


def _sync(x):
    return float(jnp.sum(x))


def section_swap(H=1088, W=1920):
    a = jax.random.uniform(jax.random.PRNGKey(0), (1, H, W, 48), jnp.bfloat16)

    @jax.jit
    def f(x):
        return jnp.tanh(x) * 1.5 + 0.25

    @jax.jit
    def g(x):
        return jnp.exp(-jnp.abs(x)) + x * 0.5

    _sync(f(a)); _sync(g(a))  # compile both
    t0 = time.time()
    for _ in range(8):
        a2 = f(a)
    _sync(a2)
    rep = (time.time() - t0) / 8
    t0 = time.time()
    for _ in range(4):
        a2 = f(a)
        _sync(a2)
        a3 = g(a)
        _sync(a3)
    alt = (time.time() - t0) / 8
    print(json.dumps({"section": "swap", "repeat_ms": round(rep * 1e3, 1),
                      "alternate_ms": round(alt * 1e3, 1)}), flush=True)


def _build(H, W):
    from dcvc_tpu.models.runtime import DmcRuntime
    from dcvc_tpu.models.video_dc import DMC

    wm = os.environ.get("DCVC_DIAG_WARP")  # e.g. block:4,4,64,128,median4
    module = DMC(dtype=jnp.bfloat16, od_warp_mode=wm, mc_warp_mode=wm,
                 me_warp_mode=wm)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    rt = DmcRuntime(module, params, ec_thread=True, stream_part=3)
    rt.update(force=True)
    frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3),
                               jnp.float32)
    ref = jnp.roll(frame, 2, axis=2)
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}
    return rt, frame, dpb


def section_stages(H=1088, W=1920):
    rt, frame, dpb = _build(H, W)
    comp = rt.compress(frame, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    rt.decompress(dpb, comp["bit_stream"], H, W, q_in_ckpt=True,
                  q_index=0, frame_idx=1)  # warm all executables

    # instrumented decompress: mirror DmcRuntime.decompress with timers
    from dcvc_tpu.models.video_dc import G_CH
    from dcvc_tpu.ops.warp import get_downsampled_shape

    qs = rt.get_q_for_inference(True, 0)
    rt.entropy_coder.set_stream(comp["bit_stream"])
    zh, zw = get_downsampled_shape(H, W, 64)
    yh, yw = get_downsampled_shape(H, W, 16)
    t = {}
    t0 = time.time()
    mv_z_hat = jnp.asarray(rt._decode_z("bit_estimator_z_mv",
                                        (1, zh, zw, 64)))
    z_hat = jnp.asarray(rt._decode_z("bit_estimator_z",
                                     (1, zh, zw, G_CH["16x"])))
    t["z_decode"] = time.time() - t0
    t0 = time.time()
    mv_params = rt._mv_prior(rt.params, mv_z_hat, dpb["ref_mv_y"], yh, yw)
    _sync(mv_params.astype(jnp.float32))
    t["mv_prior"] = time.time() - t0

    def four_part(params, channels, which):
        host = dev = 0.0
        B, ph, pw = params.shape[0], params.shape[1], params.shape[2]
        so_far = jnp.zeros((B, ph, pw, channels), params.dtype)
        for step in range(4):
            d0 = time.time()
            idx_r, means_parts = rt._scales_step(rt.params, params, so_far,
                                                 step, which)
            idx_np = np.asarray(idx_r)
            dev += time.time() - d0
            h0 = time.time()
            dec = rt.gaussian.decode_with_indexes(rt.entropy_coder, idx_np)
            host += time.time() - h0
            d0 = time.time()
            y_q_r = jnp.asarray(dec.astype(np.float32))
            so_far = rt._update_step(params, so_far, y_q_r,
                                     tuple(means_parts), step)
            dev += time.time() - d0
        return so_far, dev, host

    t0 = time.time()
    mv_sofar, dev_mv, host_mv = four_part(mv_params, 64, "mv")
    t["mv_four_part_dev"], t["mv_four_part_host"] = dev_mv, host_mv
    t0 = time.time()
    y_params, contexts, mv_y_hat, mv_feature = rt._motion_stage(
        rt.params, mv_params, mv_sofar, qs["mv_dec"], dpb, z_hat,
        rt._fi_dev[1], yh, yw)
    _sync(y_params.astype(jnp.float32))
    t["motion_stage"] = time.time() - t0
    y_sofar, dev_y, host_y = four_part(y_params, G_CH["16x"], "y")
    t["y_four_part_dev"], t["y_four_part_host"] = dev_y, host_y
    t0 = time.time()
    x_hat, feature, y_hat = rt._recon_stage(rt.params, y_params, y_sofar,
                                            contexts, qs["y_dec"])
    _sync(x_hat.astype(jnp.float32))
    t["recon_stage"] = time.time() - t0
    print(json.dumps({"section": "stages",
                      **{k: round(v, 3) for k, v in t.items()}}),
          flush=True)


def section_stages3(H=1088, W=1920, n=3):
    """Steady-state per-stage decompress timings (n repeats) + encode
    split: compress_device compute+readback vs the plain forward."""
    rt, frame, dpb = _build(H, W)
    comp = rt.compress(frame, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    rt.decompress(dpb, comp["bit_stream"], H, W, q_in_ckpt=True,
                  q_index=0, frame_idx=1)

    from dcvc_tpu.models.video_dc import G_CH
    from dcvc_tpu.ops.warp import get_downsampled_shape

    qs = rt.get_q_for_inference(True, 0)
    zh, zw = get_downsampled_shape(H, W, 64)
    yh, yw = get_downsampled_shape(H, W, 16)
    for it in range(n):
        t = {}
        rt.entropy_coder.set_stream(comp["bit_stream"])
        t0 = time.time()
        mv_z_hat = jnp.asarray(rt._decode_z("bit_estimator_z_mv",
                                            (1, zh, zw, 64)))
        z_hat = jnp.asarray(rt._decode_z("bit_estimator_z",
                                         (1, zh, zw, G_CH["16x"])))
        t["z"] = time.time() - t0
        t0 = time.time()
        mv_params = rt._mv_prior(rt.params, mv_z_hat, dpb["ref_mv_y"],
                                 yh, yw)
        t["mv_prior_dispatch"] = time.time() - t0
        t0 = time.time()
        _ = np.asarray(mv_params)  # full-array readback = true sync
        t["mv_prior_sync"] = time.time() - t0
        t0 = time.time()
        mv_params2 = rt._mv_prior(rt.params, mv_z_hat, dpb["ref_mv_y"],
                                  yh, yw)
        _ = np.asarray(mv_params2)
        t["mv_prior_again"] = time.time() - t0
        print(json.dumps({"section": f"stages3[{it}]",
                          **{k: round(v, 3) for k, v in t.items()}}),
              flush=True)

    # encode split: forward-only vs compress_device (symbolization+pack)
    @jax.jit
    def fwd(p, x, dpb, qs, fi):
        out = rt.module.apply(p, x, dpb, qs, fi)
        return out["dpb"]["ref_frame"]

    r = fwd(rt.params, frame, dpb, rt._qs_cache[(True, 0)], rt._fi_dev[1])
    _ = np.asarray(r)
    t0 = time.time()
    for _i in range(2):
        r = fwd(rt.params, frame, dpb, rt._qs_cache[(True, 0)],
                rt._fi_dev[1])
        _ = np.asarray(r)
    fwd_s = (time.time() - t0) / 2
    t0 = time.time()
    for _i in range(2):
        o = rt._compress_dev(rt.params, frame, dpb,
                             rt._qs_cache[(True, 0)], rt._fi_dev[1])
        _ = np.asarray(o["packed"])
    comp_s = (time.time() - t0) / 2
    print(json.dumps({"section": "enc_split",
                      "fwd_readback_s": round(fwd_s, 2),
                      "compress_dev_s": round(comp_s, 2)}), flush=True)


def section_pattern(H=1088, W=1920, n=3):
    rt, frame, dpb = _build(H, W)
    comp = rt.compress(frame, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    dec = rt.decompress(dpb, comp["bit_stream"], H, W, q_in_ckpt=True,
                        q_index=0, frame_idx=1)
    cur = dec["dpb"]

    t0 = time.time()
    for i in range(n):
        comp = rt.compress(frame, cur, q_in_ckpt=True, q_index=0,
                           frame_idx=i + 2)
    enc_consec = (time.time() - t0) / n
    t0 = time.time()
    for i in range(n):
        out = rt.decompress(cur, comp["bit_stream"], H, W, q_in_ckpt=True,
                            q_index=0, frame_idx=i + 2)
    dec_consec = (time.time() - t0) / n
    t0 = time.time()
    for i in range(n):
        comp = rt.compress(frame, cur, q_in_ckpt=True, q_index=0,
                           frame_idx=i + 2)
        out = rt.decompress(cur, comp["bit_stream"], H, W, q_in_ckpt=True,
                            q_index=0, frame_idx=i + 2)
        cur = out["dpb"]
    alt = (time.time() - t0) / n
    print(json.dumps({"section": "pattern",
                      "enc_consecutive_s": round(enc_consec, 2),
                      "dec_consecutive_s": round(dec_consec, 2),
                      "encdec_alternating_s": round(alt, 2)}), flush=True)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    print(json.dumps({"backend": jax.default_backend(),
                      "devices": str(jax.devices())}), flush=True)
    if which in ("all", "swap"):
        section_swap()
    if which in ("all", "stages"):
        section_stages()
    if which in ("all", "stages3"):
        section_stages3()
    if which in ("all", "pattern"):
        section_pattern()


if __name__ == "__main__":
    main()

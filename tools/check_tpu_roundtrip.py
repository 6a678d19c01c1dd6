#!/usr/bin/env python
"""bf16 TPU write-stream round-trip conformance (round 5).

CPU/f32 round-trips are bit-exact by construction and pinned by the
golden-stream tests; this tool checks the property the CPU suite CANNOT
see: on TPU with bf16 compute, the encoder and decoder compute prior
scales in DIFFERENT XLA programs, and bf16 conv outputs are not bitwise-
reproducible across fusions. If a scale lands in a different quantization
bucket on the two sides, rANS desyncs and the remainder of that part's
stream decodes as garbage (measured on EVC @1080p before the round-5
decoder-aligned-index fix: 3.7M corrupted recon values).

PASS criteria per codec:
  - no rANS desync: decoded recon within FLOAT-LSB tolerance of the
    encoder's internal recon (desync produces O(1) errors; cross-program
    bf16 recon divergence is <= ~2e-3 at the recon surface)
  - latent planes that carry exact integers (DMC ref_mv_y) match exactly

Usage: python tools/check_tpu_roundtrip.py [--height 1088 --width 1920]
Writes one JSON line per codec; exit 1 on any FAIL.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp
import numpy as np

TOL = 4e-3    # one bf16 ulp at magnitude ~1 — cross-program LSB class
DESYNC = 0.05  # an rANS desync corrupts values at O(0.1-1)


def _report(name, pairs, extra=None):
    worst = 0.0
    n_desync = 0
    for a, b in pairs:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        d = np.abs(a - b)
        worst = max(worst, float(d.max()))
        n_desync += int((d > DESYNC).sum())
    ok = worst <= TOL and n_desync == 0
    print(json.dumps({"codec": name, "ok": ok,
                      "max_recon_divergence": worst, "tol": TOL,
                      "values_in_desync_class": n_desync,
                      **(extra or {})}), flush=True)
    return ok


def check_dmc(H, W):
    from dcvc_tpu.models.runtime import DmcRuntime
    from dcvc_tpu.models.video_dc import DMC
    from dcvc_tpu.ops.warp import default_coding_warp_modes

    od, mc, me = default_coding_warp_modes()
    module = DMC(dtype=jnp.bfloat16, od_warp_mode=od,
                 mc_warp_mode=None if mc in (None, "exact") else mc,
                 me_warp_mode=None if me in (None, "exact") else me)
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    rt = DmcRuntime(module, params)
    rt.update(force=True)
    frame = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3),
                               jnp.float32)
    dpb = {"ref_frame": jnp.roll(frame, 2, axis=2), "ref_feature": None,
           "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
    comp = rt.compress(frame, dpb, q_in_ckpt=True, q_index=0, frame_idx=1)
    dec = rt.decompress(dpb, comp["bit_stream"], H, W, q_in_ckpt=True,
                        q_index=0, frame_idx=1)
    mv_exact = np.array_equal(np.asarray(comp["dpb"]["ref_mv_y"], np.float32),
                              np.asarray(dec["dpb"]["ref_mv_y"], np.float32))
    return _report(
        "dmc_dc", [(comp["dpb"]["ref_frame"], dec["dpb"]["ref_frame"]),
                   (comp["dpb"]["ref_y"], dec["dpb"]["ref_y"])],
        {"mv_latent_exact": bool(mv_exact)})


def check_evc(H, W):
    from dcvc_tpu.models.registry import build

    _, _, rt = build("evc_SS", dtype=jnp.bfloat16)
    rt.update(force=True)
    x = jax.random.uniform(jax.random.PRNGKey(5), (1, H, W, 3), jnp.float32)
    q = jnp.ones(())
    comp = rt.compress(x, q)
    dec = rt.decompress(comp["bit_stream"], H, W, q)
    return _report("evc_SS", [(comp["x_hat"], dec["x_hat"])])


def check_intra_dc(H, W):
    from dcvc_tpu.models.intra_dc import IntraNoAR
    from dcvc_tpu.models.runtime import IntraDcRuntime

    module = IntraNoAR(dtype=jnp.bfloat16)
    params = jax.jit(module.init)(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)), jnp.ones(()),
                                  jnp.ones(()))
    rt = IntraDcRuntime(module, params)
    rt.update(force=True)
    x = jax.random.uniform(jax.random.PRNGKey(7), (1, H, W, 3), jnp.float32)
    comp = rt.compress(x, q_in_ckpt=True, q_index=0)
    dec = rt.decompress(comp["bit_stream"], H, W, q_in_ckpt=True, q_index=0)
    return _report("intra_dc", [(comp["x_hat"], dec["x_hat"])])


def _coding_mc_mode():
    from dcvc_tpu.ops.warp import default_coding_warp_modes

    _, mc, _ = default_coding_warp_modes()
    return None if mc in (None, "exact") else mc


def check_hem(H, W):
    from dcvc_tpu.models.runtime import HemVideoRuntime
    from dcvc_tpu.models.video_hem import DMCHem

    module = DMCHem(dtype=jnp.bfloat16, mc_warp_mode=_coding_mc_mode())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_y": None,
            "ref_mv_y": None}
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x0, dpb0,
                                  jnp.ones(()), jnp.ones(()))
    rt = HemVideoRuntime(module, params)
    rt.update(force=True)
    frame = jax.random.uniform(jax.random.PRNGKey(3), (1, H, W, 3),
                               jnp.float32)
    dpb = {"ref_frame": jnp.roll(frame, 2, axis=2), "ref_feature": None,
           "ref_y": None, "ref_mv_y": None}
    comp = rt.compress(frame, dpb, 0.9, 0.8)
    dec = rt.decompress(dpb, comp["bit_stream"], H, W, 0.9, 0.8)
    return _report(
        "dmc_hem", [(comp["dpb"]["ref_frame"], dec["dpb"]["ref_frame"]),
                    (comp["dpb"]["ref_y"], dec["dpb"]["ref_y"])])


def check_tcm(H, W):
    from dcvc_tpu.models.runtime import TcmVideoRuntime
    from dcvc_tpu.models.video_tcm import DMCTcm

    module = DMCTcm(dtype=jnp.bfloat16, mc_warp_mode=_coding_mc_mode())
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    params = jax.jit(module.init)(jax.random.PRNGKey(0), x0, x0, None)
    rt = TcmVideoRuntime(module, params)
    rt.update(force=True)
    frame = jax.random.uniform(jax.random.PRNGKey(4), (1, H, W, 3),
                               jnp.float32)
    ref = jnp.roll(frame, 2, axis=2)
    comp = rt.compress(frame, ref, None)
    dec = rt.decompress(ref, None, comp["bit_stream"], H, W)
    return _report("dmc_tcm", [(comp["x_hat"], dec["x_hat"]),
                               (comp["feature"], dec["feature"])])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--codecs", default="evc,dmc,intra")
    args = p.parse_args()
    print(json.dumps({"backend": jax.default_backend(),
                      "size": [args.height, args.width]}), flush=True)
    ok = True
    if "evc" in args.codecs:
        ok &= check_evc(args.height, args.width)
    if "dmc" in args.codecs:
        ok &= check_dmc(args.height, args.width)
    if "intra" in args.codecs:
        ok &= check_intra_dc(args.height, args.width)
    if "hem" in args.codecs:
        ok &= check_hem(args.height, args.width)
    if "tcm" in args.codecs:
        ok &= check_tcm(args.height, args.width)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

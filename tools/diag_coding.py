#!/usr/bin/env python
"""Real-coding (rANS write-stream) DMC throughput on the accelerator.

Measures compress (device compute -> symbol-plane readback -> host rANS) and
decompress (host rANS <-> staged device decode, 8 serial y steps + 2 z) per
frame, plus a breakdown of where the time goes.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp
import numpy as np


def main():
    H = int(os.environ.get("DIAG_H", 704))
    W = int(os.environ.get("DIAG_W", 1280))
    iters = int(os.environ.get("DIAG_ITERS", 4))
    ec_thread = bool(int(os.environ.get("DIAG_EC_THREAD", "0")))
    stream_part = int(os.environ.get("DIAG_STREAM_PART", "1"))
    from dcvc_tpu.models.runtime import DmcRuntime
    from dcvc_tpu.models.video_dc import DMC

    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb0 = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb0, qs, 0)
    rt = DmcRuntime(module, params, ec_thread=ec_thread,
                    stream_part=stream_part)
    rt.update(force=True)
    print("init + tables done", flush=True)

    x = jax.random.uniform(jax.random.PRNGKey(1), (1, H, W, 3))
    ref = jax.random.uniform(jax.random.PRNGKey(2), (1, H, W, 3))
    dpb = {"ref_frame": ref, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}

    # build steady-state dpb + warm BOTH structural variants (I-dpb and
    # P-dpb compile separate executables — time only the steady-state one)
    out = rt.compress(x, dpb, False, 32, 1)
    dpb_p = out["dpb"]
    stream = out["bit_stream"]
    dec = rt.decompress(dpb, stream, H, W, False, 32, 1)
    out = rt.compress(x, dpb_p, False, 32, 2)
    stream = out["bit_stream"]
    dec = rt.decompress(dpb_p, stream, H, W, False, 32, 2)
    _ = np.asarray(dec["dpb"]["ref_frame"])
    print(f"warm: stream={len(stream)}B "
          f"bpp={len(stream) * 8 / (H * W):.4f}", flush=True)

    t0 = time.time()
    cur = dpb_p
    for i in range(iters):
        out = rt.compress(x, cur, False, 32, i + 2)
        cur = out["dpb"]
        stream = out["bit_stream"]
    enc_dt = (time.time() - t0) / iters
    print(f"compress: {enc_dt * 1000:.0f} ms/frame ({1 / enc_dt:.2f} fps)",
          flush=True)

    t0 = time.time()
    cur = dpb_p
    for i in range(iters):
        dec = rt.decompress(cur, stream, H, W, False, 32, i + 2)
        cur = dec["dpb"]
    _ = np.asarray(cur["ref_frame"][0, 0, 0])
    dec_dt = (time.time() - t0) / iters
    print(f"decompress: {dec_dt * 1000:.0f} ms/frame ({1 / dec_dt:.2f} fps)",
          flush=True)
    tot = enc_dt + dec_dt
    print(f"enc+dec: {tot * 1000:.0f} ms/frame ({1 / tot:.2f} fps)", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Headline benchmark: DCVC-DC (DMC) 1080p encode+decode frames/s per chip.

Runs the flagship P-frame codec in estimated-bits mode (the reference's
write_stream=0 path, DCVC-DC/test_video.py) at 1080p on the available
accelerator and prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "fps", "vs_baseline": N}

vs_baseline is measured fps / reference GPU fps. No GPU fps figure is
published in-repo (BASELINE.md); external context for DCVC-DC on A100-era
GPUs is ~0.7 fps for encode+decode at 1080p RGB (~0.8 s enc + 0.6 s dec per
frame) — used as the provisional denominator until a measured reference
number is recorded.
"""

import json
import time

import jax

# persistent compilation cache: the DMC program is large and the remote AOT
# compile is slow; cache compiled executables across runs
jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
import jax.numpy as jnp

from dcvc_tpu.models.video_dc import DMC

REFERENCE_GPU_FPS = 0.71  # 1/(0.8s enc + 0.6s dec) @1080p, DCVC-DC paper-era


def _wait_for_device(max_tries: int = 6, delay: float = 30.0):
    """The axon chip claim can linger after a killed client; retry."""
    for i in range(max_tries):
        try:
            jax.block_until_ready(jnp.ones((8, 8)).sum())
            return
        except Exception as e:  # noqa: BLE001
            print(f"# device probe failed ({i + 1}/{max_tries}): {e}",
                  flush=True)
            time.sleep(delay)
    raise RuntimeError("accelerator unavailable")


def main():
    _wait_for_device()
    H, W = 1088, 1920  # 1080p padded to /16
    # bf16 compute (f32 params): the TPU-idiomatic inference dtype; f32
    # activations at 1080p exceed single-chip HBM in the grouped warp
    module = DMC(dtype=jnp.bfloat16)
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}

    # init at tiny resolution (params are resolution-independent); jit the
    # 1080p step itself
    x0 = jnp.zeros((1, 64, 64, 3), jnp.float32)
    dpb_init = {"ref_frame": x0, "ref_feature": None, "ref_mv_feature": None,
                "ref_y": None, "ref_mv_y": None}
    params = jax.jit(module.init, static_argnums=(4,))(
        jax.random.PRNGKey(0), x0, dpb_init, qs, 0)

    x = jnp.zeros((1, H, W, 3), jnp.float32)
    dpb0 = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
            "ref_y": None, "ref_mv_y": None}

    @jax.jit
    def p_frame(p, x, dpb, qs):
        out = module.apply(p, x, dpb, qs, 1)
        # scalar probe: the final host readback of this value cannot complete
        # before the whole chain has executed (block_until_ready alone does
        # not reliably block on remote-tunnel platforms)
        return out["dpb"], out["bit"], jnp.sum(out["dpb"]["ref_frame"])

    key = jax.random.PRNGKey(1)
    frame = jax.random.uniform(key, (1, H, W, 3), jnp.float32)

    # build steady-state dpb (all entries present), then time
    dpb, _, probe = p_frame(params, frame, dpb0, qs)
    _ = float(probe)

    n_warm, n_iter = 2, 8
    cur = dpb
    for _ in range(n_warm):
        cur, bit, probe = p_frame(params, frame, cur, qs)
    _ = float(probe)

    # timing: chain n_iter DEPENDENT frames (dpb feeds the next call, exactly
    # the real GOP recurrence), then one host readback of the scalar probe
    t0 = time.time()
    for _ in range(n_iter):
        cur, bit, probe = p_frame(params, frame, cur, qs)
    _ = float(probe)
    dt = (time.time() - t0) / n_iter

    fps = 1.0 / dt
    print(json.dumps({
        "metric": "dcvc_dc_1080p_p_frame_encdec_bf16",
        "value": round(fps, 3),
        "unit": "fps",
        "vs_baseline": round(fps / REFERENCE_GPU_FPS, 3),
    }))


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Measure wide SINGLE-ROW gather slices on the TPU gather unit.

The packed warp (ops/warp.py) issues one [1,2,2C] slice per output pixel at
~17ns/slice regardless of width. The row-tile OffsetDiversity idea needs
[1, T+2R+2, Cpack] slices (one per 1xT run of output pixels) to stay on the
same fast path — if wide single-row slices keep the ~17ns issue rate, the
slice count (and OD cost) drops ~T-fold. This sweeps slice widths and
channel packs at a fixed slice COUNT and reports ns/slice.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp
import numpy as np


def chain(tag, step, state, iters=5):
    try:
        s0 = step(state)
        _ = float(jnp.sum(s0))
    except Exception as e:
        print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:160]}", flush=True)
        return None
    t0 = time.time()
    s = state
    for _ in range(iters):
        s = step(s)
    _ = float(jnp.sum(s))
    dt = (time.time() - t0) / iters
    return dt


def main():
    H, W = 720, 1280
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2, 3), collapsed_slice_dims=(0,),
        start_index_map=(1, 2),
        operand_batching_dims=(), start_indices_batching_dims=())

    for Cp, dtype in ((18, jnp.float32), (18, jnp.bfloat16),
                      (36, jnp.bfloat16), (6, jnp.float32)):
        op = jax.random.normal(jax.random.PRNGKey(0), (1, H, W + 64, Cp),
                               dtype=dtype)
        for K in (2, 8, 16, 22, 40):
            N = 1_000_000
            ys = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, H)
            xs = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, W)
            idx = jnp.stack([ys, xs], axis=-1)

            def step(s, _op=op, _idx=idx, _K=K, _Cp=Cp):
                # chain via index perturbation so iterations depend
                i2 = (_idx + jnp.int32(jnp.sum(s) != 12345)) % jnp.asarray(
                    [H, W], jnp.int32)
                out = jax.lax.gather(_op, i2, dn,
                                     slice_sizes=(1, 1, _K, _Cp),
                                     mode=jax.lax.GatherScatterMode.CLIP)
                return jnp.sum(out, axis=(1, 2, 3), dtype=jnp.float32)

            dt = chain(f"K={K}", step, jnp.zeros((N,), jnp.float32))
            if dt is not None:
                bw = N * K * Cp * np.dtype(
                    np.float32 if dtype == jnp.float32 else np.float16
                ).itemsize / dt / 1e9
                print(f"Cp={Cp} {np.dtype('float32' if dtype == jnp.float32 else 'bfloat16').name:8s} K={K:3d}: "
                      f"{dt * 1e3:7.1f} ms  {dt / N * 1e9:6.1f} ns/slice  "
                      f"{bw:7.1f} GB/s", flush=True)


if __name__ == "__main__":
    main()

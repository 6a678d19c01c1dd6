#!/usr/bin/env python
"""Measure Mosaic dynamic-offset DMA cost (HBM->VMEM) per block.

Decides the round-2 Pallas tile-warp design (PLAN.md): per (map, row) the
kernel would DMA a [A, W', C] row band at a dynamic row start. If DMA issue
overhead is ~1us/copy, 23k copies/map-set is ~25ms — far under the 176-489ms
XLA gather formulations. This micro-bench: grid over rows, one dynamic-start
block DMA + a trivial reduce per step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_dcvc")
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def make_bench(H, Wp, C, A, rows_per_step=8):
    def kernel(by_ref, src_ref, out_ref):
        i = pl.program_id(0)

        def inner(scratch, sem):
            def body(r, _):
                start = by_ref[i * rows_per_step + r]
                dma = pltpu.make_async_copy(
                    src_ref.at[pl.ds(start, A)], scratch, sem)
                dma.start()
                dma.wait()
                out_ref[r, :] = scratch[0, 0, :]
                return 0

            jax.lax.fori_loop(0, rows_per_step, body, 0)

        pl.run_scoped(
            inner,
            scratch=pltpu.VMEM((A, C, Wp), jnp.float32),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(H // rows_per_step,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((rows_per_step, Wp), lambda i, by: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((H, Wp), jnp.float32),
    )


def main():
    # realistic tile-warp band: src [Hp, C(sublanes), Wp(lanes)], band A rows
    H, Wp, C, A = 720, 1408, 16, 4
    src = jax.random.normal(jax.random.PRNGKey(0), (H + A, C, Wp))
    by = jnp.clip(
        jax.random.randint(jax.random.PRNGKey(1), (H,), -8, 8)
        + jnp.arange(H), 0, H - 1).astype(jnp.int32)

    fn = jax.jit(make_bench(H, Wp, C, A))
    try:
        out = fn(by, src)
        _ = float(jnp.sum(out))
    except Exception as e:
        print(f"FAILED: {type(e).__name__}: {str(e)[:400]}")
        return
    t0 = time.time()
    n = 10
    for _ in range(n):
        out = fn((by + 1) % (H - A), src)
    _ = float(jnp.sum(out))
    dt = (time.time() - t0) / n
    bytes_total = H * A * Wp * C * 4
    print(f"{H} dynamic block DMAs of [{A},{C},{Wp}]f32: {dt*1e3:.2f} ms "
          f"-> {dt/H*1e9:.0f} ns/DMA, {bytes_total/dt/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Model complexity report: params + analytical FLOPs via XLA cost analysis.

Parity target: EVC/model_complexity.py (ptflops MACs/params on 1920x1088).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="evc_LL")
    p.add_argument("--height", type=int, default=1088)
    p.add_argument("--width", type=int, default=1920)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dcvc_tpu.models.registry import build

    module, params, rt = build(args.model)
    n_params = sum(x.size for x in jax.tree.leaves(params))
    print(f"{args.model}: {n_params / 1e6:.3f} M params")

    x = jnp.zeros((1, args.height, args.width, 3))
    if args.model.startswith(("evc", "intra_hem")):
        fn = lambda p, x: module.apply(p, x, jnp.ones(()))
    elif args.model == "intra_dc":
        fn = lambda p, x: module.apply(p, x, jnp.ones(()), jnp.ones(()))
    elif args.model.startswith("dmc_dc"):
        def fn(p, x):
            dpb = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
                   "ref_y": None, "ref_mv_y": None}
            qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc",
                                            "y_dec")}
            return module.apply(p, x, dpb, qs, 0)
    else:
        fn = lambda p, x: module.apply(p, x)

    lowered = jax.jit(fn).lower(params, x)
    cost = lowered.cost_analysis()
    flops = cost.get("flops", 0.0)
    bytes_accessed = cost.get("bytes accessed", 0.0)
    print(f"forward @ {args.width}x{args.height}: "
          f"{flops / 1e9:.2f} GFLOPs, {bytes_accessed / 1e9:.2f} GB accessed")
    print(f"MACs/pixel: {flops / 2 / (args.height * args.width) / 1e3:.1f}K")


if __name__ == "__main__":
    main()

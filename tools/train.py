#!/usr/bin/env python
"""P-frame training CLI — parity with the fork's train_CANFVC_DMC.py surface.

Stages, q-level cycling, cascaded losses and checkpointing live in
dcvc_tpu/training/trainer.py; this wires the dataset and model choice.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="dmc_dc",
                   choices=["dmc_dc", "dmc_hem", "canfvc"])
    p.add_argument("--dataset_root", default=None,
                   help="Vimeo-90k root; synthetic data if omitted")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--steps_per_epoch", type=int, default=1000)
    p.add_argument("--crop", type=int, default=256)
    p.add_argument("--workdir", default="out/train")
    p.add_argument("--restore", default=None)
    p.add_argument("--remat", choices=["auto", "0", "1"], default="auto",
                   help="jax.checkpoint each frame apply. auto: on for TPU "
                        "at crop >= 192 (the B=4 cascade at 256px exceeds a "
                        "single 16GB v5e without it)")
    p.add_argument("--ssim", action="store_true",
                   help="train on (1 - MS-SSIM)/64 instead of MSE (the "
                        "fork's --ssim, train_CANFVC_DMC.py:74)")
    p.add_argument("--quant_mode", choices=["ste", "noise"], default="ste",
                   help="noise = the fork's training rate surrogate (bits "
                        "from noise-quantized residuals, HEM "
                        "video_model.py:466-471)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dcvc_tpu.training.data import SyntheticClips, VimeoDataset
    from dcvc_tpu.training.trainer import (PFrameTrainer, dmc_dc_adapter,
                                           hem_adapter)

    if args.model == "dmc_dc":
        from dcvc_tpu.models.video_dc import DMC

        module = DMC()
    elif args.model == "dmc_hem":
        from dcvc_tpu.models.video_hem import DMCHem

        module = DMCHem()
    else:
        from dcvc_tpu.models.video_canf import CANFVCDmc

        module = CANFVCDmc()

    x = jnp.zeros((1, args.crop, args.crop, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    if args.model == "dmc_dc":
        dpb["ref_mv_feature"] = None
        qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
        params = jax.jit(module.init, static_argnums=(4,))(
            jax.random.PRNGKey(0), x, dpb, qs, 0)
    else:
        params = jax.jit(module.init)(jax.random.PRNGKey(0), x, dpb,
                                      jnp.ones(()), jnp.ones(()))

    if args.remat == "auto":
        use_remat = jax.default_backend() != "cpu" and args.crop >= 192
    else:
        use_remat = args.remat == "1"
    schedule = None
    if use_remat:
        from dataclasses import replace

        from dcvc_tpu.training.trainer import DEFAULT_SCHEDULE

        schedule = [replace(st, remat=True) for st in DEFAULT_SCHEDULE]

    adapter = dmc_dc_adapter if args.model == "dmc_dc" else hem_adapter
    trainer = PFrameTrainer(module, params, workdir=args.workdir,
                            apply_adapter=adapter, schedule=schedule,
                            distortion="ssim" if args.ssim else "mse",
                            quant_mode=args.quant_mode)
    if args.restore:
        trainer.restore(args.restore)

    if args.dataset_root:
        data = VimeoDataset(args.dataset_root, crop=args.crop)
    else:
        print("no --dataset_root: running on synthetic clips (smoke mode)")
        data = SyntheticClips(crop=min(args.crop, 64), frames=5)

    trainer.fit(data, batch_size=args.batch_size,
                steps_per_epoch=args.steps_per_epoch)


if __name__ == "__main__":
    main()

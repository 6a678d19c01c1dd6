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
    p.add_argument("--val_config", default=None,
                   help="dataset JSON (test_video schema): per-epoch "
                        "first-GOP validation + best-checkpoint monitor "
                        "(the fork's protocol, train_CANFVC_DMC.py:241)")
    p.add_argument("--val_iframe_model", default=None,
                   help="intra model that codes validation I-frames "
                        "(CodedIFrameData — the fork's BitstreamData/BPG "
                        "equivalent, DCVC-HEM/dataloader.py:216). "
                        "Pristine I-frames if omitted")
    p.add_argument("--val_iframe_path", default=None,
                   help="checkpoint (.pth/.npz) for --val_iframe_model")
    p.add_argument("--val_steps", type=int, default=8)
    p.add_argument("--max_epochs", type=int, default=None,
                   help="truncate the stage schedule to this many total "
                        "epochs (the fork's trainer max_epochs)")
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
    if use_remat or args.max_epochs is not None:
        from dataclasses import replace

        from dcvc_tpu.training.trainer import DEFAULT_SCHEDULE

        schedule = [replace(st, remat=use_remat) for st in DEFAULT_SCHEDULE]
        if args.max_epochs is not None:
            budget, cut = args.max_epochs, []
            for st in schedule:
                take = min(st.epochs, budget)
                budget -= take
                if take:
                    cut.append(replace(st, epochs=take))
            schedule = cut

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

    val_data = None
    if args.val_config:
        import json

        from dcvc_tpu.training.data import CodedIFrameData, VideoTestData

        with open(args.val_config) as f:
            cfg = json.load(f)
        if args.val_iframe_model:
            import numpy as np

            from dcvc_tpu.models.registry import build
            from dcvc_tpu.ops.warp import (crop_lrtb, get_padding_size,
                                           replicate_pad)
            from dcvc_tpu.runner.adapters import adapt_i_runtime

            _, _, i_rt = build(args.val_iframe_model)
            if args.val_iframe_path:
                from dcvc_tpu.utils.checkpoint import load_params

                i_rt.params = load_params(args.val_iframe_path, i_rt.params,
                                          model=args.val_iframe_model)
            i_ad = adapt_i_runtime(i_rt)
            pad_m = 16 if args.val_iframe_model in ("intra_dc",) else 64

            def coder(frame):
                x = jnp.asarray(frame, jnp.float32)[None]
                pads = get_padding_size(x.shape[1], x.shape[2], pad_m)
                out = i_ad.forward(replicate_pad(x, pads), True, 0)
                return np.asarray(crop_lrtb(out["x_hat"], pads)[0])

            val_data = CodedIFrameData(
                cfg, coder, tag=f"{args.val_iframe_model}_q0",
                first_gop=True)
        else:
            val_data = VideoTestData(cfg, first_gop=True)

    trainer.fit(data, batch_size=args.batch_size,
                steps_per_epoch=args.steps_per_epoch,
                val_dataset=val_data, val_steps=args.val_steps)


if __name__ == "__main__":
    main()

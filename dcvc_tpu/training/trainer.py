"""Multi-stage P-frame training harness.

Parity target: the fork's Lightning harness (DCVC-HEM/src/train_CANFVC_DMC.py):
  * epoch-keyed stage schedule with per-stage module freeze lists (:125-176),
  * per-batch-element q_level cycling with lambda table (:184-186),
  * cascaded-frame loss over growing frame counts with detach policy
    (:188-210),
  * AdamW + MultiStep LR + grad clamp +-5 (:605-631),
  * periodic checkpointing and resume.

TPU-first: one jitted train step per stage (cascade length and freeze mask
are static); freezing is an optax mask, not Python-side requires_grad.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..utils.checkpoint import load_params, save_params
from .step import TRAIN_LAMBDAS, rd_loss


@dataclass
class Stage:
    name: str
    epochs: int
    cascade_frames: int = 1
    detach: bool = True
    trainable_prefixes: tuple = ()  # empty = train everything
    lr: float = 1e-4
    # MultiStepLR-style decay (fork configure_optimizers, lr_gamma=0.5):
    # lr multiplies by lr_gamma at each epoch milestone within the stage
    lr_milestones: tuple = ()
    lr_gamma: float = 0.5
    remat: bool = False  # jax.checkpoint each frame apply (memory vs FLOPs)


# default schedule following the fork's phase progression
DEFAULT_SCHEDULE = [
    Stage("train_2frames", epochs=5, cascade_frames=1, detach=True),
    Stage("train_cascade", epochs=3, cascade_frames=2, detach=True),
    Stage("train_fullgop", epochs=2, cascade_frames=4, detach=False,
          lr=1e-5),
]


def _freeze_mask(params, prefixes):
    """Label tree: True where trainable."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def trainable(path):
        if not prefixes:
            return True
        keys = "/".join(getattr(p, "key", str(p)) for p in path)
        return any(pref in keys for pref in prefixes)

    paths = [trainable(p) for p, _ in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, paths)


def dmc_dc_adapter(module, params, x, dpb, lambdas, t,
                   quant_mode="ste", rngs=None):
    """Apply adapter for the DC-generation DMC signature."""
    B = x.shape[0]
    qs = {k: jnp.ones((B, 1, 1, 1)) for k in ("mv_enc", "mv_dec",
                                              "y_enc", "y_dec")}
    return module.apply(params, x, dpb, qs, t, quant_mode, rngs=rngs)


def hem_adapter(module, params, x, dpb, lambdas, t,
                quant_mode="ste", rngs=None):
    """Apply adapter for DMCHem / CANFVCDmc (scalar mv/y q_scales)."""
    B = x.shape[0]
    q = jnp.ones((B, 1, 1, 1))
    return module.apply(params, x, dpb, q, q, quant_mode, rngs=rngs)


class PFrameTrainer:
    """Trains a DMC-family module on clips [B, T, H, W, 3]."""

    def __init__(self, module, params, schedule=None, grad_clamp: float = 5.0,
                 weight_decay: float = 1e-2, workdir: str = "out/train",
                 apply_adapter=None, distortion: str = "mse",
                 quant_mode: str = "ste", seed: int = 0):
        """``distortion="ssim"`` trains on (1-MS-SSIM)/64 (the fork's --ssim,
        train_CANFVC_DMC.py:74,199-200); ``quant_mode="noise"`` enables the
        fork's rate surrogate (bits from noise-quantized residuals, HEM
        video_model.py:466-471)."""
        self.module = module
        self.params = params
        self.schedule = schedule or DEFAULT_SCHEDULE
        self.grad_clamp = grad_clamp
        self.weight_decay = weight_decay
        self.workdir = workdir
        self.apply_adapter = apply_adapter or dmc_dc_adapter
        self.distortion = distortion
        self.quant_mode = quant_mode
        self.rng = jax.random.PRNGKey(seed)
        os.makedirs(workdir, exist_ok=True)
        self.history: list[dict] = []
        self.best_val_loss: float | None = None

    def _build_step(self, stage: Stage, steps_per_epoch: int = 0):
        module = self.module
        mask = _freeze_mask(self.params, stage.trainable_prefixes)
        if stage.lr_milestones and steps_per_epoch:
            lr = optax.piecewise_constant_schedule(
                stage.lr,
                {int(m) * steps_per_epoch: stage.lr_gamma
                 for m in stage.lr_milestones})
        else:
            lr = stage.lr
        tx = optax.chain(
            optax.clip(self.grad_clamp),
            optax.masked(optax.adamw(lr,
                                     weight_decay=self.weight_decay), mask),
        )

        apply_adapter = self.apply_adapter
        quant_mode, distortion = self.quant_mode, self.distortion
        if stage.remat:
            inner = apply_adapter

            def apply_adapter(module, params, x, dpb, lambdas, t,
                              quant_mode="ste", rngs=None):
                return jax.checkpoint(
                    lambda p, x, dpb, rngs: inner(
                        module, p, x, dpb, lambdas, t,
                        quant_mode=quant_mode, rngs=rngs),
                    static_argnums=())(params, x, dpb, rngs)

        def loss_fn(params, clip, lambdas, key):
            x0 = clip[:, 0]
            dpb = {"ref_frame": x0, "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            total = 0.0
            for t in range(1, stage.cascade_frames + 1):
                x = clip[:, t]
                rngs = ({"noise": jax.random.fold_in(key, t)}
                        if quant_mode == "noise" else None)
                out = apply_adapter(module, params, x, dpb, lambdas, t,
                                    quant_mode=quant_mode, rngs=rngs)
                total = total + rd_loss(x, out["dpb"]["ref_frame"],
                                        out["bpp"], lambdas, distortion)
                dpb = dict(out["dpb"])
                if stage.detach:
                    dpb = jax.tree.map(jax.lax.stop_gradient, dpb)
            return total / stage.cascade_frames

        @jax.jit
        def step(params, opt_state, clip, lambdas, key):
            loss, grads = jax.value_and_grad(loss_fn)(params, clip, lambdas,
                                                      key)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return tx, step

    def fit(self, dataset, batch_size: int = 4, steps_per_epoch: int = 100,
            log_every: int = 20, save_every_epoch: bool = True,
            val_dataset=None, val_steps: int = 8, epoch_offset: int = 0,
            last_epoch_steps: int | None = None):
        """``val_dataset`` adds a per-epoch no-update validation pass (the
        fork validates each epoch against the first GOP of every test
        sequence, train_CANFVC_DMC.py:241-320); val loss lands in
        history[..]["val_loss"]. ``last_epoch_steps`` shortens the FINAL
        epoch of each stage so a total step budget that is not a multiple
        of steps_per_epoch is honored exactly (ADVICE r4: the previous
        behavior rounded up by as much as steps_per_epoch-1 steps)."""
        global_step = 0
        for stage in self.schedule:
            tx, step = self._build_step(stage, steps_per_epoch)
            opt_state = tx.init(self.params)
            for epoch in range(stage.epochs):
                t0 = time.time()
                losses = []
                n_steps = (last_epoch_steps
                           if last_epoch_steps and epoch == stage.epochs - 1
                           else steps_per_epoch)
                for clip in dataset.batches(batch_size, n_steps):
                    B = clip.shape[0]
                    levels = (np.arange(B) + global_step) % 4
                    lambdas = jnp.asarray(np.asarray(TRAIN_LAMBDAS)[levels])
                    self.rng, key = jax.random.split(self.rng)
                    self.params, opt_state, loss = step(
                        self.params, opt_state, jnp.asarray(clip), lambdas,
                        key)
                    losses.append(float(loss))
                    global_step += 1
                    if global_step % log_every == 0:
                        print(f"[{stage.name} ep{epoch}] step {global_step} "
                              f"loss {np.mean(losses[-log_every:]):.4f}")
                rec = {"stage": stage.name, "epoch": epoch,
                       "loss": float(np.mean(losses)),
                       "time": time.time() - t0}
                if val_dataset is not None:
                    rec["val_loss"] = self.validate(
                        val_dataset, stage, batch_size, val_steps)
                    # fork ModelCheckpoint(monitor='val/loss', save_top_k)
                    # semantics (train_CANFVC_DMC.py:745-753)
                    if (self.best_val_loss is None
                            or rec["val_loss"] < self.best_val_loss):
                        self.best_val_loss = rec["val_loss"]
                        rec["best"] = True
                        self.save(os.path.join(self.workdir, "best.npz"))
                self.history.append(rec)
                if save_every_epoch:
                    # epoch_offset keeps GLOBAL epoch indices across
                    # crash-resume relaunches (a fresh fit() would
                    # otherwise overwrite ep0 and stall resume detection)
                    self.save(os.path.join(
                        self.workdir,
                        f"{stage.name}_ep{epoch + epoch_offset}.npz"))
        return self.params

    def validate(self, dataset, stage: Stage | None = None,
                 batch_size: int = 4, steps: int = 8) -> float:
        """Average cascaded RD loss over ``steps`` batches, no updates.

        Runs in eval quantization (hard round, real bit estimate) like the
        fork's validation_step, whatever the training quant_mode."""
        stage = stage or self.schedule[0]
        module, adapter = self.module, self.apply_adapter
        distortion = self.distortion

        @jax.jit
        def val_loss(params, clip, lambdas):
            x0 = clip[:, 0]
            dpb = {"ref_frame": x0, "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            total = 0.0
            for t in range(1, stage.cascade_frames + 1):
                out = adapter(module, params, clip[:, t], dpb, lambdas, t,
                              quant_mode="round")
                total = total + rd_loss(clip[:, t], out["dpb"]["ref_frame"],
                                        out["bpp"], lambdas, distortion)
                dpb = dict(out["dpb"])
            return total / stage.cascade_frames

        losses = []
        for i, clip in enumerate(dataset.batches(batch_size, steps)):
            B = clip.shape[0]
            lambdas = jnp.asarray(
                np.asarray(TRAIN_LAMBDAS)[(np.arange(B) + i) % 4])
            losses.append(float(val_loss(self.params, jnp.asarray(clip),
                                         lambdas)))
        return float(np.mean(losses))

    def grad_norms(self, clip, lambdas=None) -> dict:
        """Per-top-level-module gradient L2 norms — the TPU-side equivalent
        of the fork's plot_grad_flow diagnostic (vision.py:263)."""
        stage = self.schedule[0]
        module, adapter = self.module, self.apply_adapter
        if lambdas is None:
            lambdas = jnp.asarray(
                np.asarray(TRAIN_LAMBDAS)[np.arange(clip.shape[0]) % 4])

        def loss_fn(params):
            x0 = clip[:, 0]
            dpb = {"ref_frame": x0, "ref_feature": None,
                   "ref_mv_feature": None, "ref_y": None, "ref_mv_y": None}
            out = adapter(module, params, clip[:, 1], dpb, lambdas, 1)
            return rd_loss(clip[:, 1], out["dpb"]["ref_frame"], out["bpp"],
                           lambdas)

        grads = jax.grad(loss_fn)(self.params)
        return {k: float(optax.global_norm(v))
                for k, v in grads["params"].items()}

    def save(self, path: str):
        save_params(path, self.params)
        with open(os.path.join(self.workdir, "history.json"), "w") as f:
            json.dump(self.history, f, indent=2)

    def restore(self, path: str):
        self.params = load_params(path, self.params)

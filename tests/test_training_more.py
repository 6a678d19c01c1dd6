"""Additional trainer coverage: HEM adapter + intra RD step."""

import jax
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.models.evc import EVCIntra
from dcvc_tpu.models.video_hem import DMCHem
from dcvc_tpu.training.data import SyntheticClips
from dcvc_tpu.training.step import make_intra_train_step, make_optimizer
from dcvc_tpu.training.trainer import PFrameTrainer, Stage, hem_adapter


def test_hem_trainer_smoke(tmp_path):
    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None, "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))
    trainer = PFrameTrainer(module, params,
                            schedule=[Stage("smoke", 1, cascade_frames=1)],
                            workdir=str(tmp_path), apply_adapter=hem_adapter)
    data = SyntheticClips(crop=64, frames=2)
    before = np.asarray(
        params["params"]["contextual_encoder"]["conv1"]["kernel"]).copy()
    new_params = trainer.fit(data, batch_size=2, steps_per_epoch=2,
                             save_every_epoch=False)
    after = np.asarray(
        new_params["params"]["contextual_encoder"]["conv1"]["kernel"])
    assert not np.allclose(before, after)
    assert np.isfinite(trainer.history[-1]["loss"])


def test_intra_train_step():
    module = EVCIntra(enc_channels=(8, 8, 16, 32), dec_channels=(8, 8, 16, 32),
                      N=32)
    x = jnp.zeros((2, 64, 64, 3))
    params = module.init(jax.random.PRNGKey(0), x[:1], jnp.ones(()))
    optimizer = make_optimizer()
    step = jax.jit(make_intra_train_step(module, optimizer))
    opt_state = optimizer.init(params)
    clip = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)),
                       jnp.float32)
    lambdas = jnp.asarray([85.0, 380.0])
    q = jnp.ones((2, 1, 1, 1))
    new_params, opt_state, aux = step(params, opt_state, clip, q, lambdas)
    assert np.isfinite(float(aux["loss"]))
    diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                        params, new_params)
    assert max(jax.tree.leaves(diff)) > 0


def test_trainer_remat_stage(tmp_path):
    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None, "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))
    trainer = PFrameTrainer(
        module, params,
        schedule=[Stage("remat", 1, cascade_frames=1, remat=True)],
        workdir=str(tmp_path), apply_adapter=hem_adapter)
    data = SyntheticClips(crop=64, frames=2)
    trainer.fit(data, batch_size=1, steps_per_epoch=1, save_every_epoch=False)
    assert np.isfinite(trainer.history[-1]["loss"])


def test_dmc_train_step_remat_matches_plain():
    """remat=True must be a pure memory/FLOPs trade: identical loss/grads."""
    import jax
    import jax.numpy as jnp

    from dcvc_tpu.models.video_hem import DMCHem
    from dcvc_tpu.training.step import make_optimizer

    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb,
                         jnp.ones(()), jnp.ones(()))
    opt = make_optimizer()
    opt_state = opt.init(params)
    clip = jax.random.uniform(jax.random.PRNGKey(1), (1, 2, 64, 64, 3))
    qs = jnp.ones((1,))
    lambdas = jnp.asarray([85.0])

    outs = {}
    for remat in (False, True):
        step = _make_hem_step(module, opt, remat)
        _, _, aux = step(params, opt_state, clip, qs, lambdas)
        outs[remat] = float(aux["loss"])
    assert np.isfinite(outs[False])
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6)


def _make_hem_step(module, optimizer, remat):
    """make_dmc_train_step drives the DC apply signature; build the HEM
    equivalent inline to exercise the remat wrapper on a small model."""
    import jax
    import jax.numpy as jnp
    import optax

    from dcvc_tpu.training.step import rd_loss

    def loss_fn(params, clip, q_scales, lambdas):
        x0 = clip[:, 0]
        dpb = {"ref_frame": x0, "ref_feature": None, "ref_y": None,
               "ref_mv_y": None}
        apply = module.apply
        if remat:
            apply = jax.checkpoint(module.apply, static_argnums=(5,))
        total = 0.0
        for t in range(1, 2):
            x = clip[:, t]
            out = apply(params, x, dpb, q_scales[0], q_scales[0], "ste")
            total = total + rd_loss(x, out["dpb"]["ref_frame"], out["bpp"],
                                    lambdas)
        return total, {"loss": total}

    def train_step(params, opt_state, clip, q_scales, lambdas):
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, clip, q_scales, lambdas)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, aux

    return train_step


def test_trainer_validation_and_grad_norms(tmp_path):
    from dcvc_tpu.training.data import SyntheticClips
    from dcvc_tpu.training.trainer import PFrameTrainer, Stage, hem_adapter

    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))
    trainer = PFrameTrainer(
        module, params, schedule=[Stage("s", 1, cascade_frames=1)],
        workdir=str(tmp_path), apply_adapter=hem_adapter)
    data = SyntheticClips(crop=64, frames=2)
    trainer.fit(data, batch_size=1, steps_per_epoch=1,
                save_every_epoch=False, val_dataset=data, val_steps=1)
    assert "val_loss" in trainer.history[-1]
    assert np.isfinite(trainer.history[-1]["val_loss"])

    clip = next(iter(data.batches(1, 1)))
    norms = trainer.grad_norms(jnp.asarray(clip))
    assert norms and all(np.isfinite(v) for v in norms.values())
    assert any(v > 0 for v in norms.values())


def test_stage_lr_milestones_decay():
    """MultiStepLR-style per-stage decay (fork configure_optimizers)."""
    import optax

    from dcvc_tpu.training.trainer import PFrameTrainer, Stage, hem_adapter

    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))
    trainer = PFrameTrainer(
        module, params,
        schedule=[Stage("s", 1, lr=1e-3, lr_milestones=(1,), lr_gamma=0.1)],
        workdir="/tmp/lrtest", apply_adapter=hem_adapter)
    tx, _ = trainer._build_step(trainer.schedule[0], steps_per_epoch=5)
    # the underlying schedule decays at step 5
    sched = optax.piecewise_constant_schedule(1e-3, {5: 0.1})
    assert abs(float(sched(0)) - 1e-3) < 1e-9
    assert abs(float(sched(5)) - 1e-4) < 1e-9

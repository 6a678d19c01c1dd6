"""Training-fidelity features: differentiable MS-SSIM criterion and the
noise rate surrogate (VERDICT round-1 item #4).

Parity targets: pytorch_msssim semantics (the fork's criterion,
train_CANFVC_DMC.py:74) and the HEM training bit path
(common_model.py:47-50, video_model.py:466-471).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.video_hem import DMCHem
from dcvc_tpu.ops.ms_ssim import ms_ssim, ms_ssim_distortion
from dcvc_tpu.ops.ms_ssim import _ssim_per_channel, _gauss_kernel_1d
from dcvc_tpu.training.data import SyntheticClips
from dcvc_tpu.training.step import make_dmc_train_step, make_optimizer, rd_loss
from dcvc_tpu.training.trainer import PFrameTrainer, Stage, hem_adapter
from dcvc_tpu.utils import metrics


def _natural(rng, shape):
    """Smooth-ish random image batch in [0,1] (blurred noise)."""
    from scipy import ndimage

    x = rng.random(shape)
    x = ndimage.gaussian_filter(x, sigma=(0, 3, 3, 0))
    x = x - x.min()
    return (x / x.max()).astype(np.float32)


class TestMsSsim:
    def test_identical_is_one(self):
        x = jnp.asarray(_natural(np.random.default_rng(0), (2, 192, 200, 3)))
        v = ms_ssim(x, x)
        np.testing.assert_allclose(np.asarray(v), 1.0, atol=1e-5)

    def test_monotone_in_noise(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(_natural(rng, (1, 192, 192, 3)))
        n = jnp.asarray(rng.standard_normal(x.shape), jnp.float32)
        v1 = float(ms_ssim(x, jnp.clip(x + 0.02 * n, 0, 1))[0])
        v2 = float(ms_ssim(x, jnp.clip(x + 0.08 * n, 0, 1))[0])
        assert 0 < v2 < v1 < 1

    def test_single_level_matches_metrics_ssim(self):
        """One SSIM level == utils.metrics.calc_ssim (same 11x11 sigma-1.5
        valid-mode window), per channel."""
        rng = np.random.default_rng(2)
        a = _natural(rng, (1, 96, 104, 1))
        b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1) \
            .astype(np.float32)
        win = jnp.asarray(_gauss_kernel_1d(11, 1.5))
        ssim_pc, _ = _ssim_per_channel(jnp.asarray(a), jnp.asarray(b), win,
                                       data_range=1.0)
        ref_map, _ = metrics.calc_ssim(a[0, :, :, 0], b[0, :, :, 0],
                                       data_range=1.0)
        np.testing.assert_allclose(float(ssim_pc[0, 0]), ref_map.mean(),
                                   rtol=0, atol=1e-5)

    def test_close_to_hm_msssim(self):
        """Loose cross-check vs the HM-style numpy metric (the two MS-SSIM
        variants differ only in downsample border handling)."""
        rng = np.random.default_rng(3)
        a = _natural(rng, (1, 192, 192, 1))
        b = np.clip(a + 0.03 * rng.standard_normal(a.shape), 0, 1) \
            .astype(np.float32)
        ours = float(ms_ssim(jnp.asarray(a), jnp.asarray(b), data_range=1.0)[0])
        hm = metrics.calc_msssim(a[0, :, :, 0], b[0, :, :, 0], data_range=1.0)
        assert abs(ours - hm) < 2e-3

    def test_gradient_finite_nonzero(self):
        rng = np.random.default_rng(4)
        x = jnp.asarray(_natural(rng, (1, 192, 192, 3)))
        y = jnp.clip(x + 0.05 * jnp.asarray(
            rng.standard_normal(x.shape), jnp.float32), 0, 1)
        g = jax.grad(lambda y: ms_ssim(x, y).sum())(y)
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).max()) > 0

    def test_distortion_level_drop_small_inputs(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(_natural(rng, (1, 64, 64, 3)))
        y = jnp.clip(x + 0.05 * jnp.asarray(
            rng.standard_normal(x.shape), jnp.float32), 0, 1)
        d = ms_ssim_distortion(x, y)
        assert d.shape == (1,)
        assert 0 < float(d[0]) < 1 / 64
        # strict metric must still refuse
        with pytest.raises(ValueError):
            ms_ssim(x, y)

    def test_rd_loss_ssim_criterion(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(_natural(rng, (2, 64, 64, 3)))
        y = jnp.clip(x + 0.05 * jnp.asarray(
            rng.standard_normal(x.shape), jnp.float32), 0, 1)
        bpp = jnp.asarray([0.1, 0.2])
        lam = jnp.asarray([85.0, 840.0])
        l_ssim = float(rd_loss(x, y, bpp, lam, "ssim"))
        l_mse = float(rd_loss(x, y, bpp, lam, "mse"))
        assert np.isfinite(l_ssim) and l_ssim != l_mse


@pytest.fixture(scope="module")
def tiny_hem():
    module = DMCHem(channel_mv=16, channel_N=16, channel_M=24)
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
           "ref_mv_y": None}
    params = module.init(jax.random.PRNGKey(0), x, dpb, jnp.ones(()),
                         jnp.ones(()))
    return module, params, dpb


class TestNoiseSurrogate:
    def test_noise_mode_changes_rate_not_recon(self, tiny_hem):
        """noise mode: recon path identical to STE, rate term perturbed —
        the reference split (video_model.py:466-471)."""
        module, params, dpb = tiny_hem
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.random((1, 64, 64, 3)), jnp.float32)
        q = jnp.ones(())
        out_ste = module.apply(params, x, dpb, q, q, "ste")
        out_noise = module.apply(params, x, dpb, q, q, "noise",
                                 rngs={"noise": jax.random.PRNGKey(7)})
        np.testing.assert_allclose(np.asarray(out_noise["dpb"]["ref_frame"]),
                                   np.asarray(out_ste["dpb"]["ref_frame"]),
                                   atol=1e-6)
        assert float(out_noise["bpp"][0]) != float(out_ste["bpp"][0])
        # the surrogate stays in the same ballpark as the hard-round rate
        assert 0.2 < float(out_noise["bpp"][0]) / float(out_ste["bpp"][0]) < 5

    def test_noise_mode_deterministic_per_key(self, tiny_hem):
        module, params, dpb = tiny_hem
        x = jnp.asarray(np.random.default_rng(1).random((1, 64, 64, 3)),
                        jnp.float32)
        q = jnp.ones(())
        b1 = module.apply(params, x, dpb, q, q, "noise",
                          rngs={"noise": jax.random.PRNGKey(3)})["bpp"]
        b2 = module.apply(params, x, dpb, q, q, "noise",
                          rngs={"noise": jax.random.PRNGKey(3)})["bpp"]
        b3 = module.apply(params, x, dpb, q, q, "noise",
                          rngs={"noise": jax.random.PRNGKey(4)})["bpp"]
        assert float(b1[0]) == float(b2[0])
        assert float(b1[0]) != float(b3[0])

    def test_train_step_noise_finite_grads(self, tiny_hem):
        module, params, _ = tiny_hem
        optimizer = make_optimizer()

        def adapter_module_apply(params, x, dpb, q_scales, t, quant_mode,
                                 rngs=None):
            return module.apply(params, x, dpb, q_scales, q_scales,
                                quant_mode, rngs=rngs)

        class _Shim:
            apply = staticmethod(adapter_module_apply)

        step = make_dmc_train_step(_Shim, optimizer, cascade_frames=1,
                                   quant_mode="noise")
        opt_state = optimizer.init(params)
        clip = jnp.asarray(np.random.default_rng(2).random((1, 2, 64, 64, 3)),
                           jnp.float32)
        lam = jnp.asarray([170.0])
        new_params, _, aux = step(params, opt_state, clip, jnp.ones(()), lam,
                                  key=jax.random.PRNGKey(11))
        assert np.isfinite(float(aux["loss"]))
        diff = jax.tree.map(lambda a, b: float(jnp.abs(a - b).max()),
                            params, new_params)
        assert max(jax.tree.leaves(diff)) > 0

    def test_trainer_noise_ssim_smoke(self, tmp_path, tiny_hem):
        module, params, _ = tiny_hem
        trainer = PFrameTrainer(
            module, params, schedule=[Stage("smoke", 1, cascade_frames=1)],
            workdir=str(tmp_path), apply_adapter=hem_adapter,
            distortion="ssim", quant_mode="noise")
        data = SyntheticClips(crop=64, frames=2)
        trainer.fit(data, batch_size=1, steps_per_epoch=2,
                    save_every_epoch=False)
        assert np.isfinite(trainer.history[-1]["loss"])


def test_best_checkpoint_monitor(tmp_path, tiny_hem):
    """Validation writes best.npz when val loss improves (fork
    ModelCheckpoint monitor semantics, train_CANFVC_DMC.py:745-753)."""
    import os

    module, params, _ = tiny_hem
    trainer = PFrameTrainer(
        module, params, schedule=[Stage("smoke", 2, cascade_frames=1)],
        workdir=str(tmp_path), apply_adapter=hem_adapter)
    data = SyntheticClips(crop=64, frames=2)
    trainer.fit(data, batch_size=1, steps_per_epoch=1,
                save_every_epoch=False, val_dataset=data, val_steps=1)
    assert trainer.best_val_loss is not None
    assert os.path.exists(os.path.join(str(tmp_path), "best.npz"))
    assert any(r.get("best") for r in trainer.history)


def test_trainer_remat_plus_noise(tmp_path, tiny_hem):
    """jax.checkpoint composed with the flax noise-RNG stream (remat stages
    under the noise rate surrogate) must train finitely."""
    module, params, _ = tiny_hem
    trainer = PFrameTrainer(
        module, params,
        schedule=[Stage("rn", 1, cascade_frames=1, remat=True)],
        workdir=str(tmp_path), apply_adapter=hem_adapter,
        quant_mode="noise")
    data = SyntheticClips(crop=64, frames=2)
    trainer.fit(data, batch_size=1, steps_per_epoch=1,
                save_every_epoch=False)
    assert np.isfinite(trainer.history[-1]["loss"])

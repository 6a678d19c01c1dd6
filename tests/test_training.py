"""Training harness smoke tests: stage schedule, freeze masks, step math."""

import jax
import jax.numpy as jnp
import numpy as np

from dcvc_tpu.models.video_dc import DMC
from dcvc_tpu.training.data import SyntheticClips
from dcvc_tpu.training.step import q_levels_for_batch
from dcvc_tpu.training.trainer import PFrameTrainer, Stage, _freeze_mask


def _tiny_dmc():
    module = DMC()
    x = jnp.zeros((1, 64, 64, 3))
    dpb = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
           "ref_y": None, "ref_mv_y": None}
    qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
    params = module.init(jax.random.PRNGKey(0), x, dpb, qs, 0)
    return module, params


def test_q_levels_cycling():
    levels, lambdas = q_levels_for_batch(6, base_step=2)
    np.testing.assert_array_equal(np.asarray(levels), [2, 3, 0, 1, 2, 3])
    assert float(lambdas[1]) == 840.0


def test_freeze_mask_prefixes():
    module, params = _tiny_dmc()
    mask = _freeze_mask(params, ("optic_flow",))
    leaves = jax.tree_util.tree_flatten_with_path(mask)[0]
    on = [v for p, v in leaves if v]
    assert 0 < len(on) < len(leaves)


def test_trainer_one_stage_updates_params(tmp_path):
    module, params = _tiny_dmc()
    trainer = PFrameTrainer(
        module, params,
        schedule=[Stage("smoke", epochs=1, cascade_frames=1)],
        workdir=str(tmp_path))
    data = SyntheticClips(crop=64, frames=2)
    before = np.asarray(
        params["params"]["contextual_encoder"]["conv1"]["kernel"]).copy()
    new_params = trainer.fit(data, batch_size=2, steps_per_epoch=2,
                             save_every_epoch=False)
    after = np.asarray(
        new_params["params"]["contextual_encoder"]["conv1"]["kernel"])
    assert not np.allclose(before, after)
    assert np.isfinite(trainer.history[-1]["loss"])

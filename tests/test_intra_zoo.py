"""CompressAI-style intra zoo tests: all five families round-trip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dcvc_tpu.models.intra_zoo import (
    Cheng2020Anchor,
    FactorizedPrior,
    JointAutoregressiveHierarchicalPriors,
    MeanScaleHyperprior,
    ScaleHyperprior,
    model_architectures,
)
from dcvc_tpu.models.runtime import IntraZooRuntime


def _img(h=64, w=64, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((1, h // 8, w // 8, 3))
    img = jax.image.resize(jnp.asarray(base), (1, h, w, 3), "linear")
    return jnp.clip(img, 0, 1).astype(jnp.float32)


def _build(cls, **kw):
    module = cls(**kw)
    params = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)))
    rt = IntraZooRuntime(module, params)
    rt.update(force=True)
    return rt


@pytest.mark.parametrize("cls,kw", [
    (FactorizedPrior, dict(N=16, M=24)),
    (ScaleHyperprior, dict(N=16, M=24)),
    (MeanScaleHyperprior, dict(N=16, M=24)),
    (JointAutoregressiveHierarchicalPriors, dict(N=16, M=16)),
    (Cheng2020Anchor, dict(N=16, M=16)),
])
def test_zoo_roundtrip(cls, kw):
    rt = _build(cls, **kw)
    x = _img(seed=3)
    out = rt.forward(x)
    assert np.isfinite(float(out["bpp"][0] if out["bpp"].ndim else out["bpp"]))
    comp = rt.compress(x)
    dec = rt.decompress(comp["strings"], comp["shape"])
    np.testing.assert_allclose(np.asarray(comp["x_hat"]),
                               np.asarray(dec["x_hat"]), atol=1e-5)


def test_registry_complete():
    assert set(model_architectures) == {
        "bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean",
        "mbt2018", "cheng2020-anchor"}

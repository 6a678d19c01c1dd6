"""Model + runtime registry: one place to build any codec in the framework.

The capability surface mirrors the reference repos:
  DCVC-DC   -> intra_dc.IntraNoAR + video_dc.DMC        (north star)
  DCVC-HEM  -> intra_hem.IntraNoARHem + video_hem.DMCHem
  DCVC-TCM  -> intra_zoo (per-rate) + video_tcm.DMCTcm
  DCVC      -> intra_zoo (CompressAI zoo) + video_dcvc.DCVCNet
  EVC       -> evc.EVCIntra grid + evc_scalable.ScalableEVC
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _init_intra(module, size=64):
    x = jnp.zeros((1, size, size, 3))
    return module.init(jax.random.PRNGKey(0), x, jnp.ones(()))


def build(name: str, seed: int = 0, **kwargs):
    """Returns (module, params, runtime) with freshly initialized params."""
    from . import (evc, evc_scalable, intra_dc, intra_hem, intra_zoo,
                   video_dc, video_dcvc, video_hem, video_tcm)
    from .runtime import (DcvcGen1Runtime, DmcRuntime, EvcCodecRuntime,
                          HemVideoRuntime, IntraDcRuntime, IntraZooRuntime,
                          TcmVideoRuntime)

    key = jax.random.PRNGKey(seed)
    x = jnp.zeros((1, 64, 64, 3))

    if name.startswith("evc_"):  # evc_LL .. evc_SS
        module = evc.make_evc(name.split("_")[1], **kwargs)
        params = module.init(key, x, jnp.ones(()))
        return module, params, EvcCodecRuntime(module, params)
    if name == "evc_scalable":
        from .runtime import ScalableEvcRuntime

        module = evc_scalable.ScalableEVC(**kwargs)
        params = module.init(key, x, jnp.ones(()))
        return module, params, ScalableEvcRuntime(module, params)
    if name == "intra_dc":
        module = intra_dc.IntraNoAR(**kwargs)
        params = module.init(key, x, jnp.ones(()), jnp.ones(()))
        return module, params, IntraDcRuntime(module, params)
    if name == "intra_hem":
        module = intra_hem.IntraNoARHem(**kwargs)
        params = module.init(key, x, jnp.ones(()))
        return module, params, EvcCodecRuntime(module, params)
    if name in intra_zoo.model_architectures:
        module = intra_zoo.model_architectures[name](**kwargs)
        params = module.init(key, x)
        return module, params, IntraZooRuntime(module, params)
    if name == "dmc_dc":
        module = video_dc.DMC(**kwargs)
        dpb = {"ref_frame": x, "ref_feature": None, "ref_mv_feature": None,
               "ref_y": None, "ref_mv_y": None}
        qs = {k: jnp.ones(()) for k in ("mv_enc", "mv_dec", "y_enc", "y_dec")}
        params = module.init(key, x, dpb, qs, 0)
        return module, params, DmcRuntime(module, params)
    if name == "dmc_hem":
        module = video_hem.DMCHem(**kwargs)
        dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
               "ref_mv_y": None}
        params = module.init(key, x, dpb, jnp.ones(()), jnp.ones(()))
        return module, params, HemVideoRuntime(module, params)
    if name == "canfvc_dmc":
        from . import video_canf

        module = video_canf.CANFVCDmc(**kwargs)
        dpb = {"ref_frame": x, "ref_feature": None, "ref_y": None,
               "ref_mv_y": None}
        params = module.init(key, x, dpb, jnp.ones(()), jnp.ones(()))
        return module, params, HemVideoRuntime(module, params)
    if name == "dmc_tcm":
        module = video_tcm.DMCTcm(**kwargs)
        params = module.init(key, x, x, None)
        return module, params, TcmVideoRuntime(module, params)
    if name == "dcvc_gen1":
        module = video_dcvc.DCVCNet(**kwargs)
        params = module.init(key, x, x)
        return module, params, DcvcGen1Runtime(module, params)
    raise KeyError(f"unknown model {name}")


MODEL_NAMES = [
    "evc_LL", "evc_LM", "evc_LS", "evc_ML", "evc_MM", "evc_MS", "evc_SL",
    "evc_SS", "evc_scalable",
    "intra_dc", "intra_hem",
    "bmshj2018-factorized", "bmshj2018-hyperprior", "mbt2018-mean", "mbt2018",
    "cheng2020-anchor",
    "dmc_dc", "dmc_hem", "dmc_tcm", "dcvc_gen1", "canfvc_dmc",
]

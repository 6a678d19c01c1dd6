"""Checkpoint save/load for flax param trees.

Native format: a flat .npz of path-joined arrays (fast, dependency-free,
works with jax.Array / numpy). Torch checkpoints from the reference are
ported via utils/torch_port.py converters plus per-model key maps.
Parity: flexible unwrapping semantics of get_state_dict
(DCVC-DC/src/utils/stream_helper.py:40-47) live in utils/stream.py.
"""

from __future__ import annotations

import os

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: dict) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **_flatten(jax.device_get(params)))


def load_params(path: str, like=None, model: str | None = None):
    """Load a param tree; if ``like`` given, validates structure.

    Accepts the native .npz format, or a reference torch checkpoint
    (.pth/.pt/.ckpt) when ``model`` names a known converter — so users of
    the reference can point the CLIs directly at published checkpoints."""
    if path.endswith((".pth", ".pt", ".ckpt", ".pth.tar")):
        import torch

        from . import port_dc, port_gen1, port_hem, port_tcm, port_zoo

        converters = {
            "intra_dc": port_dc.convert_intra_dc,
            "dmc_dc": port_dc.convert_dmc,
            "intra_hem": port_hem.convert_intra_hem,
            "dmc_hem": port_hem.convert_dmc_hem,
            "canfvc_dmc": port_hem.convert_canf_dmc,
            "dmc_tcm": port_tcm.convert_dmc_tcm,
            "dcvc_gen1": port_gen1.convert_dcvc_gen1,
            "bmshj2018-factorized":
                lambda sd: port_zoo.convert_zoo(sd, "factorized"),
            "bmshj2018-hyperprior":
                lambda sd: port_zoo.convert_zoo(sd, "scale"),
            "mbt2018-mean": lambda sd: port_zoo.convert_zoo(sd, "meanscale"),
            "mbt2018": lambda sd: port_zoo.convert_zoo(sd, "joint"),
            "cheng2020-anchor":
                lambda sd: port_zoo.convert_zoo(sd, "cheng2020"),
        }
        converters["evc_scalable"] = port_dc.convert_evc_scalable
        if model and model.startswith("evc") and model not in converters:
            converters[model] = port_dc.convert_evc
        if model not in converters:
            raise ValueError(
                f"torch checkpoint needs a known model converter, got "
                f"{model!r}; available: {sorted(converters)}")
        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        tree = converters[model](ckpt)
    else:
        with np.load(path) as data:
            tree = _unflatten({k: data[k] for k in data.files})
    if like is not None:
        ref = _flatten(like)
        got = _flatten(tree)
        missing = set(ref) - set(got)
        extra = set(got) - set(ref)
        if missing or extra:
            raise ValueError(
                f"checkpoint mismatch: missing={sorted(missing)[:5]} "
                f"extra={sorted(extra)[:5]}")
        for k in ref:
            if ref[k].shape != got[k].shape:
                raise ValueError(f"shape mismatch at {k}: "
                                 f"{ref[k].shape} vs {got[k].shape}")
    return tree

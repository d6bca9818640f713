"""Full-state training checkpoints (reference train.py:40-42,158-160 +
gaussian_model.capture/restore :75-107): params + Adam moments + densify stats
+ iteration, serialized with numpy savez (host-portable, no framework pin)."""

from __future__ import annotations

import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from ..models.densify import DensifyStats
from ..models.gaussians import GaussianParams
from ..models.optimizer import AdamState


def _flatten(prefix: str, p: GaussianParams, out: dict) -> None:
    for f in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
              "opacity", "alive", "seg_feature"):
        v = getattr(p, f)
        if v is not None:
            out[f"{prefix}{f}"] = np.asarray(v)


def _unflatten(prefix: str, z, sh_deg: int, max_sh: int) -> GaussianParams:
    get = lambda f: (jnp.asarray(z[f"{prefix}{f}"])
                     if f"{prefix}{f}" in z else None)
    return GaussianParams(
        xyz=get("xyz"), features_dc=get("features_dc"),
        features_rest=get("features_rest"), scaling=get("scaling"),
        rotation=get("rotation"), opacity=get("opacity"), alive=get("alive"),
        seg_feature=get("seg_feature"),
        active_sh_degree=sh_deg, max_sh_degree=max_sh)


def save_checkpoint(trainer, model_path: str, iteration: int) -> str:
    out = {"iteration": np.int64(iteration),
           "active_sh_degree": np.int64(trainer.params.active_sh_degree),
           "max_sh_degree": np.int64(trainer.params.max_sh_degree),
           "adam_count": np.asarray(trainer.opt_state.count),
           "xyz_gradient_accum": np.asarray(trainer.stats.xyz_gradient_accum),
           "denom": np.asarray(trainer.stats.denom),
           "max_radii2d": np.asarray(trainer.stats.max_radii2d)}
    _flatten("p.", trainer.params, out)
    _flatten("m.", trainer.opt_state.m, out)
    _flatten("v.", trainer.opt_state.v, out)
    os.makedirs(model_path, exist_ok=True)
    path = os.path.join(model_path, f"chkpnt{iteration}.npz")
    np.savez(path, **out)
    return path


def load_checkpoint(path: str) -> Tuple[GaussianParams, AdamState,
                                        DensifyStats, int]:
    z = np.load(path)
    sh = int(z["active_sh_degree"])
    max_sh = int(z["max_sh_degree"])
    params = _unflatten("p.", z, sh, max_sh)
    opt = AdamState(m=_unflatten("m.", z, sh, max_sh),
                    v=_unflatten("v.", z, sh, max_sh),
                    count=jnp.asarray(z["adam_count"]))
    stats = DensifyStats(jnp.asarray(z["xyz_gradient_accum"]),
                         jnp.asarray(z["denom"]),
                         jnp.asarray(z["max_radii2d"]))
    return params, opt, stats, int(z["iteration"])

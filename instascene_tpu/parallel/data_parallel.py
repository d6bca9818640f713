"""Multi-chip scaling: camera-batch data parallelism over a device mesh.

The reference is strictly single-GPU (SURVEY.md §2.3) — this module is the
TPU-native scaling layer it lacks. Design: gaussian parameters are replicated,
the per-step camera batch is sharded over the 'data' mesh axis (one camera per
chip), each chip renders + differentiates its own view, and gradients are
combined with a single jax.lax.pmean over ICI before a replicated Adam step.
This multiplies effective batch size (the reference trains batch=1 per step)
without touching the rasterizer.

For gaussian-axis sharding of the embarrassingly-parallel per-point stages
(KNN), see parallel/sharding.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..losses import photometric_loss
from ..models.densify import add_densification_stats
from ..models.optimizer import adam_step
from ..ops.rasterize import CameraMats, RasterizeConfig, densify_screen_grad
from ..pipelines.train import render_for_training

LR_ORDER = ("xyz", "features_dc", "features_rest", "opacity", "scaling",
            "rotation", "seg_feature")


def make_mesh(n_devices: int = 0) -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    if len(devs) < n:
        raise ValueError(
            f"make_mesh({n}): only {len(devs)} jax devices available on "
            f"platform {devs[0].platform!r}; for virtual CPU devices set "
            "JAX_PLATFORMS=cpu and jax_num_cpu_devices before backend init")
    return Mesh(np.array(devs[:n]), ("data",))


def lrs_vector(lrs: Dict[str, float]) -> jnp.ndarray:
    return jnp.asarray([lrs.get(k, 0.0) for k in LR_ORDER], jnp.float32)


def build_dp_train_step(cfg: RasterizeConfig, tanfovx: float, tanfovy: float,
                        depth_ratio: float, mesh: Mesh, lambda_dssim: float
                        = 0.2, lambda_normal: float = 0.05,
                        lambda_dist: float = 0.0):
    """Jitted DP train step over `mesh` ('data' axis).

    Call as fn(params, opt_state, stats, w2v[B,4,4], full_proj[B,4,4],
    campos[B,3], c2w_rot[B,3,3], gt_image[B,H,W,3], bg[3], lrs_vec[7])
    with B == mesh size. Returns (params, opt_state, stats, loss)."""
    from jax.experimental.shard_map import shard_map

    def per_device(params, opt_state, stats, w2v, full_proj, campos, c2w_rot,
                   gt_image, bg, lrs_vec):
        cam = CameraMats(w2v[0], full_proj[0], campos[0])
        t0 = jnp.zeros((params.capacity, 3, 3), jnp.float32)

        def loss_fn(p, t_offset):
            out, rend_normal, surf_normal, _alpha, _ = render_for_training(
                p, cam, bg, cfg, t_offset, c2w_rot[0], tanfovx, tanfovy,
                depth_ratio)
            photo, _ = photometric_loss(out.blend.color, gt_image[0],
                                        lambda_dssim)
            normal_err = jnp.mean(1.0 - jnp.sum(rend_normal * surf_normal,
                                                axis=-1))
            loss = (photo + lambda_normal * normal_err
                    + lambda_dist * jnp.mean(out.blend.distortion))
            return loss, out

        (loss, out), (grads, t_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True)(params, t0)
        # ICI collectives: one pmean over the camera batch
        grads = jax.tree.map(
            lambda g: (jax.lax.pmean(g, "data")
                       if jnp.issubdtype(g.dtype, jnp.floating) else g), grads)
        loss = jax.lax.pmean(loss, "data")
        t_grad = jax.lax.pmean(t_grad, "data")

        screen_grad = densify_screen_grad(t_grad, out.depth, cfg.width,
                                          cfg.height)
        visible_any = jax.lax.pmax(out.visible.astype(jnp.int32), "data") > 0
        radii_max = jax.lax.pmax(out.radii, "data")
        stats = add_densification_stats(stats, screen_grad, visible_any,
                                        radii_max)
        lrs = dict(zip(LR_ORDER, [lrs_vec[i] for i in range(len(LR_ORDER))]))
        params, opt_state = adam_step(params, grads, opt_state, lrs)
        return params, opt_state, stats, loss

    rep = P()
    bat = P("data")
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(rep, rep, rep, bat, bat, bat, bat, bat, rep, rep),
                   out_specs=(rep, rep, rep, rep),
                   check_rep=False)
    return jax.jit(fn)

def build_dp_semantic_step(cfg: RasterizeConfig, mesh: Mesh,
                           batch: int = 1024, max_labels: int = 64,
                           lam_sv: float = 1e-6, lam_3d: float = 2.5e-6):
    """Jitted DP semantic (contrastive) step over `mesh` ('data' axis).

    Each chip renders + samples its own camera view of the shared gaussian
    features; feature gradients are pmean'd over ICI before the replicated
    (seg_feature-only) Adam step — multiplying the per-step supervision by
    the mesh size vs the reference's single-view step.

    Call as fn(params, opt_state, key[B,2], w2v[B,4,4], full_proj[B,4,4],
    campos[B,3], segmap[B,H,W], seg3d_labels[N], bg[3], lr) with
    B == mesh size; returns (params, opt_state, loss)."""
    from jax.experimental.shard_map import shard_map

    from ..models.optimizer import TRAINABLE_FIELDS
    from ..pipelines.train_semantic import render_features
    from ..semantic.contrastive import contrastive_loss, sample_valid_pixels

    def per_device(params, opt_state, key, w2v, full_proj, campos, segmap,
                   seg3d_labels, bg, lr):
        cam = CameraMats(w2v[0], full_proj[0], campos[0])

        def loss_fn(feat):
            out = render_features(params, cam, bg, cfg, feat)
            featmap = out.blend.extra.reshape(-1, feat.shape[1])
            labels = segmap[0].reshape(-1)
            k1, k2 = jax.random.split(key[0])
            idx, any_valid = sample_valid_pixels(k1, labels > 0, batch)
            sv = contrastive_loss(featmap[idx], labels[idx], max_labels)
            fn_ = feat / (jnp.linalg.norm(feat, axis=1, keepdims=True) + 1e-6)
            v3 = out.visible & (seg3d_labels > 0)
            idx3, any3 = sample_valid_pixels(k2, v3, batch)
            l3 = contrastive_loss(fn_[idx3], seg3d_labels[idx3], max_labels)
            return (jnp.where(any_valid, sv, 0.0) * lam_sv
                    + jnp.where(any3, l3, 0.0) * lam_3d)

        loss, g = jax.value_and_grad(loss_fn)(params.seg_feature)
        g = jax.lax.pmean(g, "data")
        loss = jax.lax.pmean(loss, "data")
        lrs = {f: 0.0 for f in TRAINABLE_FIELDS} | {"seg_feature": lr}
        params, opt_state = adam_step(
            params, params.replace(seg_feature=g), opt_state, lrs,
            frozen_fields=("xyz", "features_dc", "features_rest", "scaling",
                           "rotation", "opacity"))
        return params, opt_state, loss

    rep = P()
    bat = P("data")
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(rep, rep, bat, bat, bat, bat, bat, rep, rep, rep),
                   out_specs=(rep, rep, rep),
                   check_rep=False)
    return jax.jit(fn)

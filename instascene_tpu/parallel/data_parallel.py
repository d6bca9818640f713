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

from ..models.densify import add_densification_stats
from ..models.optimizer import adam_step
from ..ops.rasterize import CameraMats, RasterizeConfig, densify_screen_grad

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
                        depth_ratio: float, mesh: Mesh,
                        has_normal_prior: bool = False):
    """Jitted DP geometry train step over `mesh` ('data' axis), full parity
    with pipelines.train.train_step: complete loss structure (photo + dist +
    normal consistency + optional mono-normal prior via geometry_loss_fn),
    per-step λ schedule values as traced args, densify stats, and the same
    metrics dict. One camera per chip; gradients/loss pmean over ICI,
    visibility/radii pmax, replicated Adam.

    Call as fn(params, opt_state, stats, w2v[B,4,4], full_proj[B,4,4],
    campos[B,3], c2w_rot[B,3,3], gt_image[B,H,W,3], normal_prior[B,H,W,3],
    normal_mask[B,H,W], bg[3], lrs_vec[7], lambda_dssim, lambda_dist,
    lambda_normal, lambda_normal_prior) with B == mesh size.
    Returns (params, opt_state, stats, metrics)."""
    from jax.experimental.shard_map import shard_map

    from ..pipelines.train import geometry_loss_fn

    def per_device(params, opt_state, stats, w2v, full_proj, campos, c2w_rot,
                   gt_image, normal_prior, normal_mask, bg, lrs_vec,
                   lambda_dssim, lambda_dist, lambda_normal,
                   lambda_normal_prior):
        cam = CameraMats(w2v[0], full_proj[0], campos[0])
        t0 = jnp.zeros((params.capacity, 3, 3), jnp.float32)

        def loss_fn(p, t_offset):
            return geometry_loss_fn(
                p, t_offset, cam, bg, cfg, c2w_rot[0], tanfovx, tanfovy,
                depth_ratio, gt_image[0],
                normal_prior[0] if has_normal_prior else normal_prior,
                normal_mask[0] if has_normal_prior else normal_mask,
                lambda_dssim, lambda_dist, lambda_normal,
                lambda_normal_prior, has_normal_prior)

        (loss, aux), (grads, t_grad) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True, allow_int=True)(params, t0)
        # ICI collectives: one pmean over the camera batch
        grads = jax.tree.map(
            lambda g: (jax.lax.pmean(g, "data")
                       if jnp.issubdtype(g.dtype, jnp.floating) else g), grads)
        loss = jax.lax.pmean(loss, "data")
        t_grad = jax.lax.pmean(t_grad, "data")

        screen_grad = densify_screen_grad(t_grad, aux["depth"], cfg.width,
                                          cfg.height)
        visible_any = jax.lax.pmax(aux["visible"].astype(jnp.int32),
                                   "data") > 0
        radii_max = jax.lax.pmax(aux["radii"], "data")
        stats = add_densification_stats(stats, screen_grad, visible_any,
                                        radii_max)
        lrs = dict(zip(LR_ORDER, [lrs_vec[i] for i in range(len(LR_ORDER))]))
        params, opt_state = adam_step(params, grads, opt_state, lrs)
        metrics = {"loss": loss,
                   "ll1": jax.lax.pmean(aux["ll1"], "data"),
                   "dist": jax.lax.pmean(aux["dist"], "data"),
                   "normal": jax.lax.pmean(aux["normal"], "data"),
                   "n_dropped": jax.lax.pmax(aux["n_dropped"], "data"),
                   "total_pairs": jax.lax.pmax(aux["total_pairs"], "data")}
        return params, opt_state, stats, metrics

    rep = P()
    bat = P("data")
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(rep, rep, rep, bat, bat, bat, bat, bat, bat, bat,
                             rep, rep, rep, rep, rep, rep),
                   out_specs=(rep, rep, rep, rep),
                   check_rep=False)
    return jax.jit(fn)

def build_dp_semantic_step(cfg: RasterizeConfig, mesh: Mesh,
                           batch: int = 1024, max_labels: int = 64,
                           lam_sv: float = 1e-6, lam_3d: float = 2.5e-6,
                           consider_negative: bool = False,
                           has_class_feat: bool = False,
                           has_sampler: bool = False,
                           has_cached_binning: bool = False,
                           cb_len: int = 6):
    """Jitted DP semantic (contrastive) step over `mesh` ('data' axis), full
    single-chip loss parity via train_semantic.single_view_and_3d_losses:
    single-view ProtoNCE on BOTH segmap types (raw 0.5 / sorted 1.0 weights,
    consider_negative, class_feat prototypes) + 3D ProtoNCE, per-camera
    cached binning and sampling prefix sums. The reference's every-10th-iter
    multi-view loss is intentionally not distributed: a B-camera DP step
    already mixes B views' gradients each step; the trainer can still run
    the single-chip multi-view step on those iterations.

    Call as fn(params, opt_state, key[B,2], w2v[B,4,4], full_proj[B,4,4],
    campos[B,3], segmap[B,H,W], sorted_segmap[B,H,W], seg3d_labels[N],
    class_feat[L,F], bg[3], lr, cached_binning (stacked bundle or None),
    seg_samp[B,HW+1], sorted_samp[B,HW+1], vis3d_samp[B,N+1] — per-camera
    valid-index sampler packs (contrastive.valid_ids_pack) — with B == mesh
    size;
    returns (params, opt_state, loss)."""
    from jax.experimental.shard_map import shard_map

    from ..pipelines.train_semantic import (_done0_from_idx,
                                            _draw_sv_pixel_idx,
                                            render_features,
                                            single_view_and_3d_losses)

    def per_device(params, opt_state, key, w2v, full_proj, campos, segmap,
                   sorted_segmap, seg3d_labels, class_feat, bg, lr,
                   cached_binning, seg_samp, sorted_samp, vis3d_samp):
        cam = CameraMats(w2v[0], full_proj[0], campos[0])
        cf = class_feat if has_class_feat else None
        cb = (tuple(a[0] for a in cached_binning)
              if has_cached_binning else None)
        # sampled-done fast path on visit-layout (len-10) caches: same
        # draw-before-render restructure as the single-chip step
        use_done = cb is not None and len(cb) == 10

        def loss_fn(feat):
            sv_draws = done0 = None
            if use_done:
                sv_draws, _ = _draw_sv_pixel_idx(
                    key[0], segmap[0], sorted_segmap[0], cf, batch,
                    consider_negative, has_sampler,
                    seg_samp[0] if has_sampler else None,
                    sorted_samp[0] if has_sampler else None)
                done0 = _done0_from_idx([d[0] for d in sv_draws],
                                        cfg.width, cfg.height, cfg.tile)
            out = render_features(params, cam, bg, cfg, feat, cb,
                                  done0=done0)
            return single_view_and_3d_losses(
                params, feat, out, key[0], segmap[0], sorted_segmap[0],
                seg3d_labels, cf, lam_sv, lam_3d, batch, max_labels,
                consider_negative, has_sampler,
                seg_samp[0] if has_sampler else None,
                sorted_samp[0] if has_sampler else None,
                vis3d_samp[0] if has_sampler else None, tile=cfg.tile,
                sv_draws=sv_draws)

        loss, g = jax.value_and_grad(loss_fn)(params.seg_feature)
        g = jax.lax.pmean(g, "data")
        loss = jax.lax.pmean(loss, "data")
        params, opt_state = adam_step(
            params, params.replace(seg_feature=g), opt_state,
            {"seg_feature": lr},
            frozen_fields=("xyz", "features_dc", "features_rest", "scaling",
                           "rotation", "opacity"))
        return params, opt_state, loss

    rep = P()
    bat = P("data")
    cb_spec = (tuple(P("data") for _ in range(cb_len)) if has_cached_binning
               else rep)
    fn = shard_map(per_device, mesh=mesh,
                   in_specs=(rep, rep, bat, bat, bat, bat, bat, bat, rep,
                             rep, rep, rep, cb_spec, bat, bat, bat),
                   out_specs=(rep, rep, rep),
                   check_rep=False)
    return jax.jit(fn)

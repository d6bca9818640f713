"""Adaptive density control under XLA static shapes.

Re-design of the reference's densify_and_prune (scene/gaussian_model.py:541-605):
instead of torch boolean indexing + optimizer param-group surgery, the gaussian
set lives in fixed-capacity arrays with an `alive` mask; clone/split/prune is
one jitted masked-scatter pass. New gaussians are written into dead slots
(rank-matched via cumsum), their Adam moments zeroed. If more new gaussians are
produced than dead slots exist, the overflow count is reported so the host can
double capacity (grow_capacity) and replay — matching the reference's unbounded
growth without dynamic shapes.

Semantics parity:
 * clone: grad-norm ≥ threshold and max scale ≤ percent_dense·extent (:569-584)
 * split: grad ≥ threshold and max scale > percent_dense·extent; 2 children
   sampled from N(0, scale) in the splat frame, scales /(0.8·2); parent pruned
   (:541-567)
 * prune: opacity < min_opacity, screen radius > max_screen, world scale >
   0.1·extent (:586-598); stats reset to zero afterwards (:520-539)
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.general import build_rotation
from .gaussians import GaussianParams
from .optimizer import AdamState, zero_state_rows


class DensifyStats(NamedTuple):
    xyz_gradient_accum: jnp.ndarray  # [C]
    denom: jnp.ndarray               # [C]
    max_radii2d: jnp.ndarray         # [C] f32


def init_stats(capacity: int) -> DensifyStats:
    z = jnp.zeros((capacity,), jnp.float32)
    return DensifyStats(z, z, z)


def add_densification_stats(stats: DensifyStats, screen_grad: jnp.ndarray,
                            visible: jnp.ndarray, radii: jnp.ndarray
                            ) -> DensifyStats:
    """screen_grad [C,2] NDC-space viewspace grads (train.py:139-142)."""
    gnorm = jnp.linalg.norm(screen_grad, axis=-1)
    vis = visible.astype(jnp.float32)
    return DensifyStats(
        xyz_gradient_accum=stats.xyz_gradient_accum + gnorm * vis,
        denom=stats.denom + vis,
        max_radii2d=jnp.where(visible,
                              jnp.maximum(stats.max_radii2d,
                                          radii.astype(jnp.float32)),
                              stats.max_radii2d))


@partial(jax.jit, static_argnames=("percent_dense", "use_screen_size"))
def densify_and_prune(params: GaussianParams, opt_state: AdamState,
                      stats: DensifyStats, rng_key,
                      max_grad: float, min_opacity: float, extent: float,
                      max_screen_size: float, percent_dense: float = 0.01,
                      use_screen_size: bool = True):
    """Returns (params, opt_state, stats, n_overflow)."""
    cap = params.capacity
    alive = params.alive
    grads = jnp.where(stats.denom > 0,
                      stats.xyz_gradient_accum / jnp.maximum(stats.denom, 1.0),
                      0.0)
    grads = jnp.nan_to_num(grads, 0.0)
    scale_act = jnp.exp(params.scaling)
    max_scale = jnp.max(scale_act, axis=1)

    clone_mask = alive & (grads >= max_grad) & (max_scale <= percent_dense * extent)
    split_mask = alive & (grads >= max_grad) & (max_scale > percent_dense * extent)

    # prune criteria, evaluated for originals and inherited by children
    opac = jax.nn.sigmoid(params.opacity[:, 0])
    prune_opac = opac < min_opacity
    if use_screen_size:
        prune_vs = stats.max_radii2d > max_screen_size
        prune_ws = max_scale > 0.1 * extent
        prune_old = prune_opac | prune_vs | prune_ws
    else:
        prune_old = prune_opac
    # split children have scale/1.6: re-evaluate their ws criterion
    child_scale_max = max_scale / (0.8 * 2)
    if use_screen_size:
        prune_child = prune_opac | (child_scale_max > 0.1 * extent)
    else:
        prune_child = prune_opac

    alive_after = alive & ~split_mask & ~prune_old

    # ---- build candidate children: [3C] = clones + splitA + splitB
    n_mask = jnp.concatenate([clone_mask & ~prune_old,
                              split_mask & ~prune_child,
                              split_mask & ~prune_child])
    src = jnp.tile(jnp.arange(cap, dtype=jnp.int32), 3)
    kind = jnp.repeat(jnp.arange(3, dtype=jnp.int32), cap)

    # split child positions: x + R @ N(0, (s_u, s_v, 0))
    eps = jax.random.normal(rng_key, (2, cap, 3), dtype=jnp.float32)
    stds = jnp.concatenate([scale_act, jnp.zeros((cap, 1))], axis=1)
    R = build_rotation(params.rotation)                      # [C,3,3]
    offs = jnp.einsum("cij,kcj->kci", R, eps * stds[None])   # [2,C,3]
    child_xyz = params.xyz[None] + offs                      # [2,C,3]
    child_scaling = jnp.log(scale_act / (0.8 * 2))

    # ---- rank-match candidates to dead slots
    cand_rank = jnp.cumsum(n_mask.astype(jnp.int32)) - 1     # [3C]
    dead = ~alive_after
    n_dead = jnp.sum(dead.astype(jnp.int32))
    dead_rank = jnp.cumsum(dead.astype(jnp.int32)) - 1       # [C]
    slot_of_rank = jnp.zeros((cap,), jnp.int32).at[
        jnp.where(dead, dead_rank, cap)].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop")
    place = n_mask & (cand_rank < n_dead)
    n_overflow = jnp.sum(n_mask.astype(jnp.int32)) - jnp.sum(place.astype(jnp.int32))
    target = jnp.where(place, slot_of_rank[jnp.minimum(cand_rank, cap - 1)], cap)

    def scatter_field(old, cand_values):
        """old [C,...]; cand_values [3C,...] → scatter at target (drop OOB)."""
        return old.at[target].set(cand_values, mode="drop")

    def gathered(field_arr, split_override=None):
        base = field_arr[src]                                # [3C,...]
        if split_override is not None:
            so = split_override  # [2,C,...] for kinds 1,2
            base = jnp.concatenate([field_arr, so[0], so[1]], axis=0)
        return base

    new_params = params.replace(
        xyz=scatter_field(params.xyz, gathered(params.xyz, child_xyz)),
        features_dc=scatter_field(params.features_dc, params.features_dc[src]),
        features_rest=scatter_field(params.features_rest,
                                    params.features_rest[src]),
        scaling=scatter_field(
            params.scaling,
            gathered(params.scaling,
                     jnp.stack([child_scaling, child_scaling]))),
        rotation=scatter_field(params.rotation, params.rotation[src]),
        opacity=scatter_field(params.opacity, params.opacity[src]),
        seg_feature=(scatter_field(params.seg_feature,
                                   params.seg_feature[src])
                     if params.seg_feature is not None else None),
        alive=alive_after.at[target].set(place, mode="drop"),
    )

    # new slots (and freed slots) get zeroed Adam moments
    touched = jnp.zeros((cap,), bool).at[target].set(place, mode="drop")
    freed = alive & ~alive_after
    new_opt = zero_state_rows(opt_state, touched | freed)

    new_stats = init_stats(cap)
    return new_params, new_opt, new_stats, n_overflow


def reset_opacity(params: GaussianParams, opt_state: AdamState):
    """opacity ← logit(min(σ(opacity), 0.01)); zero its Adam moments
    (gaussian_model.py:358-362)."""
    opac = jax.nn.sigmoid(params.opacity)
    new = jnp.log(jnp.minimum(opac, 0.01) / (1 - jnp.minimum(opac, 0.01)))
    params = params.replace(opacity=new)
    opt_state = zero_state_rows(opt_state, jnp.ones(params.capacity, bool),
                                fields=("opacity",))
    return params, opt_state


def grow_capacity(params: GaussianParams, opt_state: AdamState,
                  stats: DensifyStats, new_capacity: int):
    """Host-side capacity doubling: pad every row-array with dead slots."""
    cap = params.capacity
    extra = new_capacity - cap
    assert extra > 0

    def pad(a):
        if a is None or a.ndim == 0:
            return a
        return jnp.concatenate(
            [a, jnp.zeros((extra,) + a.shape[1:], a.dtype)], axis=0)

    def pad_params(p: GaussianParams) -> GaussianParams:
        return GaussianParams(
            xyz=pad(p.xyz), features_dc=pad(p.features_dc),
            features_rest=pad(p.features_rest), scaling=pad(p.scaling),
            rotation=pad(p.rotation), opacity=pad(p.opacity),
            alive=pad(p.alive),
            seg_feature=pad(p.seg_feature) if p.seg_feature is not None else None,
            active_sh_degree=p.active_sh_degree, max_sh_degree=p.max_sh_degree)

    new_params = pad_params(params)
    new_opt = AdamState(m=pad_params(opt_state.m), v=pad_params(opt_state.v),
                        count=opt_state.count)
    new_stats = DensifyStats(pad(stats.xyz_gradient_accum), pad(stats.denom),
                             pad(stats.max_radii2d))
    return new_params, new_opt, new_stats

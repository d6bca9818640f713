"""The single render() entry point used by all pipelines.

Parity: reference gaussian_renderer/__init__.py:20-169. Returns the same keys;
image-shaped outputs are channels-LAST ([H,W,C]) in this framework.

Differences from the reference, by design:
  * no mutable `screenspace_points` grad tap — densification gradients come
    from jax.grad w.r.t. the `t_offset` argument (see ops/rasterize.py)
  * `gau_related_pixels` is a deterministic per-pixel top-K contributor buffer
    (blend.contrib_ids/contrib_w) instead of an atomic append list
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .cameras import Camera
from .ops.depth_utils import camera_rays, depth_to_normal
from .ops.rasterize import CameraMats, RasterizeConfig, rasterize


def camera_mats(cam) -> CameraMats:
    return CameraMats(w2v=jnp.asarray(cam.w2v),
                      full_proj=jnp.asarray(cam.full_proj),
                      campos=jnp.asarray(cam.camera_center))


@lru_cache(maxsize=64)
def _cached_rays(width, height, tanfovx, tanfovy, c2w_rot_bytes):
    c2w_rot = np.frombuffer(c2w_rot_bytes, dtype=np.float32).reshape(3, 3)
    return jnp.asarray(camera_rays(width, height, tanfovx, tanfovy, c2w_rot))


_PAIR_CAP_HIWATER: dict = {}  # (w, h, n, tile) -> sticky grown pair_cap
# (w, h, n, tile) -> (n_dropped device array, pair_cap it was measured at):
# the previous frame's overflow check, resolved one frame later so interactive
# rendering never blocks on a host sync (drop_check="async")
_PENDING_DROP: dict = {}
# Both dicts are keyed by (w, h, n, tile); a long GUI session that densifies
# or crops walks through many n values, so bound them LRU-style — a stale
# _PENDING_DROP entry pins a device array, a stale hiwater entry is just an
# int but still unbounded growth.
_STATE_CAP = 16


def _evict_lru(d: dict, cap: int = _STATE_CAP) -> None:
    while len(d) > cap:  # python dicts are insertion-ordered: pop the oldest
        d.pop(next(iter(d)))


def reset_render_state() -> None:
    """Drop the sticky pair-cap high-water marks and any pending async
    overflow checks (e.g. after a scene swap in a long-lived viewer)."""
    _PAIR_CAP_HIWATER.clear()
    _PENDING_DROP.clear()


def render(viewpoint_camera: Camera, gaussians, pipe, bg_color,
           scaling_modifier: float = 1.0, override_color=None,
           norm_seg_feat: bool = True, track_contrib: bool = False,
           t_offset=None, cfg: Optional[RasterizeConfig] = None,
           grow_on_drop: bool = True, drop_check: str = "sync",
           viewer: bool = False) -> dict:
    """Render a view of `gaussians` (a GaussianParams pytree or GaussianModel).

    Returns dict with reference keys: render, radii, visibility_filter,
    seg_feature, rend_alpha, rend_normal, rend_dist, surf_depth, surf_normal,
    rend_depth, rend_median_depth, plus final_T, n_contrib, n_dropped and
    (when track_contrib) contrib_ids/contrib_w.

    drop_check: "sync" fetches n_dropped after each attempt and retries with
    grown caps until drop-free (training default); "async" checks the
    PREVIOUS same-shape render's count instead — one frame of possible pair
    drops after a cap overflow, zero host syncs per frame (viewer path).

    viewer=True (interactive GUI path, pallas impl only): forward-only fast
    kernel — ONLY `render`, `rend_alpha` and `seg_feature` are meaningful;
    depth/normal/median/distortion outputs are zeros and gradients do not
    flow."""
    p = gaussians.params if hasattr(gaussians, "params") else gaussians
    n = p.xyz.shape[0]
    if viewer and track_contrib:
        # contributor tracking needs the full path; never silently drop it
        viewer = False

    width = int(viewpoint_camera.width)
    height = int(viewpoint_camera.height)
    auto_caps = cfg is None or cfg.pair_cap == 0
    if cfg is None:
        cfg = RasterizeConfig(width=width, height=height,
                              track_contrib=track_contrib,
                              fwd_viewer=viewer)
    else:
        import dataclasses
        cfg = dataclasses.replace(cfg, width=width, height=height,
                                  track_contrib=(track_contrib
                                                 or cfg.track_contrib),
                                  fwd_viewer=viewer or cfg.fwd_viewer)
    # auto caps are a heuristic; at high resolutions the true pair count can
    # exceed them (the CUDA reference allocates the exact total dynamically).
    # When the caller didn't pin pair_cap, grow to a sticky high-water cap on
    # overflow so no pairs are silently dropped.
    hw_key = (width, height, n, cfg.tile)
    if auto_caps and grow_on_drop and drop_check == "async":
        # resolve the previous same-shape frame's overflow count; by the next
        # frame the device value is long ready, so this fetch doesn't stall
        pend = _PENDING_DROP.pop(hw_key, None)
        if pend is not None:
            dropped, cap_then = pend
            if int(dropped) > 0:
                _PAIR_CAP_HIWATER[hw_key] = max(
                    2 * cap_then, _PAIR_CAP_HIWATER.get(hw_key, 0))
                _evict_lru(_PAIR_CAP_HIWATER)
    if auto_caps and grow_on_drop and hw_key in _PAIR_CAP_HIWATER:
        import dataclasses
        # re-insert: marks this shape most-recently-used for LRU eviction
        _PAIR_CAP_HIWATER[hw_key] = _PAIR_CAP_HIWATER.pop(hw_key)
        cfg = dataclasses.replace(cfg, pair_cap=_PAIR_CAP_HIWATER[hw_key],
                                  tile_cap=0)

    cam = camera_mats(viewpoint_camera)
    bg = jnp.asarray(bg_color, dtype=jnp.float32)

    seg_feature = p.seg_feature_normed() if hasattr(p, "seg_feature_normed") \
        else None
    if seg_feature is not None and not norm_seg_feat:
        seg_feature = p.seg_feature

    colors = None
    shs = None
    sh_degree = 0
    if override_color is None:
        shs = p.features()
        sh_degree = int(p.active_sh_degree)
    else:
        colors = override_color

    for attempt in range(4):
        out = rasterize(p.xyz, p.scaling_activated() * scaling_modifier,
                        p.rotation_normalized(),
                        p.opacity_activated()[:, 0],
                        cam, bg, cfg, colors=colors, shs=shs,
                        sh_degree=sh_degree, extras=seg_feature,
                        t_offset=t_offset, alive=getattr(p, "alive", None))
        if not (auto_caps and grow_on_drop) or attempt == 3:
            break
        if drop_check == "async":
            # defer the host sync: the count is inspected before the NEXT
            # same-shape render instead of stalling this one
            _PENDING_DROP[hw_key] = (out.n_dropped, cfg.resolved(n).pair_cap)
            _evict_lru(_PENDING_DROP)
            break
        if int(out.n_dropped) == 0:
            break
        import dataclasses
        r = cfg.resolved(n)
        # double both caps: n_dropped counts pair overflow (aligned) and
        # per-tile tile_cap clipping (padded)
        grown = 2 * r.pair_cap
        _PAIR_CAP_HIWATER[hw_key] = grown
        _evict_lru(_PAIR_CAP_HIWATER)
        cfg = dataclasses.replace(cfg, pair_cap=grown,
                                  tile_cap=2 * r.tile_cap)
    b = out.blend

    if cfg.fwd_viewer:
        # viewer fast path: only color/alpha/features are meaningful — skip
        # the normal rotation and depth-to-normal postprocessing entirely
        rend_alpha = b.alpha[..., None]
        z = jnp.zeros_like(rend_alpha)
        return {
            "render": b.color,
            "radii": out.radii,
            "visibility_filter": out.visible,
            "seg_feature": b.extra if seg_feature is not None else None,
            "gau_related_pixels": None,
            "rend_alpha": rend_alpha,
            "rend_normal": jnp.concatenate([z, z, z], axis=-1),
            "rend_dist": z, "surf_depth": z,
            "surf_normal": jnp.concatenate([z, z, z], axis=-1),
            "rend_depth": z, "rend_median_depth": z,
            "final_T": b.final_T, "n_contrib": b.n_contrib,
            "n_dropped": out.n_dropped,
            "gaussian_depth": out.depth, "T": out.T,
        }

    # world-frame normal map: n_world = R_view^T n_view
    rend_normal = jnp.einsum("hwk,kj->hwj", b.normal, cam.w2v[:3, :3])

    rend_alpha = b.alpha[..., None]
    # expected depth = D / alpha with nan/inf→0 (gaussian_renderer:139-141),
    # expressed grad-safely
    alpha_ok = rend_alpha > 0
    render_depth_expected = jnp.where(
        alpha_ok, b.depth[..., None] / jnp.where(alpha_ok, rend_alpha, 1.0), 0.0)
    render_depth_median = jnp.nan_to_num(b.median_depth[..., None], 0, 0)
    depth_ratio = getattr(pipe, "depth_ratio", 1.0)
    surf_depth = (render_depth_expected * (1 - depth_ratio)
                  + depth_ratio * render_depth_median)

    c2w_rot = np.ascontiguousarray(
        viewpoint_camera.c2w[:3, :3].astype(np.float32))
    rays = _cached_rays(width, height, float(viewpoint_camera.tanfovx),
                        float(viewpoint_camera.tanfovy), c2w_rot.tobytes())
    surf_normal = depth_to_normal(surf_depth[..., 0], rays, cam.campos)
    surf_normal = surf_normal * jax.lax.stop_gradient(rend_alpha)

    return {
        "render": b.color,
        "radii": out.radii,
        "visibility_filter": out.visible,
        "seg_feature": b.extra if seg_feature is not None else None,
        "gau_related_pixels": (b.contrib_ids, b.contrib_w)
        if cfg.track_contrib else None,
        "rend_alpha": rend_alpha,
        "rend_normal": rend_normal,
        "rend_dist": b.distortion[..., None],
        "surf_depth": surf_depth,
        "surf_normal": surf_normal,
        "rend_depth": render_depth_expected,
        "rend_median_depth": render_depth_median,
        "final_T": b.final_T,
        "n_contrib": b.n_contrib,
        "n_dropped": out.n_dropped,
        "gaussian_depth": out.depth,
        "T": out.T,
    }

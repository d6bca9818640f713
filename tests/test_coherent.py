"""Cached-superset rendering via the kernels' clip_rect gate.

Exactness contract: a tile-dilated binning bundle built at camera A
(compute_binning_cache(dilate_tiles=d)) renders ANY nearby camera B whose
fresh per-gaussian tile rects stay inside A's dilated rects, through
rasterize(cfg.clip_rect=True, cached_binning=bundle), equal to a fresh
per-frame binning at B up to f32 addition grouping: the in-kernel rect gate
zeroes every cached pair fresh binning would not emit, but the gated zero
slots shift the blend scans' chunk boundaries (last-bit diffs), and the
within-tile pair order is A's depth order, so the scene below separates
depths by >> one sort quantum.

This is the kernel machinery the round-2/3 frame-coherent GUI cache was
built on. The GUI product wrapper (render.CoherentViewerBinning) was FOLDED
in round 4 — the arithmetic cannot win at any measured profile (binning is
~25% of a frame while any dilation inflates the pair-scaling ~75% by
>= ~1.36x; docs/PERFORMANCE.md round 4) and the GUI host-caches static
frames, so no winning workload exists. The kernel mode + this test stay:
they serve any future cached-superset caller (e.g. slab-local reuse).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instascene_tpu.models.gaussians import GaussianParams
from instascene_tpu.ops.binning import dilate_rects
from instascene_tpu.ops.preprocess import preprocess_gaussians
from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                          compute_binning_cache, rasterize)
from instascene_tpu.utils.general import inverse_sigmoid
from instascene_tpu.viewer.gui import OrbitCamera


def _depth_separated_params(n=200, seed=0, seg_dim=16):
    """Gaussians with strictly separated view depths (z spread across [2, 6]
    in even steps — thousands of depth-sort quanta apart) so small camera
    motion cannot permute the within-tile blend order. Rotations and
    opacities are unconstrained: the clip_rect kernel gate makes the cached
    superset exact regardless."""
    rng = np.random.default_rng(seed)
    z = np.linspace(2.0, 6.0, n)
    xy = rng.uniform(-1.2, 1.2, (n, 2))
    xyz = np.concatenate([xy, z[:, None]], axis=1).astype(np.float32)
    feats = rng.normal(size=(n, seg_dim)).astype(np.float32)
    return GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(rng.uniform(0, 1, (n, 1, 3)).astype(np.float32)),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 2), -2.0),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.8))),
        seg_feature=jnp.asarray(feats),
        alive=jnp.ones(n, bool),
        active_sh_degree=0, max_sh_degree=3)


def _rasterize_at(params, cam, cfg, bundle=None):
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    return rasterize(params.xyz, params.scaling_activated(),
                     params.rotation_normalized(),
                     params.opacity_activated()[:, 0], cm, jnp.zeros(3),
                     cfg, shs=params.features(), sh_degree=0,
                     extras=params.seg_feature_normed(),
                     alive=params.alive, cached_binning=bundle)


def _contained(params, cam, width, height, dmin, dmax, need0):
    """The envelope guard the folded GUI wrapper computed in-program: every
    gaussian producing pairs at `cam` produced pairs at the cache camera and
    its fresh rect lies inside the cached dilated rect."""
    pre = preprocess_gaussians(
        params.xyz, params.scaling_activated(), params.rotation_normalized(),
        jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
        jnp.asarray(cam.camera_center), width, height,
        color=params.xyz * 0.0, alive=params.alive,
        opacity=params.opacity_activated())
    need = np.asarray(pre.tiles_touched) > 0
    ok = (np.asarray(need0)
          & np.all(np.asarray(pre.rect_min) >= np.asarray(dmin), axis=-1)
          & np.all(np.asarray(pre.rect_max) <= np.asarray(dmax), axis=-1))
    return bool(np.all(~need | ok))


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_clip_rect_cached_superset_exact():
    W, H = 256, 192       # 16x12 tile grid: ±1-tile dilation is a real
    params = _depth_separated_params()  # envelope, not the whole screen
    cfg_fresh = RasterizeConfig(width=W, height=H, impl="pallas")
    cfg_cached = RasterizeConfig(width=W, height=H, impl="pallas",
                                 clip_rect=True)
    orbit = OrbitCamera(W, H, r=4.0)
    cam0 = orbit.minicam()
    cm0 = CameraMats(jnp.asarray(cam0.w2v), jnp.asarray(cam0.full_proj),
                     jnp.asarray(cam0.camera_center))
    bundle, _, nd = compute_binning_cache(params, cm0, W, H, impl="pallas",
                                          dilate_tiles=1)
    assert int(nd) == 0
    pre0 = preprocess_gaussians(
        params.xyz, params.scaling_activated(), params.rotation_normalized(),
        cm0.w2v, cm0.full_proj, cm0.campos, W, H, color=params.xyz * 0.0,
        alive=params.alive, opacity=params.opacity_activated())
    gx, gy = (W + 15) // 16, (H + 15) // 16
    dmin, dmax, _ = dilate_rects(pre0.rect_min, pre0.rect_max,
                                 pre0.tiles_touched, gx, gy, 1)
    need0 = np.asarray(pre0.tiles_touched) > 0

    reused = 0
    for dx, dy in [(0, 0), (2, 1), (-1, 2), (1, -2)]:
        if dx or dy:
            orbit.orbit(dx, dy)
        cam = orbit.minicam()
        if not _contained(params, cam, W, H, dmin, dmax, need0):
            continue          # outside the envelope — a caller would rebuild
        reused += 1
        out_c = _rasterize_at(params, cam, cfg_cached, bundle=bundle)
        out_f = _rasterize_at(params, cam, cfg_fresh)
        for k in ("color", "alpha", "extra", "depth", "normal"):
            np.testing.assert_allclose(
                np.asarray(getattr(out_c.blend, k)),
                np.asarray(getattr(out_f.blend, k)),
                rtol=2e-6, atol=2e-6, err_msg=k)
    assert reused >= 2, "orbit moves this small must stay in the envelope"

    # past the envelope the guard must detect it (a zoom grows every
    # footprint) — the caller's cue to rebuild
    for _ in range(12):
        orbit.scale(1)
    assert not _contained(params, orbit.minicam(), W, H, dmin, dmax, need0)

"""Frame-coherent viewer binning (render.CoherentViewerBinning).

Exactness contract: while every gaussian's fresh tile rect stays inside the
cached dilated rect, rendering from the cached pair list equals a fresh
per-frame binning up to f32 addition grouping (the kernels' clip_rect gate
zeroes every pair fresh binning would not emit, but the gated zero slots
shift the blend scans' chunk boundaries — last-bit diffs), provided the
depth order is stable under the motion (the scene below separates depths by
>> one sort quantum).
"""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instascene_tpu.config import PipelineParams
from instascene_tpu.models.gaussians import GaussianParams
from instascene_tpu.ops.rasterize import RasterizeConfig
from instascene_tpu.render import CoherentViewerBinning, render
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


def _assert_frames_equal(pkg_a, pkg_b, keys=("render", "rend_alpha",
                                             "seg_feature")):
    # same contribution set, but the dilated layout interleaves gated
    # (exact-zero) pairs, shifting the chunk boundaries of the blend's
    # prefix scans — f32 addition groupings differ at the last bit
    for k in keys:
        np.testing.assert_allclose(np.asarray(pkg_a[k]),
                                   np.asarray(pkg_b[k]),
                                   rtol=2e-6, atol=2e-6, err_msg=k)


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_coherent_viewer_binning_exact_and_invalidates():
    # 16x12 tile grid: the ±1-tile dilation is a real envelope (at tiny
    # grids the clamped dilation covers the whole screen and the cache
    # legitimately never needs a rebuild)
    W, H = 256, 192
    params = _depth_separated_params()
    pipe = PipelineParams()
    bg = np.zeros(3, np.float32)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas")
    coh = CoherentViewerBinning(dilate_tiles=1)
    orbit = OrbitCamera(W, H, r=4.0)

    # frame 0 builds; small orbital moves reuse; every frame must equal a
    # fresh per-frame binning exactly
    moves = [(0, 0), (2, 1), (-1, 2), (1, -2)]
    for dx, dy in moves:
        if dx or dy:
            orbit.orbit(dx, dy)
        cam = orbit.minicam()
        pkg_c = render(cam, params, pipe, bg, viewer=True, cfg=cfg,
                       coherent=coh)
        pkg_f = render(cam, params, pipe, bg, viewer=True, cfg=cfg)
        _assert_frames_equal(pkg_c, pkg_f)
    assert coh.n_builds >= 1
    assert coh.n_reuses >= 1, "small orbital motion should reuse the cache"

    # a big zoom-in grows every footprint past the dilation envelope ->
    # rebuild, still exact (zooming moves the camera along the view axis,
    # shifting every depth equally — the blend order is preserved, unlike a
    # large rotation, whose stale-order deviation the class docstring
    # documents)
    builds_before = coh.n_builds
    for _ in range(12):
        orbit.scale(1)
    cam = orbit.minicam()
    pkg_c = render(cam, params, pipe, bg, viewer=True, cfg=cfg, coherent=coh)
    pkg_f = render(cam, params, pipe, bg, viewer=True, cfg=cfg)
    _assert_frames_equal(pkg_c, pkg_f)
    assert coh.n_builds > builds_before, "zoom past the envelope must rebuild"


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_coherent_full_kernel_mode_and_param_change():
    """The cache also serves the full kernel (GUI aux modes: depth/normal),
    and a gaussian-set edit (crop/delete) rebuilds via array identity."""
    params = _depth_separated_params(n=120, seed=3)
    pipe = PipelineParams()
    bg = np.zeros(3, np.float32)
    cfg = RasterizeConfig(width=48, height=32, impl="pallas")
    coh = CoherentViewerBinning(dilate_tiles=2)
    orbit = OrbitCamera(48, 32, r=4.0)
    cam = orbit.minicam()

    pkg_c = render(cam, params, pipe, bg, viewer=False, cfg=cfg, coherent=coh)
    pkg_f = render(cam, params, pipe, bg, viewer=False, cfg=cfg)
    _assert_frames_equal(pkg_c, pkg_f,
                         keys=("render", "rend_alpha", "seg_feature",
                               "surf_depth", "rend_normal"))

    # simulate a delete: params arrays change identity -> rebuild
    builds_before = coh.n_builds
    alive = np.asarray(params.alive).copy()
    alive[::3] = False
    params2 = params.replace(alive=jnp.asarray(alive))
    pkg_c2 = render(cam, params2, pipe, bg, viewer=True, cfg=cfg,
                    coherent=coh)
    pkg_f2 = render(cam, params2, pipe, bg, viewer=True, cfg=cfg)
    _assert_frames_equal(pkg_c2, pkg_f2)
    assert coh.n_builds > builds_before, "param change must rebuild"

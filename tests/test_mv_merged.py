"""Merged virtual-image multi-view loss == per-view multi-view loss.

The round-5 `_mv_full_loss_merged` concatenates the MV window's views along
the tile axis and blends them in one (or few) extras-only kernel launches;
per-view math must be bit-exact vs the separate-renders `_mv_full_loss`
(reference train_semantic.py:145-172), because the packed rows, visit masks
and blend order are identical — only launch structure changes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instascene_tpu.data.synthetic import look_at

W, H = 64, 48
E = 8
N_MV = 3


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _setup(rng, n=90):
    from instascene_tpu.cameras import Camera
    from instascene_tpu.models.gaussians import GaussianParams
    from instascene_tpu.ops.rasterize import (CameraMats,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors
    from instascene_tpu.pipelines.train_semantic import SemanticMVBlock
    from instascene_tpu.utils.general import inverse_sigmoid

    params = GaussianParams(
        xyz=jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)
                                           ).astype(np.float32)),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.asarray(rng.normal(-2.0, 0.3, (n, 2)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.asarray(
            inverse_sigmoid(rng.uniform(0.3, 0.9, (n, 1))).astype(np.float32)),
        alive=jnp.ones(n, bool),
        seg_feature=jnp.asarray(rng.random((n, E)).astype(np.float32)))

    cams = []
    for i in range(N_MV):
        ang = 2 * np.pi * i / 8
        pos = np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 1.0])
        R_w2c, t = look_at(pos, np.zeros(3))
        cams.append(camera_tensors(Camera(
            uid=i, colmap_id=i, R=R_w2c.T, T=t, fovx=0.9, fovy=0.7,
            image_name=str(i), width=W, height=H)))

    cache = []
    for ct in cams:
        cb, tc, nd = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos), W, H,
            pair_cap=4096, tile_cap=256, impl="pallas", extras_dim=E)
        assert int(nd) == 0
        cache.append(cb)

    segmaps = jnp.asarray(rng.integers(0, 6, (N_MV, H, W)).astype(np.int32))
    mv = SemanticMVBlock(
        w2v=jnp.stack([c.w2v for c in cams]),
        full_proj=jnp.stack([c.full_proj for c in cams]),
        campos=jnp.stack([c.campos for c in cams]),
        segmaps=segmaps,
        binning=jax.tree.map(lambda *xs: jnp.stack(xs), *cache))
    return params, mv


@pytest.mark.parametrize("group_max", [0, 1, 2])
def test_mv_merged_matches_per_view(rng, group_max):
    """Loss value AND seg-feature gradient of the merged virtual-image MV
    path match the separate-renders path to f32 exactness, for a single
    merged launch (group_max=0 -> all views) and for grouped launches."""
    from instascene_tpu.ops.rasterize import RasterizeConfig
    from instascene_tpu.pipelines.train_semantic import (_mv_full_loss,
                                                         _mv_full_loss_merged)

    params, mv = _setup(rng)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas",
                          bwd_extras_only=True, extras_dim=E)
    key = jax.random.PRNGKey(3)
    batch = 512
    max_labels = 8
    bg = jnp.zeros(3)

    def sep(feat):
        return _mv_full_loss(params, feat, mv, key, None, bg, batch,
                             max_labels, cfg)

    def merged(feat):
        return _mv_full_loss_merged(params, feat, mv, key, None, batch,
                                    max_labels, cfg, group_max=group_max)

    l_s, g_s = jax.jit(jax.value_and_grad(sep))(params.seg_feature)
    l_m, g_m = jax.jit(jax.value_and_grad(merged))(params.seg_feature)
    assert np.isfinite(float(l_s))
    assert abs(float(l_s) - float(l_m)) <= 1e-6 * max(1.0, abs(float(l_s)))
    np.testing.assert_allclose(np.asarray(g_m), np.asarray(g_s),
                               rtol=1e-5, atol=1e-7)


def test_semantic_step_uses_merged_path(rng):
    """semantic_train_step with mv_merged=True and a VisitBinningCache MV
    block routes through the merged path and stays finite/trainable
    end-to-end (the default routes through the per-view path)."""
    from instascene_tpu.models.optimizer import init_adam_state
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.optimizer import semantic_lrs
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train_semantic import (
        SemanticCamera, SemanticHypers, SemanticStepConfig,
        semantic_train_step)

    params, mv = _setup(rng)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas",
                          bwd_extras_only=True, extras_dim=E)
    cb, _, nd = compute_binning_cache(
        params, CameraMats(mv.w2v[0], mv.full_proj[0], mv.campos[0]), W, H,
        pair_cap=4096, tile_cap=256, impl="pallas", extras_dim=E)
    assert int(nd) == 0
    cam = SemanticCamera(w2v=mv.w2v[0], full_proj=mv.full_proj[0],
                         campos=mv.campos[0], segmap=mv.segmaps[0],
                         sorted_segmap=mv.segmaps[0], binning=cb)
    opt = OptimizationParams()
    hyp = SemanticHypers(bg=jnp.zeros(3), lrs=semantic_lrs(opt),
                         lam_sv=jnp.float32(1e-3), lam_mv=jnp.float32(1e-3),
                         lam_3d=jnp.float32(1e-3),
                         seg3d_labels=jnp.ones(params.capacity, jnp.int32))
    scfg = SemanticStepConfig(raster=cfg, batch=256, max_labels=8,
                              mv_merged=True)
    p2, opt_state, loss, _ = semantic_train_step(
        params, init_adam_state(params), jax.random.PRNGKey(0), cam, mv,
        hyp, scfg)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(p2.seg_feature),
                           np.asarray(params.seg_feature))

"""Sparse-pixel extras blend == full extras render at the sampled pixels.

ops/blend_sparse.py blends only a drawn pixel subset with a transposed
(pixel-sublane x slot-lane) layout; per-pixel semantics must match the full
visit kernel — same masks, same blend order, same early-termination cut —
to f32 summation-order tolerance (the feature contraction's MXU shape
differs, so exact bit equality is not guaranteed). Grads flow through the
same chain-reduce as the visits path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_mv_merged import _setup, E, H, W

from instascene_tpu.ops.rasterize import CameraMats, RasterizeConfig


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def _featn(params):
    f = params.seg_feature
    return f / (jnp.linalg.norm(f, axis=1, keepdims=True) + 1e-6)


def test_spix_from_idx_packs_all_samples(rng):
    from instascene_tpu.ops.blend_sparse import pick_sparse_s, spix_from_idx
    idx = jnp.asarray(rng.integers(0, H * W, 150).astype(np.int32))
    grid_x = (W + 15) // 16
    S = pick_sparse_s(150, grid_x * ((H + 15) // 16))
    spix, t_of, slot_of, overflow = spix_from_idx(idx, W, H, 16, S)
    assert not bool(overflow)
    sp = np.asarray(spix)[:, 0, :]
    t_np, s_np = np.asarray(t_of), np.asarray(slot_of)
    y, x = np.asarray(idx) // W, np.asarray(idx) % W
    grid_x = (W + 15) // 16
    assert np.array_equal(t_np, (y // 16) * grid_x + (x // 16))
    p2 = (y % 16) * 16 + (x % 16)
    # every sample's slot holds its own pixel
    assert np.array_equal(sp[t_np, s_np], p2)


def test_sparse_matches_dense_values_and_grads(rng):
    from instascene_tpu.pipelines.train_semantic import (_sparse_view_feats,
                                                         render_features)
    from instascene_tpu.ops.blend_sparse import pick_sparse_s, spix_from_idx

    params, mv = _setup(rng)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas",
                          bwd_extras_only=True, extras_dim=E)
    cam = CameraMats(mv.w2v[0], mv.full_proj[0], mv.campos[0])
    cb = jax.tree.map(lambda a: a[0], mv.binning)
    B = 400
    idx = jnp.asarray(rng.integers(0, H * W, B).astype(np.int32))
    grid_x = (W + 15) // 16
    T = grid_x * ((H + 15) // 16)
    S = pick_sparse_s(B, T)
    spix, t_of, slot_of, overflow = spix_from_idx(idx, W, H, 16, S)
    assert not bool(overflow)
    tgt = jnp.asarray(rng.random((B, E)).astype(np.float32))

    def dense_loss(feat):
        out = render_features(params, cam, jnp.zeros(3), cfg, feat,
                              cb).blend
        y, x = idx // W, idx % W
        t = (y // 16) * grid_x + (x // 16)
        p2 = (y % 16) * 16 + (x % 16)
        f = out.extra_tiles[t, :, p2]
        return jnp.sum((f - tgt) ** 2)

    def sparse_loss(feat):
        featn = feat / (jnp.linalg.norm(feat, axis=1, keepdims=True) + 1e-6)
        fo, _vis = _sparse_view_feats(params, featn, mv.w2v[0],
                                      mv.full_proj[0], mv.campos[0], cb,
                                      cfg, spix, S)
        f = fo[t_of, slot_of, :]
        return jnp.sum((f - tgt) ** 2)

    l_d, g_d = jax.jit(jax.value_and_grad(dense_loss))(params.seg_feature)
    l_s, g_s = jax.jit(jax.value_and_grad(sparse_loss))(params.seg_feature)
    assert np.isfinite(float(l_d)) and float(l_d) > 0
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-3, atol=1e-5)


def test_mv_sparse_loss_matches_dense(rng):
    from instascene_tpu.ops.blend_sparse import pick_sparse_s, spix_from_idx
    from instascene_tpu.pipelines.train_semantic import (_mv_full_loss,
                                                         _mv_full_loss_sparse)
    from instascene_tpu.semantic.contrastive import sample_valid_pixels

    params, mv = _setup(rng)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas",
                          bwd_extras_only=True, extras_dim=E)
    key = jax.random.PRNGKey(5)
    batch, max_labels = 256, 8
    n_mv = mv.w2v.shape[0]
    draw = sample_valid_pixels(key, mv.segmaps.reshape(-1) > 0, batch)
    grid_x = (W + 15) // 16
    T = grid_x * ((H + 15) // 16)
    HW = H * W
    view_of = draw[0] // HW
    pix = draw[0] % HW
    S = pick_sparse_s(batch, n_mv * T)
    spix_l, tl, sl = [], None, None
    for v in range(n_mv):
        sp_v, t_v, s_v, ov = spix_from_idx(pix, W, H, 16, S,
                                           valid=view_of == v)
        assert not bool(ov)
        spix_l.append(sp_v)
        tl = t_v if tl is None else jnp.where(view_of == v, t_v, tl)
        sl = s_v if sl is None else jnp.where(view_of == v, s_v, sl)

    def dense(feat):
        return _mv_full_loss(params, feat, mv, key, None, jnp.zeros(3),
                             batch, max_labels, cfg, draw=draw)

    def sparse(feat):
        featn = feat / (jnp.linalg.norm(feat, axis=1, keepdims=True) + 1e-6)
        return _mv_full_loss_sparse(params, feat, featn, mv, draw, None,
                                    batch, max_labels, cfg, spix_l, tl, sl,
                                    S)

    l_d, g_d = jax.jit(jax.value_and_grad(dense))(params.seg_feature)
    l_s, g_s = jax.jit(jax.value_and_grad(sparse))(params.seg_feature)
    assert np.isfinite(float(l_d))
    np.testing.assert_allclose(float(l_s), float(l_d), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_d),
                               rtol=1e-3, atol=1e-5)


def test_semantic_step_sparse_path_trains(rng):
    """semantic_train_step routes visit caches through the sparse branch
    (overflow never at these sizes) and stays finite/trainable."""
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.optimizer import (init_adam_state,
                                                 semantic_lrs)
    from instascene_tpu.ops.rasterize import compute_binning_cache
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
                              sparse_px=True)
    p2, opt_state, loss, _ = semantic_train_step(
        params, init_adam_state(params), jax.random.PRNGKey(0), cam, mv,
        hyp, scfg)
    assert np.isfinite(float(loss))
    assert not np.allclose(np.asarray(p2.seg_feature),
                           np.asarray(params.seg_feature))

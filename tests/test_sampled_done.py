"""Sampled-pixel done masks are bit-exact for the sampled values/grads.

The semantic losses read the rendered feature maps only at sampled pixels,
so the extras kernels can pre-latch every unsampled pixel 'done' (round-5
fast path, blend_visits done0): a pixel's alpha-blend is independent of its
neighbors, so sampled pixels' outputs and gradients must match the
unmasked render exactly while the whole-visit early termination skips the
rest. Pins the single-view path (loss value + seg-feature grad vs the
done0=None render, same keys) and the multi-view path
(_mv_full_loss(sampled_done=True) == False).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from test_mv_merged import _setup, E, H, W

from instascene_tpu.ops.rasterize import RasterizeConfig


@pytest.fixture
def rng():
    return np.random.default_rng(11)


def test_single_view_losses_match_unmasked(rng):
    from instascene_tpu.pipelines.train_semantic import (
        _done0_from_idx, _draw_sv_pixel_idx, render_features,
        single_view_and_3d_losses)
    from instascene_tpu.ops.rasterize import CameraMats

    params, mv = _setup(rng)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas",
                          bwd_extras_only=True, extras_dim=E)
    cam = CameraMats(mv.w2v[0], mv.full_proj[0], mv.campos[0])
    cb = jax.tree.map(lambda a: a[0], mv.binning)
    segmap = mv.segmaps[0]
    key = jax.random.PRNGKey(7)
    batch, max_labels = 128, 8
    labels3d = jnp.ones(params.capacity, jnp.int32)
    cf = jnp.asarray(rng.random((max_labels, E)).astype(np.float32))
    bg = jnp.zeros(3)

    def loss(feat, masked):
        sv_draws = done0 = None
        if masked:
            sv_draws, _ = _draw_sv_pixel_idx(key, segmap, segmap, cf, batch,
                                             False, False, None, None)
            done0 = _done0_from_idx([d[0] for d in sv_draws], W, H, cfg.tile)
        out = render_features(params, cam, bg, cfg, feat, cb, done0=done0)
        return single_view_and_3d_losses(
            params, feat, out, key, segmap, segmap, labels3d, cf,
            jnp.float32(1.0), jnp.float32(1.0), batch, max_labels, False,
            False, None, None, None, tile=cfg.tile, sv_draws=sv_draws)

    l_full, g_full = jax.jit(jax.value_and_grad(loss),
                             static_argnums=1)(params.seg_feature, False)
    l_mask, g_mask = jax.jit(jax.value_and_grad(loss),
                             static_argnums=1)(params.seg_feature, True)
    assert np.isfinite(float(l_full))
    np.testing.assert_array_equal(np.float32(l_full), np.float32(l_mask))
    np.testing.assert_array_equal(np.asarray(g_full), np.asarray(g_mask))


def test_mv_full_loss_sampled_done_exact(rng):
    from instascene_tpu.pipelines.train_semantic import _mv_full_loss

    params, mv = _setup(rng)
    cfg = RasterizeConfig(width=W, height=H, impl="pallas",
                          bwd_extras_only=True, extras_dim=E)
    key = jax.random.PRNGKey(3)

    def loss(feat, sd):
        return _mv_full_loss(params, feat, mv, key, None, jnp.zeros(3), 256,
                             8, cfg, sampled_done=sd)

    l_f, g_f = jax.jit(jax.value_and_grad(loss),
                       static_argnums=1)(params.seg_feature, False)
    l_m, g_m = jax.jit(jax.value_and_grad(loss),
                       static_argnums=1)(params.seg_feature, True)
    assert np.isfinite(float(l_f))
    np.testing.assert_array_equal(np.float32(l_f), np.float32(l_m))
    np.testing.assert_array_equal(np.asarray(g_f), np.asarray(g_m))

"""Pallas blend kernels vs the XLA blend path (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instascene_tpu.cameras import Camera
from instascene_tpu.data.synthetic import look_at
from instascene_tpu.ops.binning import bin_gaussians
from instascene_tpu.ops.blend import blend_tiles
from instascene_tpu.ops.blend_pallas import CHUNK, blend_fwd_pallas
from instascene_tpu.ops.preprocess import preprocess_gaussians

W, H = 48, 32
TILE = 16
GRID_X = W // TILE


def build_packed(rng, n=80, extra_dim=4, tile_cap=CHUNK * 2):
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.98, (n,)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = rng.normal(size=(n, extra_dim)).astype(np.float32)

    pre = preprocess_gaussians(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
        jnp.asarray(cam.camera_center), W, H, color=jnp.asarray(color))
    binning = bin_gaussians(pre, W, H, pair_cap=8192, tile_cap=tile_cap)
    assert int(binning.n_dropped) == 0

    from instascene_tpu.ops.blend_pallas import pack_flat_cols

    pad1 = lambda a: jnp.concatenate(
        [a, jnp.zeros((1,) + a.shape[1:], a.dtype)], axis=0)
    flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, jnp.asarray(opac),
                          pre.color, jnp.asarray(extra))
    packed = flat[binning.tile_indices]          # [T, K, D]
    packed_t = jnp.transpose(packed, (0, 2, 1))  # [T, D, K]
    args = dict(tile_indices=binning.tile_indices,
                packT=pad1(pre.T.reshape(n, 9)), xy=pad1(pre.xy),
                normal=pad1(pre.normal_view), opacity=pad1(jnp.asarray(opac)),
                color=pad1(pre.color), extra=pad1(jnp.asarray(extra)))
    return packed_t, binning.tile_count, args, extra_dim


def test_pallas_fwd_matches_xla(rng):
    packed_t, tile_count, args, E = build_packed(rng)
    ref = blend_tiles(args["tile_indices"], args["packT"], args["xy"],
                      args["normal"], args["opacity"], args["color"],
                      args["extra"], jnp.zeros(3), W, H, tile=TILE, chunk=16)

    out = blend_fwd_pallas(packed_t, tile_count.astype(jnp.int32), TILE,
                           GRID_X, E, interpret=True)

    def to_map(x):  # [T, C, P2] -> [H, W, C]
        T_, C_, P2 = x.shape
        gy = H // TILE
        x = x.reshape(gy, GRID_X, C_, TILE, TILE)
        x = np.moveaxis(np.moveaxis(x, 2, 4), (0, 2), (0, 1))
        # shape now [gy, TILE, GRID_X, TILE, C]
        return x.reshape(gy * TILE, GRID_X * TILE, C_)[:H, :W]

    maps = to_map(np.asarray(out.out))
    color = maps[..., 0:3]
    depth = maps[..., 3]
    normal = maps[..., 4:7]
    med = maps[..., 7]
    dist = maps[..., 8]
    final_T = maps[..., 9]
    extra = maps[..., 10:10 + E]

    # note: ref.color has bg composited; compare pre-bg accumulation
    ref_color_nobg = np.asarray(ref.color)  # bg=0 → same
    assert np.allclose(color, ref_color_nobg, atol=3e-4), np.abs(
        color - ref_color_nobg).max()
    assert np.allclose(depth, np.asarray(ref.depth), atol=3e-3)
    assert np.allclose(normal, np.asarray(ref.normal), atol=3e-4)
    assert np.allclose(med, np.asarray(ref.median_depth), atol=3e-3)
    assert np.allclose(dist, np.asarray(ref.distortion), atol=3e-3)
    assert np.allclose(final_T, np.asarray(ref.final_T), atol=2e-5)
    assert np.allclose(extra, np.asarray(ref.extra), atol=5e-4)

    imaps = to_map(np.asarray(out.iout))
    assert np.array_equal(imaps[..., 0], np.asarray(ref.n_contrib))


def test_pallas_bwd_matches_xla_grads(rng):
    """custom-VJP Pallas blend grads vs jax.grad through the XLA blend,
    compared per-gaussian (grads flow through pack_flat_cols' affine
    coefficients back into T, exercising the full VJP chain)."""
    from instascene_tpu.ops.blend_pallas import (blend_pallas_diff,
                                                 pack_flat_cols)

    packed_t, tile_count, args, E = build_packed(rng)
    key = jax.random.PRNGKey(1)
    OC = 12 + E
    n_tiles, P2 = packed_t.shape[0], TILE * TILE
    # random cotangent weights over the public output rows (zero for the
    # m1/m2 residual rows and for n_contrib)
    wout = jax.random.normal(key, (n_tiles, OC, P2))
    wout = wout.at[:, 10 + E:].set(0.0)

    def loss_pallas(packT, xy, normal, opacity, color, extra):
        flat = pack_flat_cols(packT[:-1], xy[:-1], normal[:-1], opacity[:-1],
                              color[:-1], extra[:-1])
        p = jnp.transpose(flat[args["tile_indices"]], (0, 2, 1))
        out, _ = blend_pallas_diff(p, tile_count.astype(jnp.int32), TILE,
                                   GRID_X, E, True)
        return jnp.sum(out * wout)

    pargs = (args["packT"], args["xy"], args["normal"], args["opacity"],
             args["color"], args["extra"])
    val_p = loss_pallas(*pargs)
    g_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2, 3, 4, 5))(*pargs)

    # equivalent loss through the XLA path: rebuild the same per-row weights
    def loss_xla(packT, xy, normal, opacity, color, extra):
        ref = blend_tiles(args["tile_indices"], packT, xy, normal, opacity,
                          color, extra, jnp.zeros(3), W, H, tile=TILE,
                          chunk=16)
        gy = H // TILE

        def from_map(img):  # [H,W,(C)] -> [T, C, P2]
            if img.ndim == 2:
                img = img[..., None]
            c = img.shape[-1]
            x = img.reshape(gy, TILE, GRID_X, TILE, c)
            x = jnp.transpose(x, (0, 2, 4, 1, 3))
            return x.reshape(n_tiles, c, P2)

        total = (jnp.sum(from_map(ref.color) * wout[:, 0:3])
                 + jnp.sum(from_map(ref.depth) * wout[:, 3:4])
                 + jnp.sum(from_map(ref.normal) * wout[:, 4:7])
                 + jnp.sum(from_map(ref.median_depth) * wout[:, 7:8])
                 + jnp.sum(from_map(ref.distortion) * wout[:, 8:9])
                 + jnp.sum(from_map(ref.final_T) * wout[:, 9:10])
                 + jnp.sum(from_map(ref.extra) * wout[:, 10:10 + E]))
        return total

    xargs = (args["packT"], args["xy"], args["normal"], args["opacity"],
             args["color"], args["extra"])
    val_x = loss_xla(*xargs)
    assert np.isclose(float(val_p), float(val_x), rtol=1e-4), (val_p, val_x)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3, 4, 5))(*xargs)

    names = ["packT", "xy", "normal", "opacity", "color", "extra"]
    n1 = args["packT"].shape[0]
    for nm, gp_, gx in zip(names, g_pallas, g_xla):
        a = np.asarray(gp_).reshape(n1, -1)
        b = np.asarray(gx).reshape(n1, -1)
        denom = np.abs(b).max() + 1e-8
        err = np.abs(a - b).max() / denom
        assert err < 3e-3, (nm, err, np.abs(b).max())


def test_rasterize_impl_pallas_matches_xla(rng):
    """Full rasterize() with impl='pallas' (interpret) vs impl='xla',
    values and grads."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 60
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.2, 0.1, 0.4])

    def loss(impl, xyz_, opac_):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              impl=impl)
        out = rasterize(xyz_, jnp.asarray(scales), jnp.asarray(rots), opac_,
                        cm, bg, cfg, colors=jnp.asarray(color))
        b = out.blend
        return (jnp.sum(b.color ** 2) + jnp.sum(b.distortion)
                + jnp.sum(b.median_depth) + jnp.sum(b.normal ** 2)
                + jnp.sum(b.alpha)), b

    (vx, bx) = loss("xla", jnp.asarray(xyz), jnp.asarray(opac))
    (vp, bp) = loss("pallas", jnp.asarray(xyz), jnp.asarray(opac))
    assert np.isclose(float(vx), float(vp), rtol=2e-4)
    assert np.allclose(np.asarray(bx.color), np.asarray(bp.color), atol=3e-4)

    gx = jax.grad(lambda a, b: loss("xla", a, b)[0], argnums=(0, 1))(
        jnp.asarray(xyz), jnp.asarray(opac))
    gp = jax.grad(lambda a, b: loss("pallas", a, b)[0], argnums=(0, 1))(
        jnp.asarray(xyz), jnp.asarray(opac))
    for a, b, nm in zip(gx, gp, ("xyz", "opac")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 5e-3, (
            nm, np.abs(a - b).max(), denom)


def test_cached_binning_matches_fresh(rng):
    """rasterize() with a precomputed binning cache must equal the fresh path,
    for both impls."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.models.gaussians import GaussianParams
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)
    from instascene_tpu.utils.general import inverse_sigmoid

    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 50
    params = GaussianParams(
        xyz=jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)
                                           ).astype(np.float32)),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.asarray(rng.normal(-2.0, 0.3, (n, 2)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.7))),
        alive=jnp.ones(n, bool),
        seg_feature=jnp.asarray(rng.random((n, 4)).astype(np.float32)))
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    for impl in ("xla", "pallas"):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              impl=impl)
        cb, tc, nd = compute_binning_cache(params, cm, W, H, pair_cap=8192,
                                           tile_cap=256, impl=impl)
        kwargs = dict(shs=params.features(), sh_degree=0,
                      extras=params.seg_feature_normed(), alive=params.alive)
        fresh = rasterize(params.xyz, params.scaling_activated(),
                          params.rotation_normalized(),
                          params.opacity_activated()[:, 0], cm, jnp.zeros(3),
                          cfg, **kwargs)
        cached = rasterize(params.xyz, params.scaling_activated(),
                           params.rotation_normalized(),
                           params.opacity_activated()[:, 0], cm, jnp.zeros(3),
                           cfg, cached_binning=cb, **kwargs)
        assert np.allclose(np.asarray(fresh.blend.color),
                           np.asarray(cached.blend.color), atol=1e-6), impl
        assert np.allclose(np.asarray(fresh.blend.extra),
                           np.asarray(cached.blend.extra), atol=1e-6), impl

        # gradients must agree too: the cached aligned path reduces per-slot
        # grads with the gather+cumsum chain (cache carries gid_order/prefix
        # indices) while the fresh path uses the scatter-add reduction
        def loss(cb_arg, x, o):
            out = rasterize(x, params.scaling_activated(),
                            params.rotation_normalized(), o, cm,
                            jnp.zeros(3), cfg, cached_binning=cb_arg,
                            **kwargs)
            return (jnp.sum(out.blend.color ** 2)
                    + jnp.sum(out.blend.extra ** 2))

        gf = jax.grad(loss, argnums=(1, 2))(
            None, params.xyz, params.opacity_activated()[:, 0])
        gc = jax.grad(loss, argnums=(1, 2))(
            cb, params.xyz, params.opacity_activated()[:, 0])
        for a, b, nm in zip(gf, gc, ("xyz", "opac")):
            a, b = np.asarray(a), np.asarray(b)
            denom = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / denom < 1e-5, (impl, nm)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_pallas_vs_xla(seed):
    """Randomized stress: varied scene statistics (huge/tiny splats, near/
    behind-camera, low/high opacity, degenerate quats, sometimes nearly
    empty frames) must render identically through the Pallas and XLA paths
    and agree on gradients."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)

    r = np.random.default_rng(1000 + seed)
    n = int(r.integers(8, 120))
    pos = np.array([r.normal(0, 2), -3.5 + r.normal(0, 1), 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    xyz = r.normal(0, r.uniform(0.1, 3.0), (n, 3)).astype(np.float32)
    scales = np.exp(r.normal(r.uniform(-4, -1), 0.8, (n, 2))
                    ).astype(np.float32)
    rots = r.normal(size=(n, 4)).astype(np.float32)
    rots[: n // 8] *= 1e-6           # near-degenerate quaternions
    opac = r.uniform(0.01, 0.99, (n,)).astype(np.float32)
    color = r.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = r.normal(size=(n, 4)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))

    def run(impl, x, o):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192,
                              tile_cap=512, chunk=16, impl=impl)
        return rasterize(x, jnp.asarray(scales), jnp.asarray(rots), o,
                         cm, jnp.zeros(3), cfg, colors=jnp.asarray(color),
                         extras=jnp.asarray(extra))

    xj, oj = jnp.asarray(xyz), jnp.asarray(opac)
    a = run("xla", xj, oj)
    b = run("pallas", xj, oj)
    for field in ("color", "alpha", "extra", "distortion", "median_depth"):
        av = np.asarray(getattr(a.blend, field))
        bv = np.asarray(getattr(b.blend, field))
        assert np.isfinite(av).all() and np.isfinite(bv).all(), (seed, field)
        assert np.allclose(av, bv, atol=2e-5), (
            seed, field, np.abs(av - bv).max())

    def loss(impl, x, o):
        out = run(impl, x, o)
        return (jnp.sum(out.blend.color ** 2)
                + jnp.sum(out.blend.extra ** 2))

    ga = jax.grad(lambda x, o: loss("xla", x, o), argnums=(0, 1))(xj, oj)
    gb = jax.grad(lambda x, o: loss("pallas", x, o), argnums=(0, 1))(xj, oj)
    for va, vb, nm in zip(ga, gb, ("xyz", "opac")):
        va, vb = np.asarray(va), np.asarray(vb)
        assert np.isfinite(va).all() and np.isfinite(vb).all(), (seed, nm)
        denom = np.abs(va).max() + 1e-6
        assert np.abs(va - vb).max() / denom < 5e-3, (seed, nm)


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_select_tiles_bundle_matches_full(rng):
    """Rendering through a tile-subset mini bundle must reproduce the full
    render exactly on the selected tiles (gradients included)."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.models.gaussians import GaussianParams
    from instascene_tpu.ops.binning import select_tiles_bundle
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache,
                                              rasterize)
    from instascene_tpu.utils.general import inverse_sigmoid

    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 70
    params = GaussianParams(
        xyz=jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)
                                           ).astype(np.float32)),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.asarray(rng.normal(-2.0, 0.3, (n, 2)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.7))),
        alive=jnp.ones(n, bool),
        seg_feature=jnp.asarray(rng.random((n, 4)).astype(np.float32)))
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                          impl="pallas")
    cb, tc, nd = compute_binning_cache(params, cm, W, H, pair_cap=8192,
                                       tile_cap=256, impl="pallas")
    kwargs = dict(shs=params.features(), sh_degree=0,
                  extras=params.seg_feature_normed(), alive=params.alive)

    def run(cb_arg):
        return rasterize(params.xyz, params.scaling_activated(),
                         params.rotation_normalized(),
                         params.opacity_activated()[:, 0], cm, jnp.zeros(3),
                         cfg, cached_binning=cb_arg, **kwargs)

    full = run(cb)
    num_tiles = (W // TILE) * (H // TILE)   # 3x2 grid at 48x32
    # select a mix incl. (likely) an empty corner tile
    sel = jnp.asarray(sorted(rng.choice(num_tiles, size=3, replace=False)),
                      dtype=jnp.int32)
    gid, mtile, mrank, n_trunc = select_tiles_bundle(
        cb[0], cb[9], sel, chunk_cap=3 * 48, n=n)
    assert int(n_trunc) == 0
    mini = run((gid, mtile, mrank))

    def tile_pixels(img, t):
        gx = W // TILE
        ty, tx = t // gx, t % gx
        return np.asarray(img[ty * TILE:(ty + 1) * TILE,
                              tx * TILE:(tx + 1) * TILE])

    for t in np.asarray(sel):
        assert np.allclose(tile_pixels(full.blend.color, t),
                           tile_pixels(mini.blend.color, t), atol=1e-6), t
        assert np.allclose(tile_pixels(full.blend.extra, t),
                           tile_pixels(mini.blend.extra, t), atol=1e-6), t

    # gradients through the mini render must equal the full render's grads
    # restricted to the selected tiles' pixels (gathered, not masked —
    # unselected tiles hold unwritten garbage in the mini output)
    gx = W // TILE
    idx = []
    for t in np.asarray(sel):
        ty, tx = t // gx, t % gx
        for py in range(TILE):
            for px in range(TILE):
                idx.append((ty * TILE + py) * W + tx * TILE + px)
    idx = jnp.asarray(np.asarray(idx, np.int32))

    def loss(cb_arg, x):
        out = rasterize(x, params.scaling_activated(),
                        params.rotation_normalized(),
                        params.opacity_activated()[:, 0], cm, jnp.zeros(3),
                        cfg, cached_binning=cb_arg, **kwargs)
        pool = out.blend.extra.reshape(-1, out.blend.extra.shape[-1])[idx]
        return jnp.sum(pool ** 2)

    gf = jax.grad(loss, argnums=1)(cb, params.xyz)
    gm = jax.grad(loss, argnums=1)((gid, mtile, mrank), params.xyz)
    denom = np.abs(np.asarray(gf)).max() + 1e-8
    assert np.abs(np.asarray(gf) - np.asarray(gm)).max() / denom < 1e-5


def test_viewer_mode_matches_full(rng):
    """fwd_viewer=True must reproduce the full path's color/alpha/extras
    exactly (depth/normal/median/distortion are documented zeros)."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.models.gaussians import GaussianParams
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    from instascene_tpu.utils.general import inverse_sigmoid

    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 60
    params = GaussianParams(
        xyz=jnp.asarray(rng.normal(0, 0.5, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)
                                           ).astype(np.float32)),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.asarray(rng.normal(-2.0, 0.3, (n, 2)).astype(np.float32)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.7))),
        alive=jnp.ones(n, bool),
        seg_feature=jnp.asarray(rng.random((n, 4)).astype(np.float32)))
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    kwargs = dict(shs=params.features(), sh_degree=0,
                  extras=params.seg_feature_normed(), alive=params.alive)
    outs = {}
    for viewer in (False, True):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              impl="pallas", fwd_viewer=viewer)
        outs[viewer] = rasterize(params.xyz, params.scaling_activated(),
                                 params.rotation_normalized(),
                                 params.opacity_activated()[:, 0], cm,
                                 jnp.zeros(3), cfg, **kwargs)
    for field in ("color", "alpha", "extra", "final_T", "n_contrib"):
        a = np.asarray(getattr(outs[False].blend, field))
        b = np.asarray(getattr(outs[True].blend, field))
        assert np.allclose(a, b, atol=1e-6), field
    assert np.all(np.asarray(outs[True].blend.distortion) == 0)


def test_train_step_impl_parity(rng):
    """One full geometry train_step with impl='pallas' (interpret) must match
    impl='xla': same loss, same updated params."""
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.densify import init_stats
    from instascene_tpu.models.gaussians import create_from_pcd
    from instascene_tpu.models.optimizer import geometry_lrs, init_adam_state
    from instascene_tpu.ops.rasterize import RasterizeConfig
    from instascene_tpu.pipelines.train import camera_tensors, train_step
    from instascene_tpu.cameras import Camera

    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H,
                 image=rng.random((H, W, 3)).astype(np.float32))
    ct = camera_tensors(cam)
    pts = rng.normal(0, 0.5, (24, 3)).astype(np.float32)
    params = create_from_pcd(pts, rng.random((24, 3)).astype(np.float32),
                             rng.random(24).astype(np.float32) * 0.05 + 0.01,
                             capacity=32)
    opt = OptimizationParams()
    lrs = geometry_lrs(opt, 1.0, 1e-3)
    results = {}
    for impl in ("xla", "pallas"):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              chunk=16, impl=impl)
        p, o, s, m = train_step(
            params, init_adam_state(params), init_stats(32),
            ct.w2v, ct.full_proj, ct.campos, ct.c2w_rot, ct.gt_image,
            jnp.zeros(1), jnp.zeros(1), jnp.zeros(3), lrs,
            0.2, 0.01, 0.05, 0.0, cfg, ct.tanfovx, ct.tanfovy, 1.0, False)
        results[impl] = (p, s, m)
    lx = float(results["xla"][2]["loss"])
    lp = float(results["pallas"][2]["loss"])
    assert np.isclose(lx, lp, rtol=1e-4), (lx, lp)
    for f in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        a = np.asarray(getattr(results["xla"][0], f))
        b = np.asarray(getattr(results["pallas"][0], f))
        # Adam normalizes by grad magnitude — tiny grad diffs can flip the
        # normalized update only where grads are ~0, so compare params coarsely
        assert np.abs(a - b).max() < 5e-3, (f, np.abs(a - b).max())
    # densify stats (screen-grad hack) must agree too
    sa = np.asarray(results["xla"][1].xyz_gradient_accum)
    sb = np.asarray(results["pallas"][1].xyz_gradient_accum)
    assert np.abs(sa - sb).max() / (np.abs(sa).max() + 1e-9) < 2e-3


def test_bwd_extras_only_mode(rng):
    """bwd_extras_only: feature grads must match the full path; geometry
    grads silently zero (documented contract)."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 50
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.3, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = rng.normal(size=(n, 8)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))

    def loss(extra_, flag):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              impl="pallas", bwd_extras_only=flag)
        out = rasterize(jnp.asarray(xyz), jnp.asarray(scales),
                        jnp.asarray(rots), jnp.asarray(opac), cm,
                        jnp.zeros(3), cfg, colors=jnp.asarray(color),
                        extras=extra_)
        return jnp.sum(out.blend.extra ** 2)

    e = jnp.asarray(extra)
    g_full = jax.grad(lambda x: loss(x, False))(e)
    g_fast = jax.grad(lambda x: loss(x, True))(e)
    a, b = np.asarray(g_full), np.asarray(g_fast)
    assert np.abs(a - b).max() / (np.abs(a).max() + 1e-9) < 1e-4
    assert np.abs(a).max() > 0


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_pallas_chunk256_matches_chunk128(rng):
    """pallas_chunk=256 must be numerically identical to the default 128."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    pos = np.array([0.5, -3.0, 1.2])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 60
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.3, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.9, n).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = rng.normal(size=(n, 4)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))

    outs = {}
    grads = {}
    for chunk in (128, 256):
        # pair_cap deliberately NOT a multiple of 256: aligned_cap must round
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8000,
                              tile_cap=512, impl="pallas",
                              pallas_chunk=chunk)

        def loss(e):
            o = rasterize(jnp.asarray(xyz), jnp.asarray(scales),
                          jnp.asarray(rots), jnp.asarray(opac), cm,
                          jnp.zeros(3), cfg, colors=jnp.asarray(color),
                          extras=e)
            return jnp.sum(o.blend.color ** 2) + jnp.sum(o.blend.extra ** 2), o
        (l, o), g = jax.value_and_grad(loss, has_aux=True)(jnp.asarray(extra))
        outs[chunk] = np.asarray(o.blend.color)
        grads[chunk] = np.asarray(g)
    assert np.allclose(outs[128], outs[256], atol=1e-5)
    assert np.allclose(grads[128], grads[256], atol=1e-5)


def test_pallas_early_termination_dense(rng):
    """Hundreds of near-opaque splats stacked on the same tiles: the
    transmittance cut must happen mid-chunk and across chunk boundaries;
    pallas must match the XLA reference exactly."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    pos = np.array([0.0, -3.0, 0.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 400  # >> chunk 128, tiny spatial jitter → same tiles, deep stacks
    xyz = (rng.normal(0, 0.02, (n, 3)) + np.array([0, 0, 0])).astype(np.float32)
    xyz[:, 1] += np.linspace(0, 1.0, n)  # spread in depth
    scales = np.full((n, 2), 0.08, np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.95, np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    outs = {}
    for impl in ("xla", "pallas"):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=16384,
                              tile_cap=512, impl=impl)
        o = rasterize(jnp.asarray(xyz), jnp.asarray(np.log(scales) * 0 + scales),
                      jnp.asarray(rots), jnp.asarray(opac), cm,
                      jnp.zeros(3), cfg, colors=jnp.asarray(color))
        outs[impl] = (np.asarray(o.blend.color), np.asarray(o.blend.final_T),
                      np.asarray(o.blend.n_contrib))
    c_x, t_x, n_x = outs["xla"]
    c_p, t_p, n_p = outs["pallas"]
    # termination engaged: with alpha=.95 the cut leaves T in [1e-4, 2e-3)
    assert t_x.min() < 2.1e-3
    # 400 stacked near-opaque splats: the two backends accumulate in
    # different orders; ~2e-4 color drift and a +-1-slot termination
    # difference are float32 rounding, not semantics
    assert np.abs(c_x - c_p).max() < 5e-4
    # on terminated pixels the exact final_T depends on which slot crossed
    # the 1e-4 line (each slot multiplies T by 1-alpha=0.05); a one-slot
    # float32 difference is legitimate — compare exactly elsewhere
    both_term = (t_x < 2.5e-3) & (t_p < 2.5e-3)
    assert np.abs(np.where(both_term, 0, t_x - t_p)).max() < 1e-5
    assert np.abs(n_x.astype(np.int64) - n_p.astype(np.int64)).max() <= 2
    assert not np.isnan(c_p).any() and not np.isnan(t_p).any()


def test_aligned_chunk_visits_consecutive():
    """Pallas TPU flushes an output block's VMEM buffer when the block index
    changes between grid steps; a block revisited NON-consecutively gets the
    stale buffer flushed over its rendered output at grid end. The aligned
    layout must therefore assign every chunk — including leftover tail
    chunks — so that each tile's visit positions are contiguous, and leftover
    chunks must carry only sentinel slots (numeric no-ops in the kernel).

    Regression for the round-1 advisor finding: empty tiles between the last
    real chunk and num_tiles-sentinel tail chunks made block num_tiles-1's
    visits non-consecutive whenever any tile was empty and tile num_tiles-1
    was not. CPU interpret mode cannot catch the flush itself, so this test
    checks the invariant on the index data directly."""
    from instascene_tpu.ops.binning import aligned_cap
    from instascene_tpu.ops.preprocess import PreprocessOut

    width, height, tile = 48, 32, 16
    grid_x, grid_y = width // tile, height // tile
    num_tiles = grid_x * grid_y                      # 6
    # tiles 1..5 get one gaussian each; tile 0 stays empty
    occupied = [1, 2, 3, 4, 5]
    n = len(occupied)
    rect_min = np.array([[t % grid_x, t // grid_x] for t in occupied],
                        np.int32)
    rect_max = rect_min + 1
    pre = PreprocessOut(
        T=jnp.zeros((n, 3, 3)), normal_view=jnp.zeros((n, 3)),
        depth=jnp.linspace(1.0, 2.0, n).astype(jnp.float32),
        xy=jnp.zeros((n, 2)), radius=jnp.ones(n),
        rect_min=jnp.asarray(rect_min), rect_max=jnp.asarray(rect_max),
        tiles_touched=jnp.ones(n, jnp.int32),
        valid=jnp.ones(n, bool), color=jnp.zeros((n, 3)))
    pair_cap = 512
    binning = bin_gaussians(pre, width, height, pair_cap=pair_cap,
                            tile_cap=CHUNK, layout="aligned")
    al = binning.aligned
    ct = np.asarray(al.chunk_tile)
    n_chunks = aligned_cap(pair_cap, num_tiles) // CHUNK
    assert ct.shape == (n_chunks,)
    # leftover chunks exist in this configuration (the scenario under test)
    n_real = int(np.sum(np.asarray(binning.tile_count) > 0))  # 5 chunks
    assert n_chunks > n_real + 1
    # 1) no out-of-range sentinel ids remain
    assert ct.max() < num_tiles
    # 2) every output block's visits are consecutive
    clamped = np.minimum(ct, num_tiles - 1)
    for t in np.unique(clamped):
        pos = np.flatnonzero(clamped == t)
        assert np.array_equal(pos, np.arange(pos[0], pos[-1] + 1)), (
            f"tile {t} visited non-consecutively at {pos}")
    # 3) all slots of empty-tile and leftover chunks are sentinels
    gid = np.asarray(al.aligned_gid).reshape(n_chunks, CHUNK)
    real_tiles = set(occupied)
    for q in range(n_chunks):
        if ct[q] not in real_tiles or q >= n_real:
            assert (gid[q] == n).all(), f"chunk {q} leaked real gaussians"
    # 4) each occupied tile's single real chunk carries exactly its gaussian
    for q in range(n_real):
        assert (gid[q] != n).sum() == 1


def test_aligned_all_tiles_occupied_leftover():
    """No empty tiles: leftover chunks must follow the last real tile
    (num_tiles-1) so its visits stay consecutive, still sentinel-only."""
    from instascene_tpu.ops.binning import aligned_cap
    from instascene_tpu.ops.preprocess import PreprocessOut

    width, height, tile = 48, 32, 16
    grid_x = width // tile
    num_tiles = (width // tile) * (height // tile)
    occupied = list(range(num_tiles))
    n = len(occupied)
    rect_min = np.array([[t % grid_x, t // grid_x] for t in occupied],
                        np.int32)
    pre = PreprocessOut(
        T=jnp.zeros((n, 3, 3)), normal_view=jnp.zeros((n, 3)),
        depth=jnp.linspace(1.0, 2.0, n).astype(jnp.float32),
        xy=jnp.zeros((n, 2)), radius=jnp.ones(n),
        rect_min=jnp.asarray(rect_min), rect_max=jnp.asarray(rect_min + 1),
        tiles_touched=jnp.ones(n, jnp.int32),
        valid=jnp.ones(n, bool), color=jnp.zeros((n, 3)))
    binning = bin_gaussians(pre, width, height, pair_cap=512,
                            tile_cap=CHUNK, layout="aligned")
    ct = np.asarray(binning.aligned.chunk_tile)
    n_chunks = aligned_cap(512, num_tiles) // CHUNK
    assert ct.max() < num_tiles
    assert (ct[num_tiles:] == num_tiles - 1).all()
    gid = np.asarray(binning.aligned.aligned_gid).reshape(n_chunks, CHUNK)
    assert (gid[num_tiles:] == n).all()


def test_pallas_fwd_empty_tile_final_T(rng):
    """Tiles with count==0 run only the init block: final_T must be 1 (all
    transmittance remains → background composites through), not 0 (opaque
    black). Regression for the round-1 advisor finding on the padded
    layout's forward-only path."""
    packed_t, tile_count, args, E = build_packed(rng)
    tc = np.asarray(tile_count).copy()
    tc[0] = 0
    f = blend_fwd_pallas(packed_t, jnp.asarray(tc), TILE, GRID_X, E,
                         interpret=True)
    out0 = np.asarray(f.out)[0]
    assert np.allclose(out0[9], 1.0), "empty tile must keep final_T = 1"
    assert np.allclose(out0[0:3], 0.0)


@pytest.mark.parametrize("seed", range(4))
def test_visit_layout_invariants(seed):
    """build_visits structural invariants: visits tile-ascending with chunk
    indices non-decreasing (Pallas resident-buffer rule), every tile visited,
    slot ranges exactly partition [0, covered), every chunk index present
    (backward output blocks all initialized)."""
    rng = np.random.default_rng(seed)
    from instascene_tpu.ops.binning import build_visits

    num_tiles = 12
    chunk = 128
    pair_cap = 1280
    # random tile counts incl. empties and an overflowing total
    counts = rng.integers(0, 400, num_tiles)
    counts[rng.integers(0, num_tiles, 3)] = 0
    total = int(counts.sum())
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]]).astype(np.int32)
    ends = np.cumsum(counts).astype(np.int32)
    v = build_visits(jnp.asarray(np.minimum(starts, pair_cap)),
                     jnp.asarray(np.minimum(ends, pair_cap)),
                     jnp.int32(total), pair_cap, num_tiles, chunk=chunk)
    vt = np.asarray(v.visit_tile)
    vc = np.asarray(v.visit_chunk)
    s0 = np.asarray(v.visit_s0)
    s1 = np.asarray(v.visit_s1)
    ts = np.asarray(v.visit_tstart)
    covered = min(total, pair_cap)
    n_chunks = pair_cap // chunk

    assert (np.diff(vt) >= 0).all()          # tile-ascending
    assert (np.diff(vc) >= 0).all()          # chunk non-decreasing
    assert set(range(num_tiles)) <= set(vt.tolist())   # every tile visited
    assert set(range(n_chunks)) <= set(vc.tolist())    # every chunk covered

    # slot ranges partition [0, covered)
    owned = np.zeros(pair_cap, np.int32)
    for t, c, a, b in zip(vt, vc, s0, s1):
        if b > a:
            owned[c * chunk + a: c * chunk + b] += 1
    assert (owned[:covered] == 1).all()
    assert (owned[covered:] == 0).all()

    # per-visit ranges agree with the tile's clamped [start, end)
    for t, c, a, b, tst in zip(vt, vc, s0, s1, ts):
        if b > a:
            lo, hi = c * chunk + a, c * chunk + b
            assert lo >= min(starts[t], pair_cap)
            assert hi <= min(ends[t], pair_cap)
            assert tst == min(starts[t], pair_cap)


def test_pallas_tracker_matches_xla(rng):
    """Visit-kernel contributor tracking (track_contrib) vs the XLA path
    (itself pair-set-oracle-tested in test_rasterizer): ids must be
    IDENTICAL (both append in deterministic blend order with the same
    w>0.1 gate), weights equal to fp tolerance."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 70
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-1.8, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.4, 0.95, (n,)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))

    outs = {}
    for impl in ("xla", "pallas"):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              impl=impl, track_contrib=True)
        outs[impl] = rasterize(
            jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(opac), cm, jnp.zeros(3), cfg,
            colors=jnp.asarray(color))
    bx, bp = outs["xla"].blend, outs["pallas"].blend
    idx, idp = np.asarray(bx.contrib_ids), np.asarray(bp.contrib_ids)
    wx, wp = np.asarray(bx.contrib_w), np.asarray(bp.contrib_w)
    assert idp.shape == idx.shape
    assert (idp >= -1).all()
    # some pixels must actually have contributors for the test to mean much
    assert (idx >= 0).sum() > 100
    assert np.array_equal(idx, idp)
    assert np.allclose(wx, wp, atol=1e-5)
    # the tracked full render itself must also match
    assert np.allclose(np.asarray(bx.color), np.asarray(bp.color), atol=3e-4)
    assert np.allclose(np.asarray(bx.final_T), np.asarray(bp.final_T),
                       atol=2e-5)


def test_no_depth_dist_matches_xla(rng):
    """cfg.no_depth_dist compile-time-skips the distortion machinery; for a
    loss that reads only the lean outputs (color/normal/median/alpha — the
    default geometry loss shape: lambda_dist == 0 is the reference default
    and depth_ratio == 1), values and grads must match the full XLA path,
    and the skipped outputs must come back exact zeros."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 60
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.2, 0.1, 0.4])

    def loss(impl, no_dist, xyz_, opac_):
        cfg = RasterizeConfig(width=W, height=H, pair_cap=8192, tile_cap=256,
                              impl=impl, no_depth_dist=no_dist)
        out = rasterize(xyz_, jnp.asarray(scales), jnp.asarray(rots), opac_,
                        cm, bg, cfg, colors=jnp.asarray(color))
        b = out.blend
        return (jnp.sum(b.color ** 2) + jnp.sum(b.median_depth)
                + jnp.sum(b.normal ** 2) + jnp.sum(b.alpha)), b

    (vx, bx) = loss("xla", False, jnp.asarray(xyz), jnp.asarray(opac))
    (vp, bp) = loss("pallas", True, jnp.asarray(xyz), jnp.asarray(opac))
    assert np.isclose(float(vx), float(vp), rtol=2e-4)
    assert np.allclose(np.asarray(bx.color), np.asarray(bp.color), atol=3e-4)
    assert np.allclose(np.asarray(bx.median_depth),
                       np.asarray(bp.median_depth), atol=3e-4)
    # skipped outputs come back exact zeros. NOTE: on CPU (interpret mode)
    # this verifies the zrow stores write zero VALUES; the stale-VMEM class
    # (a dropped absolute store reading garbage) only manifests on real TPU
    # — interpret mode pre-zeroes buffers (see the round-2 NaN postmortem in
    # docs/PERFORMANCE.md), so TPU validation of this mode still matters.
    assert np.all(np.asarray(bp.distortion) == 0.0)
    assert np.all(np.asarray(bp.depth) == 0.0)

    gx = jax.grad(lambda a, b: loss("xla", False, a, b)[0], argnums=(0, 1))(
        jnp.asarray(xyz), jnp.asarray(opac))
    gp = jax.grad(lambda a, b: loss("pallas", True, a, b)[0], argnums=(0, 1))(
        jnp.asarray(xyz), jnp.asarray(opac))
    for a, b, nm in zip(gx, gp, ("xyz", "opac")):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(a).max() + 1e-8
        assert np.abs(a - b).max() / denom < 5e-3, (
            nm, np.abs(a - b).max(), denom)


def test_slab_plan_4k_and_1080p():
    """_slab_plan splits a 4K bench-scale frame into budget-fitting tile
    slabs (the CUDA reference renders any resolution via dynamic buffers,
    rasterize_points.cu:39-100; XLA buys the same with sequential slabs)
    and leaves a snug-cap 1080p frame unsplit."""
    from instascene_tpu.ops.blend_visits import VISIT_SMEM_BUDGET_BYTES
    from instascene_tpu.ops.rasterize import RasterizeConfig, _slab_plan

    cfg4k = RasterizeConfig(width=3840, height=2160, impl="pallas",
                            pair_cap=5 * 1024 * 1024).resolved(300_000)
    plan = _slab_plan(cfg4k)
    assert plan is not None and len(plan) >= 2
    assert plan[0][0] == 0
    assert sum(h for _, h, _ in plan) == 2160
    for i, (y0, h, cap) in enumerate(plan):
        assert y0 % 16 == 0 and (h % 16 == 0 or i == len(plan) - 1)
        rows = -(-h // 16)
        assert 5 * 4 * (cap // 128 + 240 * rows) <= VISIT_SMEM_BUDGET_BYTES

    cfg1080 = RasterizeConfig(width=1920, height=1080, impl="pallas",
                              pair_cap=1440 * 1024).resolved(300_000)
    assert _slab_plan(cfg1080) is None


def test_slab_render_matches_single(rng, monkeypatch):
    """Shrinking the visit SMEM budget forces the slab fallback on a small
    frame; maps, per-gaussian outputs and gradients must match the
    single-launch render exactly."""
    import instascene_tpu.ops.blend_visits as bv
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              _slab_plan, rasterize)

    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 80
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.0, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, (n,)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = rng.normal(size=(n, 4)).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.2, 0.1, 0.4])
    cfg = RasterizeConfig(width=W, height=H, pair_cap=2048, tile_cap=256,
                          impl="pallas")

    def run(xyz_, opac_):
        out = rasterize(xyz_, jnp.asarray(scales), jnp.asarray(rots), opac_,
                        cm, bg, cfg, colors=jnp.asarray(color),
                        extras=jnp.asarray(extra))
        b = out.blend
        loss = (jnp.sum(b.color ** 2) + jnp.sum(b.normal ** 2)
                + jnp.sum(b.alpha) + jnp.sum(b.extra ** 2)
                + jnp.sum(b.distortion) + jnp.sum(b.median_depth))
        return loss, out

    assert _slab_plan(cfg.resolved(n)) is None
    (v_full, out_full), g_full = jax.value_and_grad(
        run, argnums=(0, 1), has_aux=True)(jnp.asarray(xyz),
                                           jnp.asarray(opac))

    # budget between the full frame's visit bytes and a 2-slab split's
    rcfg = cfg.resolved(n)
    full_v = rcfg.pair_cap // 128 + (W // 16) * (H // 16)
    monkeypatch.setattr(bv, "VISIT_SMEM_BUDGET_BYTES", 5 * 4 * full_v - 20)
    plan = _slab_plan(rcfg)
    assert plan is not None and len(plan) >= 2
    (v_slab, out_slab), g_slab = jax.value_and_grad(
        run, argnums=(0, 1), has_aux=True)(jnp.asarray(xyz),
                                           jnp.asarray(opac))

    bf, bs = out_full.blend, out_slab.blend
    for name in ("color", "depth", "alpha", "normal", "median_depth",
                 "distortion", "extra", "final_T", "n_contrib"):
        a, b = getattr(bf, name), getattr(bs, name)
        assert np.allclose(np.asarray(a), np.asarray(b), atol=1e-5), name
    assert np.array_equal(np.asarray(out_full.radii),
                          np.asarray(out_slab.radii))
    assert np.array_equal(np.asarray(out_full.visible),
                          np.asarray(out_slab.visible))
    assert np.isclose(float(v_full), float(v_slab), rtol=1e-5)
    # per-gaussian grads reduce per slab then add — a different float
    # summation order than the single global reduction, so tolerance is
    # reassociation-level, not exactness
    for gf, gs in zip(g_full, g_slab):
        assert np.allclose(np.asarray(gf), np.asarray(gs),
                           atol=5e-4, rtol=2e-3)

"""Rasterizer correctness: forward vs brute-force oracle, grads vs naive impl."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from instascene_tpu.cameras import (Camera, get_projection_matrix,
                                    get_world2view)
from instascene_tpu.data.synthetic import look_at
from instascene_tpu.ops.binning import bin_gaussians
from instascene_tpu.ops.blend import blend_tiles
from instascene_tpu.ops.preprocess import preprocess_gaussians
from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                          rasterize)
from instascene_tpu.ops.reference_renderer import render_brute

W, H = 48, 32


def make_camera():
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    return Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                  image_name="t", width=W, height=H)


def make_gaussians(rng, n=60, seed_extra=0):
    xyz = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    scales = np.exp(rng.normal(-2.2, 0.4, (n, 2))).astype(np.float32)
    rots = rng.normal(size=(n, 4)).astype(np.float32)
    opac = rng.uniform(0.2, 0.95, (n,)).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    extra = rng.normal(size=(n, 4)).astype(np.float32)
    return xyz, scales, rots, opac, color, extra


@pytest.fixture
def scene(rng):
    cam = make_camera()
    g = make_gaussians(rng)
    return cam, g


def run_preprocess(cam, g):
    xyz, scales, rots, opac, color, extra = g
    return preprocess_gaussians(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
        jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
        jnp.asarray(cam.camera_center), W, H, color=jnp.asarray(color))


def test_preprocess_geometry(scene):
    """Splat center (u,v)=(0,0) must project to the pixel of the 3D mean, and
    Tw·(0,0,1) must equal the view-space depth of the mean."""
    cam, g = scene
    xyz = g[0]
    pre = run_preprocess(cam, g)
    T = np.asarray(pre.T)
    valid = np.asarray(pre.valid)
    # project means manually
    ph = np.concatenate([xyz, np.ones((len(xyz), 1))], axis=1)
    clip = ph @ cam.full_proj.T
    ndc = clip[:, :3] / clip[:, 3:4]
    px = ((ndc[:, 0] + 1) * W - 1) / 2
    py = ((ndc[:, 1] + 1) * H - 1) / 2
    p_view_z = (ph @ cam.w2v.T)[:, 2]
    # T rows applied to (0,0,1) = third column
    cx = T[:, 0, 2] / T[:, 2, 2]
    cy = T[:, 1, 2] / T[:, 2, 2]
    assert valid.sum() > 10
    assert np.allclose(cx[valid], px[valid], atol=0.1)
    assert np.allclose(cy[valid], py[valid], atol=0.1)
    assert np.allclose(T[valid, 2, 2], p_view_z[valid], atol=1e-4)
    # depth is positive for valid
    assert (np.asarray(pre.depth)[valid] > 0.2).all()


def test_forward_matches_brute(scene):
    cam, g = scene
    xyz, scales, rots, opac, color, extra = g
    pre = run_preprocess(cam, g)
    pre_np = {k: np.asarray(v) for k, v in pre._asdict().items()}
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    brute = render_brute(pre_np, opac, color, extra, bg, W, H)

    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cfg = RasterizeConfig(width=W, height=H, chunk=16, pair_cap=4096,
                          tile_cap=64, track_contrib=True)
    out = rasterize(jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
                    jnp.asarray(opac), cm, jnp.asarray(bg), cfg,
                    colors=jnp.asarray(color), extras=jnp.asarray(extra))
    assert int(out.n_dropped) == 0
    b = out.blend
    for key, mine in [("color", b.color), ("depth", b.depth),
                      ("alpha", b.alpha), ("normal", b.normal),
                      ("median_depth", b.median_depth),
                      ("distortion", b.distortion), ("extra", b.extra),
                      ("final_T", b.final_T)]:
        got = np.asarray(mine)
        want = brute[key]
        assert got.shape == want.shape, key
        assert np.allclose(got, want, atol=2e-4), (
            key, np.abs(got - want).max())
    # tracker: same (gaussian, pixel) pair set as the oracle's w>0.1 list
    ids = np.asarray(b.contrib_ids).reshape(-1, ids_k := b.contrib_ids.shape[-1])
    mine_pairs = set()
    for pix in range(ids.shape[0]):
        for s in range(ids_k):
            if ids[pix, s] >= 0:
                mine_pairs.add((int(ids[pix, s]), pix))
    assert mine_pairs == set(brute["pairs"])


def test_early_termination(rng):
    """Stacked near-opaque gaussians: T must freeze once below 1e-4 and
    far gaussians must not contribute."""
    # overhead camera looking straight down at surfels lying in the x-y plane
    # (normal +z faces the camera) stacked along the view axis
    pos = np.array([0.0, 0.0, 4.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="t", width=W, height=H)
    n = 40
    xyz = np.zeros((n, 3), np.float32)
    xyz[:, 2] = np.linspace(2.0, 0.0, n)  # stacked toward the camera
    scales = np.full((n, 2), 0.8, np.float32)
    rots = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
    opac = np.full((n,), 0.95, np.float32)
    color = np.linspace(0, 1, n)[:, None].repeat(3, 1).astype(np.float32)
    pre = run_preprocess(cam, (xyz, scales, rots, opac, color, None))
    pre_np = {k: np.asarray(v) for k, v in pre._asdict().items()}
    bg = np.zeros(3, np.float32)
    brute = render_brute(pre_np, opac, color, None, bg, W, H)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cfg = RasterizeConfig(width=W, height=H, chunk=8, pair_cap=4096,
                          tile_cap=64)
    out = rasterize(jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
                    jnp.asarray(opac), cm, jnp.asarray(bg), cfg,
                    colors=jnp.asarray(color))
    # termination happened: some pixels stopped well before the 40th gaussian
    # (final_T freezes just above 1e-4 — the done gaussian is never applied)
    nc = np.asarray(out.blend.n_contrib)
    assert nc.min() < 20
    assert np.asarray(out.blend.final_T).min() < 5e-3
    assert np.allclose(np.asarray(out.blend.color), brute["color"], atol=2e-4)
    assert np.allclose(np.asarray(out.blend.final_T), brute["final_T"],
                       atol=1e-6)


def naive_render(xyz, scales, rots, opac, color, extra, cam_mats, bg,
                 rect_min, rect_max, order):
    """Independent differentiable implementation: lax.scan over gaussians in
    depth order, full-image state. Shares only preprocess with the real path."""
    pre = preprocess_gaussians(xyz, scales, rots, cam_mats.w2v,
                               cam_mats.full_proj, cam_mats.campos, W, H,
                               color=color)
    px, py = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                          jnp.arange(H, dtype=jnp.float32))
    px = px.reshape(-1)
    py = py.reshape(-1)
    tx = (px.astype(jnp.int32)) // 16
    ty = (py.astype(jnp.int32)) // 16
    E = extra.shape[1]

    def body(carry, gi):
        T, done, C, Nrm, D, Ex, M1, M2, dist, med = carry
        Tg = pre.T[gi]
        Tu, Tv, Tw = Tg[0], Tg[1], Tg[2]
        k = px[:, None] * Tw[None, :] - Tu[None, :]
        l = py[:, None] * Tw[None, :] - Tv[None, :]
        p = jnp.cross(k, l)
        pz_ok = p[:, 2] != 0
        pz = jnp.where(pz_ok, p[:, 2], 1.0)
        sx, sy = p[:, 0] / pz, p[:, 1] / pz
        rho3d = sx * sx + sy * sy
        dxy = pre.xy[gi][None, :] - jnp.stack([px, py], -1)
        rho2d = 2.0 * jnp.sum(dxy ** 2, -1)
        use3d = rho3d <= rho2d
        rho = jnp.where(use3d, rho3d, rho2d)
        depth_ray = jnp.where(use3d, sx * Tw[0] + sy * Tw[1] + Tw[2], Tw[2])
        power = -0.5 * rho
        a_raw = opac[gi] * jnp.exp(power)
        alpha = a_raw + jax.lax.stop_gradient(jnp.minimum(a_raw, 0.99) - a_raw)
        in_rect = ((tx >= rect_min[gi, 0]) & (tx < rect_max[gi, 0])
                   & (ty >= rect_min[gi, 1]) & (ty < rect_max[gi, 1]))
        m = (pre.valid[gi] & in_rect & pz_ok & (depth_ray >= 0.2)
             & (power <= 0) & (alpha >= 1 / 255) & ~done)
        test_T = T * (1 - alpha)
        newly_done = m & (test_T < 1e-4)
        c = m & ~newly_done
        w = jnp.where(c, alpha * T, 0.0)
        md = 100.0 / (100.0 - 0.2) * (1 - 0.2 / jnp.where(c, depth_ray, 1.0))
        dist = dist + (md * md * (1 - T) + M2 - 2 * md * M1) * w
        D = D + depth_ray * w
        M1 = M1 + md * w
        M2 = M2 + md * md * w
        med = jnp.where(c & (T > 0.5), depth_ray, med)
        C = C + w[:, None] * pre.color[gi][None, :]
        Nrm = Nrm + w[:, None] * pre.normal_view[gi][None, :]
        Ex = Ex + w[:, None] * extra[gi][None, :]
        T = jnp.where(c, test_T, T)
        done = done | newly_done
        return (T, done, C, Nrm, D, Ex, M1, M2, dist, med), None

    npx = W * H
    carry0 = (jnp.ones(npx), jnp.zeros(npx, bool), jnp.zeros((npx, 3)),
              jnp.zeros((npx, 3)), jnp.zeros(npx), jnp.zeros((npx, E)),
              jnp.zeros(npx), jnp.zeros(npx), jnp.zeros(npx), jnp.zeros(npx))
    (T, _, C, Nrm, D, Ex, M1, M2, dist, med), _ = jax.lax.scan(
        body, carry0, order)
    return {"color": C + T[:, None] * bg[None, :], "depth": D, "final_T": T,
            "normal": Nrm, "extra": Ex, "dist": dist, "med": med}


def test_gradients_match_naive(scene):
    """jax.grad through the tiled/chunked path must equal grads of the naive
    per-gaussian scan implementation."""
    cam, g = scene
    xyz, scales, rots, opac, color, extra = g
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.3, 0.1, 0.0])
    cfg = RasterizeConfig(width=W, height=H, chunk=16, pair_cap=4096,
                          tile_cap=64)
    key = jax.random.PRNGKey(0)
    wc = jax.random.normal(key, (H, W, 3))
    wd = jax.random.normal(key, (H, W))
    we = jax.random.normal(key, (H, W, extra.shape[1]))

    pre = run_preprocess(cam, g)
    order_np = np.argsort(np.asarray(pre.depth), kind="stable")
    rect_min = jnp.asarray(pre.rect_min)
    rect_max = jnp.asarray(pre.rect_max)

    def loss_tiled(xyz_, scales_, rots_, opac_, color_, extra_):
        out = rasterize(xyz_, scales_, rots_, opac_, cm, bg, cfg,
                        colors=color_, extras=extra_)
        b = out.blend
        return (jnp.sum(b.color * wc) + jnp.sum(b.depth * wd)
                + jnp.sum(b.extra * we) + jnp.sum(b.distortion * wd)
                + jnp.sum(b.normal * wc) + jnp.sum(b.median_depth * wd)
                + jnp.sum(b.alpha * wd))

    def loss_naive(xyz_, scales_, rots_, opac_, color_, extra_):
        o = naive_render(xyz_, scales_, rots_, opac_, color_, extra_, cm, bg,
                         rect_min, rect_max, jnp.asarray(order_np))
        shp = lambda x: x.reshape(H, W, *x.shape[1:])
        return (jnp.sum(shp(o["color"]) * wc) + jnp.sum(shp(o["depth"]) * wd)
                + jnp.sum(shp(o["extra"]) * we) + jnp.sum(shp(o["dist"]) * wd)
                + jnp.sum(shp(o["normal"]) * wc) + jnp.sum(shp(o["med"]) * wd)
                + jnp.sum((1 - shp(o["final_T"])) * wd))

    args = tuple(jnp.asarray(a) for a in (xyz, scales, rots, opac, color,
                                          extra))
    v1 = loss_tiled(*args)
    v2 = loss_naive(*args)
    assert np.isclose(float(v1), float(v2), rtol=1e-4), (v1, v2)

    g1 = jax.grad(loss_tiled, argnums=(0, 1, 2, 3, 4, 5))(*args)
    g2 = jax.grad(loss_naive, argnums=(0, 1, 2, 3, 4, 5))(*args)
    names = ["xyz", "scales", "rots", "opac", "color", "extra"]
    for a, b, nm in zip(g1, g2, names):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-6
        assert np.abs(a - b).max() / denom < 2e-3, (
            nm, np.abs(a - b).max(), denom)


def test_finite_difference_probe(scene):
    """Coarse finite-difference check of one opacity gradient."""
    cam, g = scene
    xyz, scales, rots, opac, color, extra = g
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, chunk=16, pair_cap=4096,
                          tile_cap=64)

    def loss(opac_):
        out = rasterize(jnp.asarray(xyz), jnp.asarray(scales),
                        jnp.asarray(rots), opac_, cm, bg, cfg,
                        colors=jnp.asarray(color))
        return jnp.sum(out.blend.color ** 2)

    opac_j = jnp.asarray(opac)
    grad = np.asarray(jax.grad(loss)(opac_j))
    # probe the gaussian with the largest gradient
    i = int(np.argmax(np.abs(grad)))
    eps = 1e-3
    lp = float(loss(opac_j.at[i].add(eps)))
    lm = float(loss(opac_j.at[i].add(-eps)))
    fd = (lp - lm) / (2 * eps)
    assert np.isclose(grad[i], fd, rtol=0.05), (grad[i], fd)


def test_densify_grad_hack(scene):
    """t_offset gradient must equal the blend's direct dL/dT (no AABB chain)."""
    cam, g = scene
    xyz, scales, rots, opac, color, extra = g
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.zeros(3)
    cfg = RasterizeConfig(width=W, height=H, chunk=16, pair_cap=4096,
                          tile_cap=64)

    def loss(t_off):
        out = rasterize(jnp.asarray(xyz), jnp.asarray(scales),
                        jnp.asarray(rots), jnp.asarray(opac), cm, bg, cfg,
                        colors=jnp.asarray(color), t_offset=t_off)
        return jnp.sum(out.blend.color ** 2)

    t0 = jnp.zeros((len(xyz), 3, 3))
    tg = jax.grad(loss)(t0)
    assert np.isfinite(np.asarray(tg)).all()
    assert np.abs(np.asarray(tg)).max() > 0


def test_forward_matches_committed_goldens():
    """Cross-version regression anchor: both rasterizer impls must reproduce
    the committed golden forward outputs (generated by tests/make_goldens.py
    and oracle-validated at generation time). Regenerate ONLY on an
    intentional semantics change."""
    import os

    import jax.numpy as jnp

    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    g = np.load(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "goldens", "forward.npz"))
    W_, H_ = int(g["W"]), int(g["H"])
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.65,
                 image_name="g", width=W_, height=H_)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.1, 0.2, 0.3])
    for impl in ("xla", "pallas"):
        # conic_cull=False: the goldens anchor the unculled pair-list
        # semantics (n_contrib counts EVERY binned slot, dead or not);
        # test_conic_cull_exact separately proves the culled path's float
        # maps are identical and its n_contrib shift is slot-removal only.
        cfg = RasterizeConfig(width=W_, height=H_, chunk=16, pair_cap=8192,
                              tile_cap=256, impl=impl, conic_cull=False)
        out = rasterize(jnp.asarray(g["inputs_xyz"]),
                        jnp.asarray(g["inputs_scales"]),
                        jnp.asarray(g["inputs_rots"]),
                        jnp.asarray(g["inputs_opac"]), cm, bg, cfg,
                        colors=jnp.asarray(g["inputs_color"]),
                        extras=jnp.asarray(g["inputs_extra"]))
        b = out.blend
        for key, got in [("color", b.color), ("depth", b.depth),
                         ("alpha", b.alpha), ("normal", b.normal),
                         ("median_depth", b.median_depth),
                         ("distortion", b.distortion), ("extra", b.extra),
                         ("final_T", b.final_T)]:
            np.testing.assert_allclose(
                np.asarray(got), g[key], atol=2e-5, rtol=1e-4,
                err_msg=f"{impl}:{key} drifted from golden")
        assert np.array_equal(np.asarray(b.n_contrib), g["n_contrib"]), impl


def test_opacity_cull_exact(scene):
    """Opacity-aware tile culling (RasterizeConfig.opacity_cull) must be
    bit-preserving: every pair it removes fails the in-kernel alpha >= 1/255
    mask (forward.cu:386 parity), so forward maps AND gradients match the
    uncull'd render exactly while the (gaussian, tile) pair count drops."""
    cam, g = scene
    xyz, scales, rots, _, color, extra = g
    rng2 = np.random.default_rng(7)
    # heavy low-opacity population (geometry init is 0.1; resets go to 0.01)
    opac = np.concatenate([
        rng2.uniform(0.01, 0.3, xyz.shape[0] - 10),
        rng2.uniform(0.5, 0.95, 10)]).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    outs, pairs = {}, {}
    for cull in (False, True):
        cfg = RasterizeConfig(width=W, height=H, chunk=16, pair_cap=4096,
                              tile_cap=64, opacity_cull=cull)

        def loss(xyz_, scales_, rots_, opac_, color_, extra_):
            o = rasterize(xyz_, scales_, rots_, opac_, cm, bg, cfg,
                          colors=color_, extras=extra_)
            b = o.blend
            s = (jnp.sum(b.color * 0.7) + jnp.sum(b.depth * 0.3)
                 + jnp.sum(b.normal * 0.1) + jnp.sum(b.distortion * 0.2)
                 + jnp.sum(b.extra * 0.05) + jnp.sum(b.alpha))
            return s, o

        (v, o), gr = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4, 5),
                                        has_aux=True)(
            jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(opac), jnp.asarray(color), jnp.asarray(extra))
        assert int(o.n_dropped) == 0
        outs[cull] = (v, o, gr)
        pairs[cull] = int(o.total_pairs)

    v0, o0, g0 = outs[False]
    v1, o1, g1 = outs[True]
    assert pairs[True] < pairs[False], pairs  # culling must actually cull
    assert np.array_equal(np.asarray(o0.radii), np.asarray(o1.radii))
    assert np.array_equal(np.asarray(o0.visible), np.asarray(o1.visible))
    for k in ("color", "depth", "alpha", "normal", "median_depth",
              "distortion", "extra", "final_T"):
        a = np.asarray(getattr(o0.blend, k))
        b = np.asarray(getattr(o1.blend, k))
        assert np.allclose(a, b, atol=1e-6), (k, np.abs(a - b).max())
    assert np.allclose(float(v0), float(v1), atol=1e-6)
    for ga, gb in zip(g0, g1):
        assert np.allclose(np.asarray(ga), np.asarray(gb), atol=1e-5), \
            np.abs(np.asarray(ga) - np.asarray(gb)).max()


def test_conic_cull_exact(scene):
    """Exact conic-vs-tile pair culling (RasterizeConfig.conic_cull /
    preprocess.conic_cull_masks) must be output-preserving: the conic-on
    pair list is a duplicate-free SUBSET of the conic-off list, every
    removed (gaussian, tile) pair fails the in-kernel alpha >= 1/255 mask at
    EVERY pixel of its tile (brute-force min-rho > thr check — the same
    mask as forward.cu:386), and the rendered maps match. Gradients match
    up to chunked-scan reassociation noise (removing a provably-zero entry
    shifts later entries across log-step roll groupings), hence the
    relative tolerance; the subset + deadness assertions are the exactness
    proof."""
    from instascene_tpu.ops.preprocess import FILTER_INV_SQUARE

    cam, g = scene
    xyz, scales, rots, _, color, extra = g
    rng2 = np.random.default_rng(11)
    n = xyz.shape[0]
    opac = np.concatenate([
        rng2.uniform(0.002, 0.05, 20), rng2.uniform(0.05, 0.5, n - 40),
        rng2.uniform(0.5, 0.999, 20)]).astype(np.float32)
    scales = np.exp(rng2.normal(-2.0, 1.0, (n, 2))).astype(np.float32)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    bg = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)

    # 1) pair multisets: conic-on ⊆ conic-off, no duplicates, removed dead
    pre = {}
    for conic in (False, True):
        pre[conic] = preprocess_gaussians(
            jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
            jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
            jnp.asarray(cam.camera_center), W, H, color=jnp.asarray(color),
            opacity=jnp.asarray(opac), conic_cull=conic)

    def pairlist(p):
        b = bin_gaussians(p, W, H, 8192, 1024, layout="padded")
        gx = (W + 15) // 16
        num_tiles = gx * ((H + 15) // 16)
        sg = np.asarray(b.sorted_gid)
        ts = np.asarray(b.tile_start)
        tc = np.asarray(b.tile_count)
        return [(t, int(sg[j])) for t in range(num_tiles)
                for j in range(ts[t], ts[t] + tc[t])]

    on, off = pairlist(pre[True]), pairlist(pre[False])
    assert len(set(on)) == len(on)
    assert set(on) <= set(off)
    removed = set(off) - set(on)
    assert removed, "conic culling removed nothing on this scene"
    T = np.asarray(pre[False].T)
    xyc = np.asarray(pre[False].xy)
    gx = (W + 15) // 16
    for (t, gi) in removed:
        tx0, ty0 = (t % gx) * 16, (t // gx) * 16
        xs, ys = np.meshgrid(np.arange(tx0, tx0 + 16),
                             np.arange(ty0, ty0 + 16))
        A = np.cross(T[gi, 1], T[gi, 2])
        B = np.cross(T[gi, 2], T[gi, 0])
        Cc = np.cross(T[gi, 0], T[gi, 1])
        p0 = xs * A[0] + ys * B[0] + Cc[0]
        p1 = xs * A[1] + ys * B[1] + Cc[1]
        p2 = xs * A[2] + ys * B[2] + Cc[2]
        with np.errstate(divide="ignore", invalid="ignore"):
            rho3 = (p0 / p2) ** 2 + (p1 / p2) ** 2
        rho2 = FILTER_INV_SQUARE * ((xs - xyc[gi, 0]) ** 2
                                    + (ys - xyc[gi, 1]) ** 2)
        rho = np.minimum(np.where(np.isfinite(rho3), rho3, np.inf), rho2)
        thr = 2 * np.log(255.0 * max(float(opac[gi]), 1e-12))
        assert rho.min() > thr, (t, gi, rho.min(), thr)

    # 2) rendered maps + grads on both impls
    for impl in ("xla", "pallas"):
        outs, pairs = {}, {}
        for conic in (False, True):
            cfg = RasterizeConfig(width=W, height=H, chunk=16,
                                  pair_cap=8192, tile_cap=1024, impl=impl,
                                  conic_cull=conic)

            def loss(xyz_, scales_, rots_, opac_, color_, extra_):
                o = rasterize(xyz_, scales_, rots_, opac_, cm, bg, cfg,
                              colors=color_, extras=extra_)
                b = o.blend
                s = (jnp.sum(b.color * 0.7) + jnp.sum(b.depth * 0.3)
                     + jnp.sum(b.normal * 0.1) + jnp.sum(b.distortion * 0.2)
                     + jnp.sum(b.extra * 0.05) + jnp.sum(b.alpha))
                return s, o

            (v, o), gr = jax.value_and_grad(
                loss, argnums=(0, 1, 2, 3, 4, 5), has_aux=True)(
                jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(rots),
                jnp.asarray(opac), jnp.asarray(color), jnp.asarray(extra))
            assert int(o.n_dropped) == 0
            outs[conic] = (v, o, gr)
            pairs[conic] = int(o.total_pairs)
        assert pairs[True] < pairs[False], pairs
        v0, o0, g0 = outs[False]
        v1, o1, g1 = outs[True]
        assert np.array_equal(np.asarray(o0.radii), np.asarray(o1.radii))
        for k in ("color", "depth", "alpha", "normal", "median_depth",
                  "distortion", "extra", "final_T"):
            a = np.asarray(getattr(o0.blend, k))
            b = np.asarray(getattr(o1.blend, k))
            assert np.allclose(a, b, atol=1e-6), (impl, k, np.abs(a - b).max())
        for ga, gb in zip(g0, g1):
            ga, gb = np.asarray(ga), np.asarray(gb)
            assert np.allclose(ga, gb, rtol=1e-3, atol=1e-4), \
                (impl, np.abs(ga - gb).max())

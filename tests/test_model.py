"""GaussianParams model, PLY round-trip, KNN, Adam, densify/prune, losses."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from instascene_tpu.models import densify as dens
from instascene_tpu.models.gaussians import (GaussianParams, compact, combine,
                                             create_from_pcd, crop_mask,
                                             load_ply, save_ply, set_3d_feat)
from instascene_tpu.models.optimizer import (adam_step, geometry_lrs,
                                             init_adam_state, semantic_lrs)
from instascene_tpu.ops.knn import mean_dist2_knn3


def make_params(rng, n=20, cap=32, seg_dim=0):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    d2 = rng.random(n).astype(np.float32) + 0.01
    return create_from_pcd(pts, cols, d2, capacity=cap, seg_feat_dim=seg_dim)


def test_create_from_pcd(rng):
    p = make_params(rng)
    assert p.capacity == 32
    assert int(p.n_alive()) == 20
    assert np.allclose(np.asarray(p.opacity_activated())[:20], 0.1, atol=1e-5)
    assert np.asarray(p.opacity_activated())[20:].max() == 0.0
    assert np.asarray(p.scaling_activated())[20:].max() == 0.0
    r = np.asarray(p.rotation_normalized())[:20]
    assert np.allclose(np.linalg.norm(r, axis=1), 1.0, atol=1e-5)
    assert p.features().shape == (32, 16, 3)


def test_knn_exact(rng):
    pts = rng.normal(size=(150, 3)).astype(np.float32)
    got = np.asarray(mean_dist2_knn3(jnp.asarray(pts), block=64, chunk=64))
    d2 = ((pts[:, None] - pts[None]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    want = np.sort(d2, axis=1)[:, :3].mean(1)
    assert np.allclose(got, want, rtol=1e-4)


def test_ply_roundtrip_gaussians(tmp_path, rng):
    p = make_params(rng, seg_dim=8)
    path = str(tmp_path / "point_cloud.ply")
    save_ply(p, path)
    back = load_ply(path, max_sh_degree=3, seg_feat_dim=8, load_seg_feat=True)
    pc = compact(p)
    for f in ("xyz", "features_dc", "features_rest", "scaling", "rotation",
              "opacity", "seg_feature"):
        a = np.asarray(getattr(pc, f))
        b = np.asarray(getattr(back, f))
        assert np.allclose(a, b, atol=1e-6), f
    assert back.active_sh_degree == 3
    # header/attribute order matches the reference contract
    with open(path, "rb") as f:
        head = f.read(2000).decode("ascii", errors="ignore")
    names = [ln.split()[-1] for ln in head.split("\n")
             if ln.startswith("property")]
    expect = (["x", "y", "z", "nx", "ny", "nz"]
              + [f"f_dc_{i}" for i in range(3)]
              + [f"f_rest_{i}" for i in range(45)]
              + ["opacity", "scale_0", "scale_1"]
              + [f"rot_{i}" for i in range(4)]
              + [f"segfeat_{i}" for i in range(8)])
    assert names == expect


def test_ply_3dgs_export(tmp_path, rng):
    p = make_params(rng)
    path = str(tmp_path / "as3dgs.ply")
    save_ply(p, path, export_as_3dgs=True)
    from instascene_tpu.data.ply import read_ply
    v = read_ply(path)["vertex"]
    assert "scale_2" in v.dtype.names
    assert np.allclose(v["scale_2"], np.log(1e-6), atol=1e-5)


def test_adam_matches_torch(rng):
    """Our Adam must match torch.optim.Adam(eps=1e-15) trajectories."""
    import torch
    p = make_params(rng, n=8, cap=8)
    state = init_adam_state(p)
    lrs = {"xyz": 0.01, "features_dc": 0.002, "features_rest": 0.0001,
           "opacity": 0.05, "scaling": 0.005, "rotation": 0.001,
           "seg_feature": 0.0}
    tx = torch.tensor(np.asarray(p.xyz), requires_grad=True)
    topt = torch.optim.Adam([tx], lr=0.01, eps=1e-15)
    params = p
    for step in range(5):
        g = rng.normal(size=(8, 3)).astype(np.float32)
        grads = p.replace(xyz=jnp.asarray(g))
        zero = jax.tree.map(jnp.zeros_like, params)
        grads = zero.replace(xyz=jnp.asarray(g), alive=params.alive)
        params, state = adam_step(params, grads, state, lrs)
        tx.grad = torch.tensor(g)
        topt.step()
    assert np.allclose(np.asarray(params.xyz), tx.detach().numpy(), atol=1e-6)


def test_densify_clone_split_prune(rng):
    p = make_params(rng, n=10, cap=64)
    # make gaussian 0 small (clone) and gaussian 1 large (split)
    scaling = np.asarray(p.scaling).copy()
    scaling[0] = np.log(0.001)
    scaling[1] = np.log(5.0)
    # gaussian 2: low opacity → prune
    opac = np.asarray(p.opacity).copy()
    opac[2] = -10.0
    p = p.replace(scaling=jnp.asarray(scaling), opacity=jnp.asarray(opac))
    state = init_adam_state(p)
    stats = dens.init_stats(64)
    grad_accum = np.zeros(64, np.float32)
    grad_accum[0] = 1.0  # clone candidate
    grad_accum[1] = 1.0  # split candidate
    denom = np.zeros(64, np.float32)
    denom[:10] = 1.0
    stats = dens.DensifyStats(jnp.asarray(grad_accum), jnp.asarray(denom),
                              jnp.zeros(64))
    key = jax.random.PRNGKey(0)
    # extent=100: ws-prune threshold 10 keeps the scale-3.125 children; the
    # split/clone percent_dense boundary is 1.0
    new_p, new_state, new_stats, overflow = dens.densify_and_prune(
        p, state, stats, key, max_grad=0.5, min_opacity=0.05,
        extent=100.0, max_screen_size=20.0, percent_dense=0.01)
    assert int(overflow) == 0
    # 10 - 1(split parent) - 1(pruned) + 1 clone + 2 split children = 11
    assert int(new_p.n_alive()) == 11
    # split children exist with reduced scale
    alive = np.asarray(new_p.alive)
    scales = np.asarray(new_p.scaling)
    child_scale = np.log(5.0 / 1.6)
    n_children = int(np.isclose(scales[alive, 0], child_scale,
                                atol=1e-4).sum())
    assert n_children == 2
    # stats reset
    assert float(jnp.sum(new_stats.denom)) == 0.0


def test_densify_overflow_and_grow(rng):
    p = make_params(rng, n=10, cap=12)
    state = init_adam_state(p)
    grad_accum = np.ones(12, np.float32)
    denom = np.ones(12, np.float32)
    stats = dens.DensifyStats(jnp.asarray(grad_accum), jnp.asarray(denom),
                              jnp.zeros(12))
    key = jax.random.PRNGKey(0)
    new_p, new_state, new_stats, overflow = dens.densify_and_prune(
        p, state, stats, key, max_grad=0.5, min_opacity=0.01,
        extent=1e9, max_screen_size=0.0, percent_dense=0.01,
        use_screen_size=False)
    # all 10 clone candidates, only 2 dead slots → 8 overflow
    assert int(overflow) == 8
    p2, s2, st2 = dens.grow_capacity(new_p, new_state, new_stats, 64)
    assert p2.capacity == 64
    assert int(p2.n_alive()) == int(new_p.n_alive())
    assert s2.m.xyz.shape[0] == 64


def test_reset_opacity(rng):
    p = make_params(rng, n=5, cap=8)
    state = init_adam_state(p)
    p2, state2 = dens.reset_opacity(p, state)
    o = np.asarray(p2.opacity_activated())[:5]
    assert np.allclose(o, 0.01, atol=1e-5)


def test_crop_and_combine(rng):
    p = make_params(rng, n=10, cap=16, seg_dim=4)
    mask = np.zeros(10, bool)
    mask[:4] = True
    kept = crop_mask(p, mask, "save")
    assert int(kept.n_alive()) == 4
    deleted = crop_mask(p, mask, "delete")
    assert int(deleted.n_alive()) == 6
    both = combine(kept, deleted)
    assert int(both.n_alive()) == 10


def test_set_3d_feat_gram(rng):
    p = make_params(rng, n=12, cap=12)
    masks = np.zeros((12, 3), bool)
    masks[0:4, 0] = True
    masks[4:8, 1] = True
    masks[8:12, 2] = True
    p2, class_feat = set_3d_feat(p, masks, seg_feat_dim=16, gram_feat=True)
    assert class_feat.shape == (3, 16)
    # anchors orthonormal
    G = class_feat @ class_feat.T
    assert np.allclose(G, np.eye(3), atol=1e-5)
    feats = np.asarray(p2.seg_feature)
    assert np.allclose(feats[0], feats[3], atol=1e-6)
    assert not np.allclose(feats[0], feats[4], atol=1e-2)


def test_ssim_matches_torch(rng):
    import torch
    import torch.nn.functional as F
    from instascene_tpu.losses import ssim as ssim_jax
    img1 = rng.random((32, 40, 3)).astype(np.float32)
    img2 = rng.random((32, 40, 3)).astype(np.float32)
    got = float(ssim_jax(jnp.asarray(img1), jnp.asarray(img2)))

    # reference torch SSIM (loss_utils.py:45-83)
    def gaussian(ws, sigma):
        import math
        g = torch.tensor([math.exp(-(x - ws // 2) ** 2 / (2 * sigma ** 2))
                          for x in range(ws)])
        return g / g.sum()

    w1 = gaussian(11, 1.5).unsqueeze(1)
    win = w1.mm(w1.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, 11, 11)
    t1 = torch.tensor(img1).permute(2, 0, 1).unsqueeze(0)
    t2 = torch.tensor(img2).permute(2, 0, 1).unsqueeze(0)
    mu1 = F.conv2d(t1, win, padding=5, groups=3)
    mu2 = F.conv2d(t2, win, padding=5, groups=3)
    s1 = F.conv2d(t1 * t1, win, padding=5, groups=3) - mu1 ** 2
    s2 = F.conv2d(t2 * t2, win, padding=5, groups=3) - mu2 ** 2
    s12 = F.conv2d(t1 * t2, win, padding=5, groups=3) - mu1 * mu2
    c1, c2 = 0.01 ** 2, 0.03 ** 2
    smap = (((2 * mu1 * mu2 + c1) * (2 * s12 + c2))
            / ((mu1 ** 2 + mu2 ** 2 + c1) * (s1 + s2 + c2)))
    want = float(smap.mean())
    assert np.isclose(got, want, atol=1e-5)


def test_checkpoint_roundtrip(tmp_path, rng):
    from instascene_tpu.pipelines.checkpoint import (load_checkpoint,
                                                     save_checkpoint)

    class T:
        pass

    t = T()
    t.params = make_params(rng, n=6, cap=8, seg_dim=4)
    t.opt_state = init_adam_state(t.params)
    t.stats = dens.init_stats(8)
    path = save_checkpoint(t, str(tmp_path), 123)
    params, opt, stats, it = load_checkpoint(path)
    assert it == 123
    assert np.allclose(np.asarray(params.xyz), np.asarray(t.params.xyz))
    assert np.allclose(np.asarray(opt.m.xyz), 0.0)
    assert params.active_sh_degree == t.params.active_sh_degree


def test_crop_pts_with_convexhull():
    """Gaussians inside the convex hull of the prompt points are kept
    (mode='save') or removed (mode='delete'); bbox covers the selection.
    Parity: reference scene/gaussian_model.py:643-658."""
    import numpy as np

    import jax.numpy as jnp

    from instascene_tpu.models.gaussians import (GaussianParams,
                                                 crop_pts_with_convexhull)
    rng = np.random.default_rng(0)
    n = 200
    xyz = rng.uniform(-2, 2, (n, 3)).astype(np.float32)
    p = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.zeros((n, 1, 3)), features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.zeros((n, 2)), rotation=jnp.zeros((n, 4)),
        opacity=jnp.zeros((n, 1)), alive=jnp.ones(n, bool),
        seg_feature=None, active_sh_degree=0, max_sh_degree=3)
    # hull = unit cube corners
    cube = np.array([[x, y, z] for x in (-1, 1) for y in (-1, 1)
                     for z in (-1, 1)], np.float64)
    inside_true = (np.abs(xyz) <= 1.0).all(axis=1)

    saved, bbox = crop_pts_with_convexhull(p, cube, mode="save",
                                           return_bbox=True)
    assert int(saved.n_alive()) == int(inside_true.sum()) > 0
    kept = np.asarray(saved.xyz)[np.asarray(saved.alive)]
    assert (np.abs(kept) <= 1.0 + 1e-5).all()
    center, rot, extent = bbox
    assert (extent <= 2.0 + 1e-5).all()

    deleted = crop_pts_with_convexhull(p, cube, mode="delete")
    assert int(deleted.n_alive()) == n - int(inside_true.sum())
    left = np.asarray(deleted.xyz)[np.asarray(deleted.alive)]
    assert (np.abs(left) > 1.0).any(axis=1).all()

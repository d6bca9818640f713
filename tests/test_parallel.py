"""Multi-device (8 virtual CPU) sharding tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_device_count():
    assert len(jax.devices()) >= 8, "conftest should force 8 virtual devices"


def test_sharded_knn_matches_local(rng):
    from instascene_tpu.ops.knn import mean_dist2_knn3
    from instascene_tpu.parallel.data_parallel import make_mesh
    from instascene_tpu.parallel.sharding import sharded_mean_dist2_knn3
    pts = rng.normal(size=(200, 3)).astype(np.float32)
    mesh = make_mesh(8)
    got = np.asarray(sharded_mean_dist2_knn3(jnp.asarray(pts), mesh))
    want = np.asarray(mean_dist2_knn3(jnp.asarray(pts), block=64, chunk=64))
    assert np.allclose(got, want, rtol=1e-4)


def test_sharded_render_matches_single(rng):
    """8-way tile-slab sharded render must reproduce the single-device frame
    exactly (each device renders its own horizontal slab; the slab offset is
    folded into the splat homography)."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.models.gaussians import GaussianParams
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    from instascene_tpu.parallel.data_parallel import make_mesh
    from instascene_tpu.parallel.render_sharded import build_sharded_render
    from instascene_tpu.utils.general import inverse_sigmoid

    W8, H8 = 64, 8 * 16   # one 16px tile row per device
    pos = np.array([0.0, -3.5, 1.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.9,
                 image_name="t", width=W8, height=H8)
    n = 60
    params = GaussianParams(
        xyz=jnp.asarray(rng.normal(0, 0.6, (n, 3)).astype(np.float32)),
        features_dc=jnp.asarray(rng.normal(0, 0.3, (n, 1, 3)
                                           ).astype(np.float32)),
        features_rest=jnp.zeros((n, 15, 3)),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        scaling=jnp.asarray(rng.normal(-1.8, 0.3, (n, 2)).astype(np.float32)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.7))),
        alive=jnp.ones(n, bool),
        seg_feature=jnp.asarray(rng.random((n, 4)).astype(np.float32)))
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cfg = RasterizeConfig(width=W8, height=H8, pair_cap=16384, tile_cap=512)
    want = rasterize(params.xyz, params.scaling_activated(),
                     params.rotation_normalized(),
                     params.opacity_activated()[:, 0], cm, jnp.zeros(3),
                     cfg, shs=params.features(), sh_degree=3,
                     extras=params.seg_feature_normed())

    mesh = make_mesh(8)
    fn = build_sharded_render(mesh, W8, H8, pair_cap=16384, n_extra=4)
    color, alpha, extra, nd = fn(
        params.xyz, params.scaling_activated(),
        params.rotation_normalized(), params.opacity_activated()[:, 0],
        params.features(), params.seg_feature_normed(),
        cm.w2v, cm.full_proj, cm.campos, jnp.zeros(3))
    assert int(np.max(np.asarray(nd))) == 0
    assert np.allclose(np.asarray(color), np.asarray(want.blend.color),
                       atol=1e-5)
    assert np.allclose(np.asarray(alpha), np.asarray(want.blend.alpha),
                       atol=1e-5)
    assert np.allclose(np.asarray(extra), np.asarray(want.blend.extra),
                       atol=1e-5)


def test_dp_train_step_runs_and_matches_single(rng):
    """The 8-way DP step must run and produce grads equal to the mean of
    per-camera single-device grads (up to Adam determinism)."""
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_graft_entry_compiles():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(img)).all()


def test_dp_semantic_step_8way(rng):
    """Camera-sharded contrastive step over the 8-device mesh: shared
    features get pmean'd gradients; loss finite; features move."""
    import jax
    import jax.numpy as jnp

    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.models.gaussians import create_from_pcd
    from instascene_tpu.models.optimizer import init_adam_state
    from instascene_tpu.ops.knn import mean_dist2_knn3
    from instascene_tpu.ops.rasterize import RasterizeConfig
    from instascene_tpu.parallel.data_parallel import (build_dp_semantic_step,
                                                       make_mesh)
    from instascene_tpu.pipelines.train import camera_tensors

    n_dev = len(jax.devices())
    width, height = 32, 32
    pts = rng.normal(0, 0.5, (96, 3)).astype(np.float32)
    cols = rng.random((96, 3)).astype(np.float32)
    d2 = np.asarray(mean_dist2_knn3(jnp.asarray(pts)))
    params = create_from_pcd(pts, cols, d2, capacity=128)
    cams = []
    for i in range(n_dev):
        ang = 2 * np.pi * i / max(n_dev, 1)
        pos = np.array([3.0 * np.cos(ang), 3.0 * np.sin(ang), 1.0])
        R_w2c, t = look_at(pos, np.zeros(3))
        cams.append(camera_tensors(Camera(
            uid=i, colmap_id=i, R=R_w2c.T, T=t, fovx=0.9, fovy=0.9,
            image_name=str(i), width=width, height=height)))
    rng = np.random.default_rng(3)
    params = params.replace(
        seg_feature=jnp.asarray(rng.random((params.capacity, 8)
                                           ).astype(np.float32)))
    opt_state = init_adam_state(params)
    mesh = make_mesh(n_dev)
    cfg = RasterizeConfig(width=width, height=height, chunk=16,
                          pair_cap=8192, tile_cap=64, bwd_extras_only=True)
    step = build_dp_semantic_step(cfg, mesh, batch=256, max_labels=16,
                                  has_class_feat=True,
                                  consider_negative=True)
    keys = jax.random.split(jax.random.PRNGKey(0), n_dev)
    segmaps = jnp.asarray(rng.integers(0, 8, (n_dev, height, width)
                                       ).astype(np.int32))
    lab3d = jnp.asarray(rng.integers(0, 8, params.capacity).astype(np.int32))
    cfeat = jnp.asarray(rng.random((16, 8)).astype(np.float32))
    dummy_b = jnp.zeros((n_dev, 1), jnp.int32)
    w2v = jnp.stack([c.w2v for c in cams])[:n_dev]
    fp = jnp.stack([c.full_proj for c in cams])[:n_dev]
    cp = jnp.stack([c.campos for c in cams])[:n_dev]
    p2, o2, loss = step(params, opt_state, keys, w2v, fp, cp, segmaps,
                        segmaps, lab3d, cfeat, jnp.zeros(3),
                        jnp.float32(2.5e-3), jnp.zeros(1),
                        dummy_b, dummy_b, dummy_b)
    assert np.isfinite(float(loss))
    moved = float(jnp.abs(p2.seg_feature - params.seg_feature).max())
    assert moved > 0


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_dp_geometry_trainer_e2e(tmp_path):
    """train.py --dp 8 as a product capability: the GeometryTrainer drives
    the full DP step (complete loss structure, densify/prune + capacity
    growth under DP) on the 8-CPU mesh and PSNR improves."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scene_builder import build_e2e_scene

    from instascene_tpu.config import (ModelParams, OptimizationParams,
                                       PipelineParams)
    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.train import GeometryTrainer

    src = str(tmp_path / "parent" / "scene")
    build_e2e_scene(src, width=64, height=48, n_cams=8)
    dataset = ModelParams(source_path=src, sh_degree=3)
    opt = OptimizationParams(
        iterations=40, densify_from_iter=10, densification_interval=15,
        densify_until_iter=40, opacity_reset_interval=10_000,
        position_lr_max_steps=40)
    pipe = PipelineParams()
    scene = Scene(dataset, output_root=str(tmp_path / "out"))
    tr = GeometryTrainer(dataset, opt, pipe, scene, dp=8,
                         rasterize_opts={"chunk": 16, "pair_cap": 65536,
                                         "tile_cap": 256})
    before = tr.evaluate([0, 2, 4])
    for it in range(1, 41):
        m = tr.step(it)
        assert np.isfinite(float(m["loss"]))
    after = tr.evaluate([0, 2, 4])
    # 40 DP iterations = 320 camera-gradient evaluations
    assert after["psnr"] > before["psnr"] + 2.0, (before, after)


@pytest.mark.slow  # >45s single-core; out of the fast gate
def test_dp_cli_flag(tmp_path):
    """`train.py --dp 8` end-to-end through the CLI entry point."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from scene_builder import build_e2e_scene
    src = str(tmp_path / "parent" / "scene")
    build_e2e_scene(src, width=64, height=48, n_cams=8)
    import train as train_cli
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_cli.main(["-s", src, "--iterations", "12", "--dp", "8",
                        "--test_iterations", "12", "--save_iterations", "12",
                        "--disable_viewer", "--quiet"])
    finally:
        os.chdir(cwd)
    out = tmp_path / "output" / "parent" / "scene"
    assert (out / "point_cloud" / "iteration_12" / "point_cloud.ply").exists()

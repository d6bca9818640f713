"""End-to-end training tests on a miniature synthetic scene (CPU)."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scene_builder import build_e2e_scene

from instascene_tpu.config import (ModelParams, OptimizationParams,
                                   PipelineParams)


@pytest.fixture(scope="module")
def e2e_scene(tmp_path_factory):
    d = tmp_path_factory.mktemp("data") / "parent" / "scene"
    params, labels, cams = build_e2e_scene(str(d))
    return str(d), params, labels


def test_geometry_training_improves_psnr(e2e_scene, tmp_path):
    src, true_params, _ = e2e_scene
    dataset = ModelParams(source_path=src, sh_degree=3)
    opt = OptimizationParams(
        iterations=120, densify_from_iter=30, densification_interval=40,
        densify_until_iter=120, opacity_reset_interval=10_000,
        position_lr_max_steps=120)
    pipe = PipelineParams()

    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.train import GeometryTrainer
    scene = Scene(dataset, output_root=str(tmp_path / "out"))
    trainer = GeometryTrainer(
        dataset, opt, pipe, scene,
        rasterize_opts={"chunk": 16, "pair_cap": 65536, "tile_cap": 256})
    before = trainer.evaluate([0, 2, 4])
    for it in range(1, 121):
        m = trainer.step(it)
    after = trainer.evaluate([0, 2, 4])
    assert np.isfinite(after["psnr"])
    assert after["psnr"] > before["psnr"] + 3.0, (before, after)
    # save + reload round trip
    path = trainer.save(120)
    assert os.path.exists(path)
    from instascene_tpu.models.gaussians import load_ply
    back = load_ply(path)
    assert int(back.n_alive()) == int(trainer.params.n_alive())


def test_geometry_training_pallas_densify(e2e_scene, tmp_path):
    """Densification + opacity reset through the PALLAS kernels (interpret
    mode): the combination that silently produced NaN losses on TPU in
    round 2 (garbage rows of never-visited tiles after a slack overflow).
    Asserts growth, finite losses at every step, and a finite eval."""
    src, *_ = e2e_scene
    dataset = ModelParams(source_path=src, sh_degree=3)
    opt = OptimizationParams(
        iterations=60, densify_from_iter=15, densification_interval=20,
        densify_until_iter=60, opacity_reset_interval=50,
        position_lr_max_steps=60)
    pipe = PipelineParams()
    pipe.rasterizer_impl = "pallas"

    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.train import GeometryTrainer
    scene = Scene(dataset, output_root=str(tmp_path / "out"))
    trainer = GeometryTrainer(
        dataset, opt, pipe, scene,
        rasterize_opts={"pair_cap": 65536, "tile_cap": 256,
                        "impl": "pallas"})
    n0 = int(trainer.params.n_alive())
    for it in range(1, 61):
        m = trainer.step(it)
        assert np.isfinite(float(m["loss"])), f"NaN loss at iter {it}"
    assert int(trainer.params.n_alive()) > n0, "densification never grew"
    after = trainer.evaluate([0, 2])
    assert np.isfinite(after["psnr"])


def test_checkpoint_resume(e2e_scene, tmp_path):
    src, *_ = e2e_scene
    dataset = ModelParams(source_path=src, sh_degree=3)
    opt = OptimizationParams(iterations=20, densify_from_iter=1000,
                             position_lr_max_steps=20)
    pipe = PipelineParams()
    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.checkpoint import (load_checkpoint,
                                                     save_checkpoint)
    from instascene_tpu.pipelines.train import GeometryTrainer
    scene = Scene(dataset, output_root=str(tmp_path / "out"))
    tr = GeometryTrainer(dataset, opt, pipe, scene,
                         rasterize_opts={"chunk": 16, "pair_cap": 65536,
                                         "tile_cap": 256})
    for it in range(1, 6):
        tr.step(it, cam_idx=it % 4)
    ck = save_checkpoint(tr, str(tmp_path), 5)
    params, opt_state, stats, it0 = load_checkpoint(ck)
    assert it0 == 5
    assert np.allclose(np.asarray(params.xyz), np.asarray(tr.params.xyz))
    assert np.allclose(np.asarray(opt_state.m.xyz),
                       np.asarray(tr.opt_state.m.xyz))


def test_semantic_pipeline_e2e(e2e_scene, tmp_path):
    """Full semantic stage on the synthetic 3-instance scene: spatial-track
    priors + short contrastive training must separate instance features."""
    src, true_params, labels = e2e_scene
    dataset = ModelParams(source_path=src, use_seg_feature=True,
                          seg_feat_dim=16)
    opt = OptimizationParams(iterations=30, sample_batchsize=2048,
                             gram_feat_3d=True, consider_negative_labels=True)
    pipe = PipelineParams()

    from instascene_tpu.pipelines.train_semantic import SegSplatting
    seg = SegSplatting(dataset, opt, pipe,
                       output_root=str(tmp_path / "out"))
    seg.robust_semantic_priors()

    # priors must roughly recover the 3 instances
    m3d = seg.seg3d_masks
    assert m3d.shape[1] >= 2, "expected at least 2 instances from clustering"
    # each discovered instance should be dominated by one true label
    pure = 0
    for k in range(m3d.shape[1]):
        ids = np.nonzero(m3d[:, k])[0]
        if len(ids) == 0:
            continue
        true = labels[ids]
        counts = np.bincount(true, minlength=4)
        if counts.max() / max(len(ids), 1) > 0.8:
            pure += 1
    assert pure >= 2, "discovered instances not pure"

    seg.train_segfeat(iterations=30, progress=False, save_every=10_000)

    # tile-subsampled multi-view variant must drive the same loop (12-tile
    # grid at 64x48; select 6/view; aligned cache => pallas impl) and keep
    # features finite
    seg.opt.mv_tile_subsample = 6
    seg.pipe.rasterizer_impl = "pallas"
    if hasattr(seg, "binning_cache"):
        del seg.binning_cache   # force aligned-layout rebuild
    seg.train_segfeat(iterations=10, progress=False, save_every=10_000)
    # no silent caps: the tile-subsample chunk budget (K*8 chunks) must not
    # truncate at default caps on this scene — the counter is threaded out
    # of the jitted step precisely so this is checkable
    assert seg.mv_trunc_total == 0
    # tiny-scene MV window: more requested MV frames than cameras must
    # clamp (reference crashes here, train_semantic.py:148) — the window
    # shrinks to the full camera list instead
    seg.opt.sample_mv_frames = 12      # > the scene's 8 cameras
    seg.train_segfeat(iterations=10, progress=False, save_every=10_000)
    seg.opt.sample_mv_frames = 5
    seg.opt.mv_tile_subsample = 0
    seg.pipe.rasterizer_impl = "auto"
    del seg.binning_cache
    assert np.isfinite(np.asarray(seg.params.seg_feature)).all()

    # features of same-instance gaussians should be closer than cross-instance
    import jax.numpy as jnp
    feats = np.asarray(seg.params.seg_feature_normed())[:len(labels)]
    sims_intra, sims_inter = [], []
    rng = np.random.default_rng(0)
    for _ in range(300):
        i, j = rng.integers(0, len(labels), 2)
        s = float(feats[i] @ feats[j])
        (sims_intra if labels[i] == labels[j] else sims_inter).append(s)
    assert np.mean(sims_intra) > np.mean(sims_inter) + 0.1

    # tracked quality number: 3D instance mIoU of the spatial-track priors vs
    # synthetic ground truth (Hungarian-matched; VERDICT r1 #6). Printed so
    # the round-over-round value is visible in CI logs.
    from instascene_tpu.semantic.metrics import instance_miou
    pred = np.where(m3d.any(axis=1), seg.seg3d_labels + 1, 0)
    miou = instance_miou(pred, labels, ignore_label=0)
    print(f"\n[e2e] 3D instance mIoU (priors vs GT): {miou:.3f}")
    assert miou > 0.5, f"prior instance mIoU regressed: {miou:.3f}"

    # render_views export: per-view segfeat npy+png and instance segmask png
    seg.render_views(save_mask=True, view_idx=(0, 1))
    rdir = os.path.join(seg.model_path, "render")
    name0 = seg.cam_objs[0].image_name
    assert os.path.exists(os.path.join(rdir, "segfeat", f"{name0}.npy"))
    assert os.path.exists(os.path.join(rdir, "segfeat", f"{name0}.png"))
    assert os.path.exists(os.path.join(rdir, "segmask", f"{name0}.png"))

    # mask_sorted / output_dict files written
    assert os.path.exists(os.path.join(src, "sam/mask_sorted"))
    # instance export runs
    seg.export_segment_results(30, use_hdbscan=True, note="test_export")
    out_dir = os.path.join(seg.model_path, "point_cloud", "test_export")
    assert os.path.exists(os.path.join(out_dir, "point_cloud_labels.ply"))


def test_eval_split_training_report(e2e_scene, tmp_path, capsys):
    """--eval every-8th holdout: the trainer must carry a disjoint test split
    and training_report must evaluate BOTH configs (reference train.py:222-279:
    'test' = all held-out cameras, 'train' = indices 5,10,..25 mod n)."""
    src, *_ = e2e_scene
    dataset = ModelParams(source_path=src, sh_degree=3, eval=True)
    opt = OptimizationParams(iterations=10, densify_from_iter=1000,
                             position_lr_max_steps=10)
    pipe = PipelineParams()
    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.train import GeometryTrainer
    scene = Scene(dataset, output_root=str(tmp_path / "out"))
    n_total = len(scene.scene_info.train_cameras) + len(
        scene.scene_info.test_cameras)
    assert len(scene.scene_info.test_cameras) == (n_total + 7) // 8
    train_names = {c.image_name for c in scene.scene_info.train_cameras}
    test_names = {c.image_name for c in scene.scene_info.test_cameras}
    assert not (train_names & test_names)

    tr = GeometryTrainer(dataset, opt, pipe, scene,
                         rasterize_opts={"chunk": 16, "pair_cap": 65536,
                                         "tile_cap": 256})
    assert len(tr.test_cams) == len(scene.scene_info.test_cameras) > 0
    for it in range(1, 4):
        tr.step(it)
    res = tr.training_report(None, 3, is_first_test_iter=True)
    assert "test" in res and "train" in res
    assert np.isfinite(res["test"]["psnr"]) and res["test"]["psnr"] > 5.0
    out = capsys.readouterr().out
    assert "Evaluating test" in out and "Evaluating train" in out


def test_semantic_dp_training(e2e_scene, tmp_path):
    """train_semantic --dp 8: the DP contrastive loop (full single-view + 3D
    loss, cached binning, csums) runs on the 8-CPU mesh and separates
    instance features."""
    src, _, labels = e2e_scene
    dataset = ModelParams(source_path=src, use_seg_feature=True,
                          seg_feat_dim=16)
    opt = OptimizationParams(iterations=20, sample_batchsize=2048,
                             gram_feat_3d=True, consider_negative_labels=True)
    pipe = PipelineParams()
    from instascene_tpu.pipelines.train_semantic import SegSplatting
    seg = SegSplatting(dataset, opt, pipe, output_root=str(tmp_path / "out"),
                       dp=8)
    seg.robust_semantic_priors()
    seg.train_segfeat(iterations=20, progress=False, save_every=10_000)
    feats = np.asarray(seg.params.seg_feature_normed())[:len(labels)]
    sims_intra, sims_inter = [], []
    rng = np.random.default_rng(0)
    for _ in range(300):
        i, j = rng.integers(0, len(labels), 2)
        s = float(feats[i] @ feats[j])
        (sims_intra if labels[i] == labels[j] else sims_inter).append(s)
    assert np.mean(sims_intra) > np.mean(sims_inter) + 0.05


def test_eval_scene_protocol(tmp_path):
    """scripts/eval_scene.py — the one-command parity-table protocol — on the
    deterministic synthetic standard scene (VERDICT r2 item 6). Asserts the
    round-over-round PSNR band and that the semantic half reports mIoU.

    Round-over-round band history (do not lower without cause):
      r3: train_psnr >= 20.5 @ 100 iters, instance_miou >= 0.5
    """
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import eval_scene

    src = str(tmp_path / "parent" / "standard_scene")
    params, labels, _ = build_e2e_scene(src, seed=0)
    np.save(str(tmp_path / "labels.npy"), labels)

    # geometry half: fresh training from the SfM points, eval split
    res = eval_scene.main(["-s", src, "-m", str(tmp_path / "runA"),
                           "--geometry_iters", "100", "--skip_semantic"])
    assert res["train_psnr"] >= 20.5, res
    assert "test_psnr" in res and res["geometry_its"] > 0
    assert os.path.exists(os.path.join(src, "point_cloud.ply"))

    # semantic half: pretrained (ground-truth) ply + GT instance labels
    src2 = str(tmp_path / "parent2" / "standard_scene")
    build_e2e_scene(src2, seed=0)
    res2 = eval_scene.main(["-s", src2, "-m", str(tmp_path / "runB"),
                            "--skip_geometry", "--semantic_iters", "20",
                            "--sample_batchsize", "2048",
                            "--gt_instances", str(tmp_path / "labels.npy")])
    assert res2["instance_miou"] >= 0.5, res2
    assert res2["semantic_its"] > 0 and res2["n_instances"] >= 2

"""Camera paths, video export, viewer image maps."""

import os
import sys

import numpy as np
import pytest

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def test_ellipse_path_and_minicams():
    from instascene_tpu.viewer.render_paths import (generate_ellipse_path,
                                                    path_to_minicams)
    rng = np.random.default_rng(0)
    # a ring of c2w poses looking inward
    from instascene_tpu.data.synthetic import look_at
    poses = []
    for i in range(12):
        ang = 2 * np.pi * i / 12
        pos = np.array([3 * np.cos(ang), 3 * np.sin(ang), 1.0])
        R_w2c, t = look_at(pos, np.zeros(3))
        c2w = np.eye(4)
        c2w[:3, :3] = R_w2c.T
        c2w[:3, 3] = pos
        poses.append(c2w[:3])
    poses = np.stack(poses)
    path = generate_ellipse_path(poses, n_frames=24)
    assert path.shape == (24, 3, 4)
    assert np.isfinite(path).all()
    cams = path_to_minicams(path, 64, 48, 0.9, 0.7)
    assert len(cams) == 24
    assert np.isfinite(cams[0].full_proj).all()


def test_focus_point_and_pca_recenter():
    """focus_point_fn minimizes summed ray distance; transform_poses_pca
    recenters into the unit cube with a consistent [4,4] transform."""
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.viewer.render_paths import (focus_point_fn, pad_poses,
                                                    transform_poses_pca)
    poses = []
    for i in range(12):
        ang = 2 * np.pi * i / 12
        pos = np.array([3 * np.cos(ang), 3 * np.sin(ang), 1.0])
        R_w2c, t = look_at(pos, np.zeros(3))
        c2w = np.eye(4)
        c2w[:3, :3] = R_w2c.T
        c2w[:3, 3] = pos
        poses.append(c2w[:3])
    poses = np.stack(poses)
    # all optical axes pass through the origin -> focus point is the origin
    assert np.allclose(focus_point_fn(poses), 0.0, atol=1e-8)
    rec, T = transform_poses_pca(poses)
    assert np.abs(rec[:, :3, 3]).max() <= 1.0 + 1e-9
    # transform really maps input poses onto the recentered ones
    assert np.allclose(rec, (T @ pad_poses(poses))[:, :3], atol=1e-9)
    # average camera up ends with a positive world-z component
    assert rec[:, :3, 1].mean(axis=0)[2] > 0


def test_render_video(tmp_path):
    from scene_builder import make_blob_gaussians

    from instascene_tpu.config import PipelineParams
    from instascene_tpu.viewer.gui import OrbitCamera
    from instascene_tpu.viewer.render_paths import render_video
    params, _ = make_blob_gaussians(n_per=20)
    cams = [OrbitCamera(48, 32, r=4.0).minicam() for _ in range(2)]
    out = render_video(params, PipelineParams(), cams,
                       str(tmp_path / "out.mp4"), fps=2)
    assert os.path.getsize(out) > 500


def test_render_net_image_modes():
    from instascene_tpu.utils.image import mask_to_rgb, render_net_image
    h, w = 16, 24
    pkg = {"render": np.random.rand(h, w, 3).astype(np.float32),
           "rend_alpha": np.random.rand(h, w, 1).astype(np.float32),
           "rend_normal": np.random.rand(h, w, 3).astype(np.float32) * 2 - 1,
           "surf_depth": np.random.rand(h, w, 1).astype(np.float32)}
    for mode in ("RGB", "Alpha", "Normal", "Depth", "Edge"):
        img = render_net_image(pkg, ["RGB"], mode, None)
        assert img.shape == (h, w, 3), mode
        assert img.min() >= 0 and img.max() <= 1
    m = mask_to_rgb(np.array([[0, 1], [2, 3]]))
    assert m.shape == (2, 2, 3) and m.dtype == np.uint8


def test_mesh_normal_prior():
    """mesh_normal_prior returns unit normals + validity mask for a plane."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.ops.mesh_raster import mesh_normal_prior
    pos = np.array([0.0, 0.0, -3.0])
    R_w2c, t = look_at(pos, np.zeros(3))
    cam = Camera(uid=0, colmap_id=0, R=R_w2c.T, T=t, fovx=0.9, fovy=0.7,
                 image_name="t", width=32, height=24)
    verts = np.array([[-2, -2, 0], [2, -2, 0], [2, 2, 0], [-2, 2, 0]],
                     np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    normal, mask = mesh_normal_prior(cam, verts, faces)
    assert normal.shape == (24, 32, 3)
    assert mask.sum() > 100
    n_hit = normal[mask]
    assert np.allclose(np.abs(n_hit[:, 2]), 1.0, atol=1e-4)

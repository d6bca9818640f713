"""Mesh stack tests: marching tetrahedra, TSDF fusion, post-processing."""

import numpy as np
import pytest

from instascene_tpu.mesh.extractor import post_process_mesh, write_mesh_ply
from instascene_tpu.mesh.marching import marching_tetrahedra
from instascene_tpu.mesh.tsdf import tsdf_fusion_mesh


def sphere_field(n=32, r=0.6):
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), -1)
    return np.linalg.norm(g, axis=-1) - r, xs


def test_marching_tetrahedra_sphere():
    field, xs = sphere_field()
    spacing = xs[1] - xs[0]
    verts, faces = marching_tetrahedra(field, 0.0, origin=(-1, -1, -1),
                                       spacing=spacing)
    assert len(verts) > 200
    assert len(faces) > 200
    rad = np.linalg.norm(verts, axis=1)
    assert abs(rad.mean() - 0.6) < 0.03
    assert rad.std() < 0.03
    assert faces.max() < len(verts)
    # faces reference valid verts and are non-degenerate
    assert (faces[:, 0] != faces[:, 1]).all()


def test_marching_empty():
    field = np.ones((8, 8, 8))
    verts, faces = marching_tetrahedra(field)
    assert len(verts) == 0 and len(faces) == 0


def test_post_process_mesh():
    # two disconnected triangles clusters: big (2 faces) and small (1 face)
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                      [5, 5, 5], [6, 5, 5], [5, 6, 5]], float)
    faces = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]], np.int32)
    v2, f2, _ = post_process_mesh(verts, faces, cluster_to_keep=1)
    assert len(f2) == 2
    assert len(v2) == 4


def test_tsdf_fusion_sphere(tmp_path):
    """Fuse synthetic depth maps of a sphere seen from a ring of cameras."""
    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    r_sphere = 0.6
    H = W = 64
    depths, rgbs, w2cs, intrs = [], [], [], []
    for i in range(8):
        ang = 2 * np.pi * i / 8
        pos = np.array([2.5 * np.cos(ang), 2.5 * np.sin(ang), 0.8])
        R_w2c, t = look_at(pos, np.zeros(3))
        cam = Camera(uid=i, colmap_id=i, R=R_w2c.T, T=t, fovx=0.8, fovy=0.8,
                     image_name=str(i), width=W, height=H)
        fx, fy = cam.focal_x, cam.focal_y
        cx, cy = W / 2, H / 2
        ys, xs = np.mgrid[0:H, 0:W]
        d_cam = np.stack([(xs - cx) / fx, (ys - cy) / fy, np.ones_like(xs)],
                         -1)
        dirs = d_cam / np.linalg.norm(d_cam, axis=-1, keepdims=True)
        dirs_w = dirs @ cam.c2w[:3, :3].T
        o = cam.camera_center
        # ray-sphere intersection
        b = 2 * dirs_w @ o
        c = o @ o - r_sphere ** 2
        disc = b ** 2 - 4 * c
        hit = disc > 0
        t_hit = (-b - np.sqrt(np.maximum(disc, 0))) / 2
        z = np.where(hit & (t_hit > 0), t_hit * dirs[..., 2] /
                     np.linalg.norm(d_cam, axis=-1) ** 0, 0.0)
        # depth map convention: z = view-space z = t * dirs_cam_z/|d_cam|...
        # dirs normalized world; view z = t_hit * (unit dir view z)
        zv = t_hit * dirs[..., 2]
        depth = np.where(hit & (t_hit > 0), zv, 0.0).astype(np.float32)
        depths.append(depth)
        rgbs.append(np.ones((H, W, 3), np.float32) * 0.5)
        w2cs.append(cam.w2c)
        intrs.append(np.array([fx, fy, cx, cy], np.float32))

    verts, faces, cols = tsdf_fusion_mesh(
        depths, rgbs, w2cs, intrs, voxel_size=0.05, sdf_trunc=0.15,
        depth_trunc=5.0)
    assert len(verts) > 100
    rad = np.linalg.norm(verts, axis=1)
    # fused surface should sit near the sphere radius
    assert abs(np.median(rad) - r_sphere) < 0.08
    path = str(tmp_path / "mesh.ply")
    write_mesh_ply(path, verts, faces, cols)
    assert np.fromfile(path, dtype=np.uint8).size > 1000

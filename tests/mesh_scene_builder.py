"""Independent-GT synthetic scene: triangle meshes rendered by the tile
z-buffer rasterizer (ops/mesh_raster.py) with Lambertian shading.

Unlike tests/scene_builder.py (whose GT images come from the repo's own
2DGS rasterizer — self-referential: a shared forward bias would cancel),
this scene's image formation never touches the gaussian blend path:
flat-shaded triangle meshes + an analytic lighting model. Training against
it is the in-environment proxy for "train on photographs" (the reference
trains on real photos, train.py:57-104 — its GT never comes from its own
renderer).

Scene: ground plane + cube + octahedron + tetrahedron, distinct colors,
two directional lights + ambient. COLMAP layout on disk (cameras/images/
points3D.bin + images/ + sam/mask segmaps from face ids).
"""

import os

import numpy as np

import jax.numpy as jnp

from instascene_tpu.cameras import Camera
from instascene_tpu.data.synthetic import look_at
from instascene_tpu.ops.mesh_raster import rasterize_mesh


def _cube(center, size):
    c = np.asarray(center, np.float64)
    h = size / 2.0
    v = np.array([[x, y, z] for x in (-h, h) for y in (-h, h)
                  for z in (-h, h)]) + c
    f = np.array([[0, 1, 3], [0, 3, 2], [4, 6, 7], [4, 7, 5],
                  [0, 4, 5], [0, 5, 1], [2, 3, 7], [2, 7, 6],
                  [0, 2, 6], [0, 6, 4], [1, 5, 7], [1, 7, 3]])
    return v, f


def _octahedron(center, r):
    c = np.asarray(center, np.float64)
    v = np.array([[r, 0, 0], [-r, 0, 0], [0, r, 0], [0, -r, 0],
                  [0, 0, r], [0, 0, -r]]) + c
    f = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                  [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    return v, f


def _tetrahedron(center, r):
    c = np.asarray(center, np.float64)
    v = np.array([[1, 1, 1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]],
                 np.float64) * (r / np.sqrt(3.0)) + c
    f = np.array([[0, 1, 2], [0, 3, 1], [0, 2, 3], [1, 3, 2]])
    return v, f


def make_mesh_world(ground_ext=2.4, ground_z=-0.6):
    """Vertices/faces/per-face object label (0=ground, 1..3=objects) and
    per-object albedo."""
    g = ground_ext
    verts = [np.array([[-g, -g, ground_z], [g, -g, ground_z],
                       [g, g, ground_z], [-g, g, ground_z]])]
    faces = [np.array([[0, 1, 2], [0, 2, 3]])]
    labels = [np.zeros(2, np.int32)]
    objs = [(_cube((-0.8, 0.0, -0.1), 1.0), 1),
            (_octahedron((0.85, 0.35, 0.1), 0.7), 2),
            (_tetrahedron((0.0, -0.95, 0.0), 0.65), 3)]
    off = 4
    for (v, f), lab in objs:
        verts.append(v)
        faces.append(f + off)
        labels.append(np.full(len(f), lab, np.int32))
        off += len(v)
    albedo = np.array([[0.62, 0.60, 0.58],     # ground
                       [0.85, 0.20, 0.15],     # cube
                       [0.15, 0.75, 0.25],     # octahedron
                       [0.20, 0.30, 0.88]])    # tetrahedron
    return (np.concatenate(verts).astype(np.float32),
            np.concatenate(faces).astype(np.int32),
            np.concatenate(labels), albedo)


_LIGHTS = np.array([[0.4, 0.25, 0.88], [-0.6, -0.5, 0.35]])
_LIGHTS = _LIGHTS / np.linalg.norm(_LIGHTS, axis=1, keepdims=True)
_L_W = np.array([0.55, 0.25])
_AMBIENT = 0.30


def render_mesh_gt(cam: Camera, verts, faces, face_obj, albedo,
                   bg=np.zeros(3)):
    """(rgb [H,W,3] f32, segmap [H,W] int32) — Lambertian flat shading over
    the z-buffer hit maps; image formation fully independent of the 2DGS
    blend path. Two-sided shading (|n.l|): mesh winding-agnostic."""
    intr = jnp.asarray([cam.focal_x, cam.focal_y, cam.width / 2.0,
                        cam.height / 2.0], jnp.float32)
    out = rasterize_mesh(jnp.asarray(verts), jnp.asarray(faces),
                         jnp.asarray(cam.w2c.astype(np.float32)), intr,
                         int(cam.width), int(cam.height))
    fid = np.asarray(out.face_id)
    nrm = np.asarray(out.normal)
    miss = fid < 0
    obj = face_obj[np.where(miss, 0, fid)]
    shade = _AMBIENT + sum(
        w * np.abs(nrm @ l) for w, l in zip(_L_W, _LIGHTS))
    rgb = albedo[obj] * shade[..., None]
    rgb = np.where(miss[..., None], np.asarray(bg)[None, None], rgb)
    seg = np.where(miss, 0, obj).astype(np.int32)
    return np.clip(rgb, 0.0, 1.0).astype(np.float32), seg


def _sample_surface(verts, faces, face_obj, albedo, n_pts, seed=0):
    """SfM-stand-in point cloud: area-weighted uniform samples on the mesh."""
    rng = np.random.default_rng(seed)
    tri = verts[faces]                                     # [F,3,3]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1)
    fi = rng.choice(len(faces), n_pts, p=area / area.sum())
    r1, r2 = rng.random(n_pts), rng.random(n_pts)
    s = np.sqrt(r1)
    w = np.stack([1 - s, s * (1 - r2), s * r2], axis=1)    # [n,3]
    pts = np.einsum("nk,nkj->nj", w, tri[fi])
    col = (albedo[face_obj[fi]] * 255).astype(np.uint8)
    return pts.astype(np.float64), col


def build_mesh_e2e_scene(out_dir: str, width=64, height=48, n_cams=10,
                         n_points=300, seed=0, radius=4.2):
    """COLMAP-format scene whose GT images come from the mesh rasterizer.
    Returns (verts, faces, face_obj, albedo, cam list)."""
    from PIL import Image

    from instascene_tpu.cameras import fov2focal
    from instascene_tpu.data.colmap import (ColmapCamera, ColmapImage,
                                            rotmat2qvec,
                                            write_cameras_binary,
                                            write_images_binary,
                                            write_points3D_binary)

    verts, faces, face_obj, albedo = make_mesh_world()
    sparse = os.path.join(out_dir, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "sam/mask"), exist_ok=True)

    focal = fov2focal(0.9, width)
    cameras = {1: ColmapCamera(1, "PINHOLE", width, height,
                               np.array([focal, focal, width / 2.0,
                                         height / 2.0], np.float64))}
    images = {}
    rng = np.random.default_rng(seed)
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang),
                        1.7 + 0.5 * np.sin(2 * ang + 0.7)])
        R_w2c, t = look_at(pos, np.zeros(3))
        name = f"img_{i:03d}.png"
        images[i + 1] = ColmapImage(i + 1, rotmat2qvec(R_w2c), t, 1, name,
                                    np.zeros((0, 2)), np.zeros(0, np.int64))
        # reader convention: Camera takes R = R_w2c^T (column-major story)
        cam = Camera(uid=i, colmap_id=i + 1, R=R_w2c.T, T=t, fovx=0.9,
                     fovy=2 * np.arctan(height / (2 * focal)),
                     image_name=name.rsplit(".", 1)[0],
                     width=width, height=height)
        rgb, seg = render_mesh_gt(cam, verts, faces, face_obj, albedo)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", name))
        Image.fromarray(seg.astype(np.uint8)).save(
            os.path.join(out_dir, "sam/mask", name.rsplit(".", 1)[0]
                         + ".png"))
        cams.append(cam)
    write_cameras_binary(cameras, os.path.join(sparse, "cameras.bin"))
    write_images_binary(images, os.path.join(sparse, "images.bin"))
    pts, col = _sample_surface(verts, faces, face_obj, albedo, n_points,
                               seed)
    # SfM-like noise so training starts from imperfect geometry
    pts = pts + rng.normal(0, 0.02, pts.shape)
    write_points3D_binary(pts, col, os.path.join(sparse, "points3D.bin"))
    return verts, faces, face_obj, albedo, cams

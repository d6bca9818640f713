"""Synthetic miniature scenes for tests and benchmarks.

Generates a COLMAP-layout scene directory (sparse/0/{cameras,images,points3D}.bin
+ images/) around a small cluster of colored points, with cameras on a circle
looking at the origin. Images start as noise (the renderer tests overwrite them
with rendered ground truth once the splatting op exists).
"""

from __future__ import annotations

import os

import numpy as np

from ..cameras import fov2focal
from .colmap import (ColmapCamera, ColmapImage, rotmat2qvec,
                     write_cameras_binary, write_images_binary,
                     write_points3D_binary)


def look_at(cam_pos: np.ndarray, target: np.ndarray,
            up=np.array([0.0, 0.0, 1.0])):
    """Returns w2c (R_w2c, t) for a camera at cam_pos looking at target,
    COLMAP convention (x right, y down, z forward)."""
    fwd = target - cam_pos
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    if np.linalg.norm(right) < 1e-6:
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_w2c = np.stack([right, down, fwd], axis=0)
    t = -R_w2c @ cam_pos
    return R_w2c, t


def make_synthetic_scene(out_dir: str, n_points: int = 500, n_cams: int = 6,
                         width: int = 64, height: int = 48,
                         radius: float = 4.0, seed: int = 0,
                         write_images: bool = True,
                         camera_model: str = "PINHOLE"):
    """Create a COLMAP scene dir. Returns (xyz, rgb, cam_params list).

    camera_model picks the intrinsics record layout — any of the four
    models the reader supports (reference dataset_readers.py:87-97:
    SIMPLE_PINHOLE/SIMPLE_RADIAL use params[0] as the single focal,
    PINHOLE/OPENCV carry fx, fy; trailing distortion params are ignored
    by the undistorted-dataset contract)."""
    rng = np.random.default_rng(seed)
    sparse = os.path.join(out_dir, "sparse/0")
    os.makedirs(sparse, exist_ok=True)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)

    xyz = rng.normal(0, 0.6, (n_points, 3))
    rgb = rng.integers(0, 256, (n_points, 3)).astype(np.uint8)

    focal = fov2focal(0.9, width)
    cx, cy = width / 2, height / 2
    params = {
        "SIMPLE_PINHOLE": [focal, cx, cy],
        "PINHOLE": [focal, focal, cx, cy],
        "SIMPLE_RADIAL": [focal, cx, cy, 0.0],
        "OPENCV": [focal, focal, cx, cy, 0.0, 0.0, 0.0, 0.0],
    }[camera_model]
    cameras = {1: ColmapCamera(1, camera_model, width, height,
                               np.array(params, np.float64))}
    images = {}
    cam_list = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams
        pos = np.array([radius * np.cos(ang), radius * np.sin(ang),
                        1.5 + 0.3 * np.sin(2 * ang)])
        R_w2c, t = look_at(pos, np.zeros(3))
        qvec = rotmat2qvec(R_w2c)
        name = f"img_{i:03d}.png"
        images[i + 1] = ColmapImage(i + 1, qvec, t, 1, name,
                                    np.zeros((0, 2)), np.zeros(0, np.int64))
        cam_list.append({"R_w2c": R_w2c, "t": t, "pos": pos, "name": name})
        if write_images:
            from PIL import Image
            img = rng.integers(0, 256, (height, width, 3)).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(out_dir, "images", name))

    write_cameras_binary(cameras, os.path.join(sparse, "cameras.bin"))
    write_images_binary(images, os.path.join(sparse, "images.bin"))
    write_points3D_binary(xyz, rgb, os.path.join(sparse, "points3D.bin"))
    return xyz, rgb, cam_list

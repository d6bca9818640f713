"""COLMAP sparse-reconstruction parsers (binary and text).

Reads cameras.bin / images.bin / points3D.bin (and .txt fallbacks) in the standard
COLMAP format. Behavioral parity: reference scene/colmap_loader.py:83-294 — same
camera model table and returned fields; implemented with vectorized struct reads.
"""

from __future__ import annotations

import os
import struct
from dataclasses import dataclass
from typing import Dict

import numpy as np

# COLMAP camera model table: model_id -> (name, num_params)
CAMERA_MODELS = {
    0: ("SIMPLE_PINHOLE", 3),
    1: ("PINHOLE", 4),
    2: ("SIMPLE_RADIAL", 4),
    3: ("RADIAL", 5),
    4: ("OPENCV", 8),
    5: ("OPENCV_FISHEYE", 8),
    6: ("FULL_OPENCV", 12),
    7: ("FOV", 5),
    8: ("SIMPLE_RADIAL_FISHEYE", 4),
    9: ("RADIAL_FISHEYE", 5),
    10: ("THIN_PRISM_FISHEYE", 12),
}
CAMERA_MODEL_IDS = {name: mid for mid, (name, _) in CAMERA_MODELS.items()}
CAMERA_MODEL_NPARAMS = {name: n for _, (name, n) in CAMERA_MODELS.items()}


@dataclass
class ColmapCamera:
    id: int
    model: str
    width: int
    height: int
    params: np.ndarray


@dataclass
class ColmapImage:
    id: int
    qvec: np.ndarray  # (w, x, y, z)
    tvec: np.ndarray
    camera_id: int
    name: str
    xys: np.ndarray
    point3D_ids: np.ndarray


def qvec2rotmat(qvec):
    w, x, y, z = qvec
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * w * z, 2 * x * z + 2 * w * y],
        [2 * x * y + 2 * w * z, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * w * x],
        [2 * x * z - 2 * w * y, 2 * y * z + 2 * w * x, 1 - 2 * x * x - 2 * y * y]])


def rotmat2qvec(R):
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = R.flat
    K = np.array([
        [Rxx - Ryy - Rzz, 0, 0, 0],
        [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
        [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
        [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz]]) / 3.0
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec *= -1
    return qvec


def _read_next_bytes(fid, num_bytes, fmt, endian="<"):
    return struct.unpack(endian + fmt, fid.read(num_bytes))


def read_cameras_binary(path: str) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path, "rb") as f:
        num = _read_next_bytes(f, 8, "Q")[0]
        for _ in range(num):
            cam_id, model_id, width, height = _read_next_bytes(f, 24, "iiQQ")
            model_name, n_params = CAMERA_MODELS[model_id]
            params = np.array(_read_next_bytes(f, 8 * n_params, "d" * n_params))
            cameras[cam_id] = ColmapCamera(cam_id, model_name, int(width),
                                           int(height), params)
    return cameras


def read_images_binary(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path, "rb") as f:
        num = _read_next_bytes(f, 8, "Q")[0]
        for _ in range(num):
            vals = _read_next_bytes(f, 64, "idddddddi")
            image_id = vals[0]
            qvec = np.array(vals[1:5])
            tvec = np.array(vals[5:8])
            camera_id = vals[8]
            name = b""
            c = f.read(1)
            while c != b"\x00":
                name += c
                c = f.read(1)
            num_pts = _read_next_bytes(f, 8, "Q")[0]
            rec = np.frombuffer(f.read(24 * num_pts),
                                dtype=[("x", "<f8"), ("y", "<f8"), ("id", "<i8")])
            xys = np.stack([rec["x"], rec["y"]], axis=-1)
            p3d_ids = rec["id"].copy()
            images[image_id] = ColmapImage(image_id, qvec, tvec, camera_id,
                                           name.decode("utf-8"), xys, p3d_ids)
    return images


def read_points3D_binary(path: str):
    """Returns (xyz [N,3] f64, rgb [N,3] u8, errors [N,1] f64).

    The record layout is variable-length (per-point track lists), so parsing
    is a sequential walk; the native C++ walker (native/colmap_io.cpp) does
    it at memory speed, with this Python loop as the fallback."""
    with open(path, "rb") as f:
        data = f.read()
    from .native import points3d_parse_native
    parsed = points3d_parse_native(data)
    if parsed is not None:
        return parsed

    import io
    f = io.BytesIO(data)
    num = _read_next_bytes(f, 8, "Q")[0]
    xyz = np.empty((num, 3))
    rgb = np.empty((num, 3), dtype=np.uint8)
    errors = np.empty((num, 1))
    for i in range(num):
        vals = _read_next_bytes(f, 43, "QdddBBBd")
        xyz[i] = vals[1:4]
        rgb[i] = vals[4:7]
        errors[i] = vals[7]
        track_len = _read_next_bytes(f, 8, "Q")[0]
        f.read(8 * track_len)
    return xyz, rgb, errors


def read_cameras_text(path: str) -> Dict[int, ColmapCamera]:
    cameras = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            elems = line.split()
            cam_id = int(elems[0])
            model = elems[1]
            cameras[cam_id] = ColmapCamera(
                cam_id, model, int(elems[2]), int(elems[3]),
                np.array([float(x) for x in elems[4:]]))
    return cameras


def read_images_text(path: str) -> Dict[int, ColmapImage]:
    images = {}
    with open(path) as f:
        lines = [ln.strip() for ln in f
                 if ln.strip() and not ln.strip().startswith("#")]
    for i in range(0, len(lines), 2):
        elems = lines[i].split()
        image_id = int(elems[0])
        qvec = np.array([float(x) for x in elems[1:5]])
        tvec = np.array([float(x) for x in elems[5:8]])
        camera_id = int(elems[8])
        name = elems[9]
        pts = lines[i + 1].split() if i + 1 < len(lines) else []
        xys = np.array([float(x) for j, x in enumerate(pts) if j % 3 != 2],
                       dtype=np.float64).reshape(-1, 2)
        p3d_ids = np.array([int(x) for j, x in enumerate(pts) if j % 3 == 2],
                           dtype=np.int64)
        images[image_id] = ColmapImage(image_id, qvec, tvec, camera_id, name,
                                       xys, p3d_ids)
    return images


def read_points3D_text(path: str):
    xyz_l, rgb_l, err_l = [], [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            elems = line.split()
            xyz_l.append([float(x) for x in elems[1:4]])
            rgb_l.append([int(x) for x in elems[4:7]])
            err_l.append([float(elems[7])])
    return (np.array(xyz_l), np.array(rgb_l, dtype=np.uint8), np.array(err_l))


def write_cameras_binary(cameras: Dict[int, ColmapCamera], path: str) -> None:
    """Writer (used by tests and synthetic-scene generation)."""
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(cameras)))
        for cam in cameras.values():
            model_id = CAMERA_MODEL_IDS[cam.model]
            f.write(struct.pack("<iiQQ", cam.id, model_id, cam.width, cam.height))
            f.write(struct.pack("<" + "d" * len(cam.params), *cam.params))


def write_images_binary(images: Dict[int, ColmapImage], path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(images)))
        for im in images.values():
            f.write(struct.pack("<idddddddi", im.id, *im.qvec, *im.tvec,
                                im.camera_id))
            f.write(im.name.encode("utf-8") + b"\x00")
            n = len(im.point3D_ids)
            f.write(struct.pack("<Q", n))
            for xy, pid in zip(im.xys, im.point3D_ids):
                f.write(struct.pack("<ddq", xy[0], xy[1], pid))


def write_points3D_binary(xyz: np.ndarray, rgb: np.ndarray, path: str) -> None:
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(xyz)))
        for i in range(len(xyz)):
            f.write(struct.pack("<QdddBBBd", i + 1, *xyz[i],
                                *[int(c) for c in rgb[i]], 0.0))
            f.write(struct.pack("<Q", 0))


def load_sparse_model(scene_dir: str):
    """Load cameras+images+points from a COLMAP sparse dir (bin, txt fallback)."""
    bin_cams = os.path.join(scene_dir, "cameras.bin")
    if os.path.exists(bin_cams):
        cams = read_cameras_binary(bin_cams)
        imgs = read_images_binary(os.path.join(scene_dir, "images.bin"))
    else:
        cams = read_cameras_text(os.path.join(scene_dir, "cameras.txt"))
        imgs = read_images_text(os.path.join(scene_dir, "images.txt"))
    return cams, imgs

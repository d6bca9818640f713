"""Novel-view camera paths and video export.

Functional parity with reference utils/render_utils.py (pose recentering,
scene focus point, elliptical fly-around, create_videos via imageio); the
pose math here is an independent formulation: the focus point solves the
ray least-squares normal equations directly (the perpendicular projector
P = I - ddT is symmetric idempotent, so PTP = P and no Gram matrix is
needed), the recentering rotation comes from an SVD of the centered camera
positions, and the ellipse is built as one vectorized batch of look-at
frames."""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..cameras import MiniCam, get_projection_matrix


def pad_poses(p: np.ndarray) -> np.ndarray:
    """[...,3,4] -> [...,4,4] by appending the affine bottom row."""
    bottom = np.zeros(p.shape[:-2] + (1, 4), p.dtype)
    bottom[..., 0, 3] = 1.0
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p: np.ndarray) -> np.ndarray:
    return p[..., :3, :4]


def view_matrix(lookdir, up, position) -> np.ndarray:
    """Batched OpenGL-style camera-to-world frames [...,3,4] from look
    directions, a shared up hint, and positions (all [...,3])."""
    lookdir = np.asarray(lookdir, np.float64)
    position = np.asarray(position, np.float64)
    up = np.broadcast_to(np.asarray(up, np.float64), lookdir.shape)
    unit = lambda v: v / np.maximum(
        np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    z = unit(lookdir)
    x = unit(np.cross(up, z))
    y = np.cross(z, x)  # already unit: z and x are orthonormal
    return np.stack([x, y, z, position], axis=-1)



def focus_point_fn(poses: np.ndarray) -> np.ndarray:
    """Point minimizing summed squared distance to all camera optical axes.

    For rays (o_i, d_i) the distance uses the perpendicular projector
    P_i = I - d_i d_iT; since each P_i is symmetric idempotent the normal
    equations are simply (sum P_i) p = sum P_i o_i — solved directly, no
    PTP Gram product or explicit inverse."""
    d = poses[:, :3, 2]
    d = d / np.linalg.norm(d, axis=-1, keepdims=True)
    o = poses[:, :3, 3]
    proj = np.eye(3)[None] - d[:, :, None] * d[:, None, :]
    lhs = proj.sum(0)
    rhs = np.einsum("nij,nj->i", proj, o)
    return np.linalg.lstsq(lhs, rhs, rcond=None)[0]


def transform_poses_pca(poses: np.ndarray):
    """Recenter c2w poses [N,3,4] so the camera cloud's principal axes align
    with the world axes and positions fit in the unit cube.

    Returns (poses_recentered [N,3,4], transform [4,4]) with
    poses_recentered = (transform @ pad(poses))[:3]. Uses an SVD of the
    centered positions for the principal frame (right-handed by
    construction after a possible last-axis sign fix) and flips the world
    so the average camera up has a positive world-z component."""
    t = poses[:, :3, 3]
    centroid = t.mean(axis=0)
    # Principal axes of the camera-position cloud; rows of vt are the axes
    # in decreasing-variance order, so vt itself is the world-from-old
    # rotation we want.
    _, _, vt = np.linalg.svd(t - centroid, full_matrices=False)
    if np.linalg.det(vt) < 0:
        vt = vt * np.array([[1.0], [1.0], [-1.0]])
    transform = np.eye(4)
    transform[:3, :3] = vt
    transform[:3, 3] = -vt @ centroid
    recentered = unpad_poses(transform @ pad_poses(poses))
    # Normalize scale so every position lies inside [-1, 1]^3.
    scale = 1.0 / max(np.abs(recentered[:, :3, 3]).max(), 1e-12)
    scale_mat = np.diag([scale, scale, scale, 1.0])
    transform = scale_mat @ transform
    recentered = unpad_poses(scale_mat @ pad_poses(recentered))
    # Keep the average camera "up" (the -y column of an OpenCV-style c2w)
    # pointing toward +z of the new world; otherwise rotate 180 deg about x.
    if recentered[:, :3, 1].mean(axis=0)[2] < 0:
        flip = np.diag([1.0, -1.0, -1.0, 1.0])
        transform = flip @ transform
        recentered = unpad_poses(flip @ pad_poses(recentered))
    return recentered, transform[:4]


def generate_ellipse_path(poses: np.ndarray, n_frames: int = 120,
                          z_variation: float = 0.0, z_phase: float = 0.0
                          ) -> np.ndarray:
    """Elliptical fly-around of the scene focus point. poses: [N,3,4] c2w
    (recentered frame). Returns [n_frames,3,4] c2w frames, all looking at
    the focus point.

    The ellipse's xy semi-axes are the per-axis 90th-percentile spread of
    the input camera positions about the focus point; the orbit height
    oscillates inside the cameras' 10th-90th percentile z band scaled by
    ``z_variation`` (0 keeps the orbit in the z=0 plane)."""
    center = focus_point_fn(poses)
    pos = poses[:, :3, 3]
    semi = np.percentile(np.abs(pos[:, :2] - center[:2]), 90, axis=0)
    z_lo, z_hi = np.percentile(pos[:, 2], [10, 90])

    theta = np.linspace(0.0, 2.0 * np.pi, n_frames, endpoint=False)
    orbit = np.stack([
        center[0] + semi[0] * np.cos(theta),
        center[1] + semi[1] * np.sin(theta),
        z_variation * (0.5 * (z_lo + z_hi) + 0.5 * (z_hi - z_lo)
                       * np.cos(theta + 2 * np.pi * z_phase)),
    ], axis=-1)

    # Shared up vector: the dominant world axis of the mean camera up.
    mean_up = poses[:, :3, 1].mean(axis=0)
    axis = np.argmax(np.abs(mean_up))
    up = np.zeros(3)
    up[axis] = np.sign(mean_up[axis])
    # z column = position - center: the camera -z (view) axis faces the
    # focus point under the OpenGL-style frame view_matrix builds.
    return view_matrix(orbit - center, up, orbit)


def path_to_minicams(path_c2w: np.ndarray, width: int, height: int,
                     fovx: float, fovy: float) -> List[MiniCam]:
    cams = []
    proj = get_projection_matrix(0.01, 100.0, fovx, fovy)
    for c2w34 in path_c2w:
        c2w = pad_poses(c2w34[None])[0]
        w2v = np.linalg.inv(c2w).astype(np.float32)
        cams.append(MiniCam(width, height, fovy, fovx, 0.01, 100.0,
                            w2v=w2v, full_proj=(proj @ w2v).astype(np.float32)))
    return cams


def render_video(gaussians, pipe, cams: List[MiniCam], out_path: str,
                 bg=(0, 0, 0), fps: int = 30, mode: str = "render") -> str:
    """Render a camera path to an mp4 via imageio (create_videos parity)."""
    import imageio
    from ..render import render
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        writer = imageio.get_writer(out_path, fps=fps)
    except (ValueError, ImportError):
        # no ffmpeg plugin in this environment → fall back to GIF
        out_path = os.path.splitext(out_path)[0] + ".gif"
        writer = imageio.get_writer(out_path, duration=1000.0 / fps)
    for cam in cams:
        pkg = render(cam, gaussians, pipe, np.asarray(bg, np.float32))
        if mode == "render":
            frame = np.asarray(pkg["render"])
        elif mode == "depth":
            d = np.asarray(pkg["surf_depth"])[..., 0]
            frame = np.repeat((d / max(d.max(), 1e-6))[..., None], 3, -1)
        elif mode == "normal":
            frame = np.asarray(pkg["rend_normal"]) * 0.5 + 0.5
        else:
            raise ValueError(mode)
        writer.append_data((np.clip(frame, 0, 1) * 255).astype(np.uint8))
    writer.close()
    return out_path

"""Novel-view camera paths and video export.

Parity: reference utils/render_utils.py (transform_poses_pca, focus_point_fn,
generate_ellipse_path, create_videos via imageio)."""

from __future__ import annotations

import os
from typing import List

import numpy as np

from ..cameras import MiniCam, get_projection_matrix


def normalize(x):
    return x / np.linalg.norm(x)


def view_matrix(lookdir, up, position):
    vec2 = normalize(lookdir)
    vec0 = normalize(np.cross(up, vec2))
    vec1 = normalize(np.cross(vec2, vec0))
    return np.stack([vec0, vec1, vec2, position], axis=1)


def transform_poses_pca(poses: np.ndarray):
    """Align principal axes to world axes (render_utils.py parity).
    poses: [N,3,4] c2w. Returns (poses_recentered, transform [4,4])."""
    t = poses[:, :3, 3]
    t_mean = t.mean(axis=0)
    t = t - t_mean
    eigval, eigvec = np.linalg.eig(t.T @ t)
    inds = np.argsort(eigval)[::-1]
    eigvec = eigvec[:, inds]
    rot = eigvec.T
    if np.linalg.det(rot) < 0:
        rot = np.diag(np.array([1, 1, -1])) @ rot
    transform = np.concatenate([rot, rot @ -t_mean[:, None]], -1)
    poses_recentered = unpad_poses(transform @ pad_poses(poses))
    scale_factor = 1.0 / np.max(np.abs(poses_recentered[:, :3, 3]))
    poses_recentered[:, :3, 3] *= scale_factor
    transform = np.diag(np.array([scale_factor] * 3 + [1])) @ pad_poses(
        transform[None])[0]
    if poses_recentered.mean(axis=0)[2, 1] < 0:
        poses_recentered = np.diag(np.array([1, -1, -1])) @ poses_recentered
        transform = np.diag(np.array([1, -1, -1, 1])) @ transform
    return poses_recentered, transform


def pad_poses(p):
    bottom = np.broadcast_to([0, 0, 0, 1.0], p[..., :1, :4].shape)
    return np.concatenate([p[..., :3, :4], bottom], axis=-2)


def unpad_poses(p):
    return p[..., :3, :4]


def focus_point_fn(poses):
    directions, origins = poses[:, :3, 2:3], poses[:, :3, 3:4]
    m = np.eye(3) - directions * np.transpose(directions, [0, 2, 1])
    mt_m = np.transpose(m, [0, 2, 1]) @ m
    return np.squeeze(np.linalg.inv(mt_m.mean(0)) @ (mt_m @ origins).mean(0))


def generate_ellipse_path(poses: np.ndarray, n_frames: int = 120,
                          z_variation: float = 0.0, z_phase: float = 0.0
                          ) -> np.ndarray:
    """Elliptical fly-around path in the recentered frame
    (render_utils.py parity). poses: [N,3,4]. Returns [n_frames,3,4]."""
    center = focus_point_fn(poses)
    offset = np.array([center[0], center[1], 0])
    sc = np.percentile(np.abs(poses[:, :3, 3] - offset), 90, axis=0)
    low = -sc + offset
    high = sc + offset
    z_low = np.percentile((poses[:, :3, 3]), 10, axis=0)
    z_high = np.percentile((poses[:, :3, 3]), 90, axis=0)

    def get_positions(theta):
        return np.stack([
            low[0] + (high - low)[0] * (np.cos(theta) * 0.5 + 0.5),
            low[1] + (high - low)[1] * (np.sin(theta) * 0.5 + 0.5),
            z_variation * (z_low[2] + (z_high - z_low)[2]
                           * (np.cos(theta + 2 * np.pi * z_phase) * 0.5 + 0.5)),
        ], -1)

    theta = np.linspace(0, 2.0 * np.pi, n_frames + 1, endpoint=True)
    positions = get_positions(theta)
    avg_up = poses[:, :3, 1].mean(0)
    avg_up = avg_up / np.linalg.norm(avg_up)
    ind_up = np.argmax(np.abs(avg_up))
    up = np.eye(3)[ind_up] * np.sign(avg_up[ind_up])
    return np.stack([view_matrix(p - center, up, p)
                     for p in positions[:-1]], axis=0)


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

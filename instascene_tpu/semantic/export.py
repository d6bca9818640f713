"""Instance decomposition export: per-label point clouds and the
Garfield-style HDBSCAN clustering (reference train_semantic.py:239-350;
sklearn HDBSCAN + NearestNeighbors replace cuML/open3d)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..data.ply import write_point_cloud


def generate_semantic_colors(n: int, seed: int = 0) -> np.ndarray:
    """Distinct instance colors (vis_utils/color_utils.py parity: random hues)."""
    rng = np.random.default_rng(seed)
    return rng.random((max(n, 1), 3)) * 0.7 + 0.3


def voxel_downsample(points: np.ndarray, voxel: float):
    """Returns (representative indices, voxel keys) — one point per voxel
    (replaces open3d voxel_down_sample_and_trace)."""
    mins = points.min(axis=0)
    keys = np.floor((points - mins) / max(voxel, 1e-4)).astype(np.int64)
    flat = (keys[:, 0] * 73856093) ^ (keys[:, 1] * 19349663) ^ (keys[:, 2]
                                                                * 83492791)
    _, first_idx = np.unique(flat, return_index=True)
    return np.sort(first_idx)


def hdbscan_labels(positions: np.ndarray, feats: np.ndarray,
                   downsample_size: float = 0.01,
                   cluster_selection_epsilon: float = 0.1,
                   min_samples: int = 30, min_cluster_size: int = 30
                   ) -> np.ndarray:
    """Garfield-style labeling: voxel downsample → HDBSCAN on features →
    nearest-neighbor relabel of removed/noise points
    (train_semantic.py:248-314)."""
    from sklearn.cluster import HDBSCAN
    from sklearn.neighbors import NearestNeighbors

    n = positions.shape[0]
    ds = downsample_size
    idx = voxel_downsample(positions, ds)
    while len(idx) > 1_000_000:
        ds *= 2
        idx = voxel_downsample(positions, ds)

    feats_ds = feats[idx]
    pos_ds = positions[idx]
    eff_min = max(2, min(min_cluster_size, max(len(idx) // 4, 2)))
    clus = HDBSCAN(cluster_selection_epsilon=cluster_selection_epsilon,
                   min_samples=min(min_samples, eff_min),
                   min_cluster_size=eff_min,
                   allow_single_cluster=True).fit(feats_ds)
    labels_ds = clus.labels_.astype(np.int32)

    labels = -np.ones(n, dtype=np.int32)
    labels[idx] = labels_ds
    non_clustered = np.ones(n, dtype=bool)
    non_clustered[idx] = False
    if non_clustered.any():
        nn = NearestNeighbors(n_neighbors=1).fit(pos_ds)
        _, ind = nn.kneighbors(positions[non_clustered])
        labels[non_clustered] = labels_ds[ind[:, 0]]

    noise = labels == -1
    if noise.any() and (labels >= 0).any():
        valid = labels >= 0
        nn = NearestNeighbors(n_neighbors=1).fit(positions[valid])
        _, ind = nn.kneighbors(positions[noise])
        labels[noise] = labels[valid][ind[:, 0]]
    return labels


def export_segment_results(positions: np.ndarray, feats: np.ndarray,
                           seg3d_masks: np.ndarray, seg3d_labels: np.ndarray,
                           save_dir: str, score_threshold: float = 0.9,
                           use_hdbscan: bool = False) -> Optional[np.ndarray]:
    os.makedirs(save_dir, exist_ok=True)
    partial_dir = os.path.join(save_dir, "label_pointclouds")
    os.makedirs(partial_dir, exist_ok=True)

    if use_hdbscan:
        labels = hdbscan_labels(positions, feats)
        uniq = np.unique(labels)
        colors = generate_semantic_colors(len(uniq))
        all_pts, all_cols = [], []
        for i, lab in enumerate(uniq):
            pts = positions[labels == lab]
            col = np.broadcast_to(colors[i], pts.shape)
            write_point_cloud(os.path.join(partial_dir, f"{lab}.ply"),
                              pts, col.copy())
            all_pts.append(pts)
            all_cols.append(col)
        write_point_cloud(os.path.join(save_dir, "point_cloud_labels.ply"),
                          np.concatenate(all_pts), np.concatenate(all_cols))
        np.save(os.path.join(save_dir, "point_cloud_labels.npy"), labels)
        return labels

    # coarse 3D-mask mode: mean-feature score threshold (:328-350)
    k = seg3d_masks.shape[1]
    colors = generate_semantic_colors(k)
    all_pts, all_cols = [], []
    n = min(len(positions), seg3d_masks.shape[0])
    for i in range(k):
        member = seg3d_masks[:n, i]
        if member.sum() == 0:
            sel = seg3d_labels[:n] == i
        else:
            mean_feat = feats[:n][member].mean(axis=0)
            score = feats[:n] @ mean_feat
            sel = score >= score_threshold
            if sel.sum() == 0:
                sel = seg3d_labels[:n] == i
        pts = positions[:n][sel]
        if len(pts) == 0:
            continue
        col = np.broadcast_to(colors[i], pts.shape)
        write_point_cloud(os.path.join(partial_dir, f"{i}.ply"), pts,
                          col.copy())
        all_pts.append(pts)
        all_cols.append(col)
    if all_pts:
        write_point_cloud(os.path.join(save_dir, "point_cloud_labels.ply"),
                          np.concatenate(all_pts), np.concatenate(all_cols))
    return None


def feature_to_rgb(featmap: np.ndarray, pca_proj: Optional[np.ndarray] = None
                   ) -> np.ndarray:
    """[H,W,E] feature map → uint8 RGB via (possibly precomputed) PCA
    (utils/contrastive_utils.py:76-103)."""
    h, w, e = featmap.shape
    flat = featmap.reshape(-1, e)
    flat = flat / (np.linalg.norm(flat, axis=1, keepdims=True) + 1e-9)
    if pca_proj is not None:
        low = flat @ pca_proj
    else:
        from sklearn.decomposition import PCA
        low = PCA(n_components=3).fit_transform(flat)
    low = (low.reshape(h, w, 3) * 0.5 + 0.5).clip(0, 1)
    return (low * 255).astype(np.uint8)


def pca_proj_matrix(feats: np.ndarray, n_sample: int = 200_000,
                    seed: int = 0) -> np.ndarray:
    """PCA projection matrix from sampled gaussian features
    (train_semantic.py:387-407 / semantic_gui.py:493-501)."""
    rng = np.random.default_rng(seed)
    n = feats.shape[0]
    idx = rng.integers(0, n, min(n_sample, n * 4))
    f = feats[idx]
    f = f / (np.linalg.norm(f, axis=1, keepdims=True) + 1e-6)
    f = f - f.mean(axis=0)
    cov = f.T @ f / len(f)
    eigvals, eigvecs = np.linalg.eigh(cov)
    order = np.argsort(-eigvals)
    return eigvecs[:, order[:3]].astype(np.float32)

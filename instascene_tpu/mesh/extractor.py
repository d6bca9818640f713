"""GaussianExtractor: render train views and fuse into a mesh.

Parity: reference utils/mesh_utils.py:75-306 (reconstruction, bounding-sphere
estimate, bounded TSDF extraction, contracted unbounded extraction,
post_process_mesh) and utils/render_utils.py (focus_point_fn)."""

from __future__ import annotations

import os
from typing import List, Optional

import numpy as np

from ..render import render
from ..viewer.render_paths import focus_point_fn  # noqa: F401 (re-export)


def post_process_mesh(verts: np.ndarray, faces: np.ndarray,
                      colors: Optional[np.ndarray] = None,
                      cluster_to_keep: int = 1000):
    """Keep the largest `cluster_to_keep` connected face clusters
    (mesh_utils.py:23-47, open3d cluster_connected_triangles replaced by
    scipy connected components over the vertex-sharing graph)."""
    from scipy.sparse import coo_matrix
    from scipy.sparse.csgraph import connected_components
    if len(faces) == 0:
        return verts, faces, colors
    n_v = len(verts)
    rows = np.concatenate([faces[:, 0], faces[:, 1], faces[:, 2]])
    cols = np.concatenate([faces[:, 1], faces[:, 2], faces[:, 0]])
    adj = coo_matrix((np.ones(len(rows)), (rows, cols)), shape=(n_v, n_v))
    _, labels = connected_components(adj, directed=False)
    face_label = labels[faces[:, 0]]
    sizes = np.bincount(face_label)
    cluster_sizes = np.sort(sizes[sizes > 0])[::-1]
    # keep clusters at least as large as the k-th largest (mesh_utils.py:37-41)
    thr = (cluster_sizes[cluster_to_keep - 1]
           if len(cluster_sizes) >= cluster_to_keep else 0)
    keep = sizes[face_label] >= thr
    faces2 = faces[keep] if keep.any() else faces
    used = np.unique(faces2)
    remap = -np.ones(n_v, np.int64)
    remap[used] = np.arange(len(used))
    return (verts[used], remap[faces2].astype(np.int32),
            colors[used] if colors is not None else None)


class GaussianExtractor:
    """Renders rgb + surf_depth per view, then extracts a TSDF mesh."""

    def __init__(self, gaussians, pipe, bg_color=(0.0, 0.0, 0.0)):
        self.gaussians = gaussians
        self.pipe = pipe
        self.bg = np.asarray(bg_color, np.float32)
        self.clean()

    def clean(self):
        self.rgbmaps: List[np.ndarray] = []
        self.depthmaps: List[np.ndarray] = []
        self.viewpoint_stack = []

    def reconstruction(self, viewpoint_stack):
        from tqdm import tqdm
        self.clean()
        self.viewpoint_stack = viewpoint_stack
        for cam in tqdm(viewpoint_stack, desc="reconstruct radiance fields"):
            pkg = render(cam, self.gaussians, self.pipe, self.bg)
            self.rgbmaps.append(np.asarray(pkg["render"]))
            mask = None
            if cam.gt_alpha_mask is not None:
                mask = np.asarray(cam.gt_alpha_mask)[..., 0] < 0.5
            d = np.asarray(pkg["surf_depth"])[..., 0]
            if mask is not None:
                d = np.where(mask, 0.0, d)
            self.depthmaps.append(d)
        self.estimate_bounding_sphere()

    def estimate_bounding_sphere(self):
        c2ws = np.array([c.c2w for c in self.viewpoint_stack])
        poses = c2ws[:, :3, :] @ np.diag([1, -1, -1, 1])
        center = focus_point_fn(poses)
        self.radius = np.linalg.norm(c2ws[:, :3, 3] - center, axis=-1).min()
        self.center = center

    def _intrinsics(self):
        return [np.array([c.focal_x, c.focal_y, c.width / 2.0,
                          c.height / 2.0], np.float32)
                for c in self.viewpoint_stack]

    def extract_mesh_bounded(self, voxel_size: float = 0.004,
                             sdf_trunc: float = 0.02,
                             depth_trunc: float = 3.0, **kw):
        from .tsdf import tsdf_fusion_mesh
        w2cs = [c.w2c for c in self.viewpoint_stack]
        return tsdf_fusion_mesh(self.depthmaps, self.rgbmaps, w2cs,
                                self._intrinsics(), voxel_size=voxel_size,
                                sdf_trunc=sdf_trunc, depth_trunc=depth_trunc,
                                **kw)

    def extract_mesh_unbounded(self, resolution: int = 512):
        """Contracted-space TSDF for unbounded scenes (mesh_utils.py:187-288):
        fuse in the mip-NeRF-360 contraction around the bounding-sphere
        center, then un-contract the extracted vertices."""
        from .marching import marching_tetrahedra
        from .tsdf import _integrate_slab
        import jax.numpy as jnp

        def uncontract(y):
            mag = np.linalg.norm(y, axis=-1, keepdims=True)
            with np.errstate(divide="ignore", invalid="ignore"):
                out = np.where(mag < 1, y, (1 / np.maximum(2 - mag, 1e-6))
                               * (y / np.maximum(mag, 1e-12)))
            return out

        h, w = self.depthmaps[0].shape[:2]
        w2cs = np.stack([c.w2c for c in self.viewpoint_stack]).astype(
            np.float32)
        intr = np.stack(self._intrinsics())
        depth_j = jnp.asarray(np.stack(self.depthmaps).astype(np.float32))
        rgb_j = jnp.asarray(np.stack(self.rgbmaps).astype(np.float32))

        n = resolution
        grid_1d = np.linspace(-2 + 2 / n, 2 - 2 / n, n, dtype=np.float32)
        voxel = 4.0 / n
        sdf_trunc = 5 * voxel * self.radius
        verts_all, faces_all = [], []
        n_verts = 0
        slab = max(2, min(n, 2_000_000 // (n * n)))
        x0 = 0
        while x0 < n - 1:
            x1 = min(x0 + slab, n)
            gx, gy, gz = np.meshgrid(grid_1d[x0:x1], grid_1d, grid_1d,
                                     indexing="ij")
            y = np.stack([gx, gy, gz], -1).reshape(-1, 3)
            world = uncontract(y) * self.radius + self.center
            tsdf, weight, _ = _integrate_slab(
                jnp.asarray(world.astype(np.float32)), jnp.asarray(w2cs),
                jnp.asarray(intr), depth_j, rgb_j,
                float(6.0 * self.radius), float(sdf_trunc), h, w)
            field = np.where(np.asarray(weight).reshape(x1 - x0, n, n) > 0,
                             np.asarray(tsdf).reshape(x1 - x0, n, n), 1.0)
            v, f = marching_tetrahedra(field.astype(np.float64), 0.0,
                                       origin=(grid_1d[x0], grid_1d[0],
                                               grid_1d[0]), spacing=voxel)
            if len(v):
                v = uncontract(v) * self.radius + self.center
                verts_all.append(v)
                faces_all.append(f + n_verts)
                n_verts += len(v)
            x0 = x1 - 1
        if not verts_all:
            return (np.zeros((0, 3), np.float32),
                    np.zeros((0, 3), np.int32), None)
        return np.concatenate(verts_all), np.concatenate(faces_all), None


def write_mesh_ply(path: str, verts: np.ndarray, faces: np.ndarray,
                   colors: Optional[np.ndarray] = None) -> None:
    """Binary PLY mesh writer (vertex + face elements)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    n_v, n_f = len(verts), len(faces)
    header = ["ply", "format binary_little_endian 1.0",
              f"element vertex {n_v}",
              "property float x", "property float y", "property float z"]
    if colors is not None:
        header += ["property uchar red", "property uchar green",
                   "property uchar blue"]
    header += [f"element face {n_f}",
               "property list uchar int vertex_indices", "end_header\n"]
    with open(path, "wb") as f:
        f.write("\n".join(header).encode("ascii"))
        if colors is not None:
            c8 = np.clip(colors * 255, 0, 255).astype(np.uint8)
            rec = np.empty(n_v, dtype=[("x", "<f4"), ("y", "<f4"),
                                       ("z", "<f4"), ("r", "u1"),
                                       ("g", "u1"), ("b", "u1")])
            rec["x"], rec["y"], rec["z"] = verts.T.astype(np.float32)
            rec["r"], rec["g"], rec["b"] = c8.T
        else:
            rec = np.empty(n_v, dtype=[("x", "<f4"), ("y", "<f4"),
                                       ("z", "<f4")])
            rec["x"], rec["y"], rec["z"] = verts.T.astype(np.float32)
        f.write(rec.tobytes())
        frec = np.empty(n_f, dtype=[("n", "u1"), ("a", "<i4"), ("b", "<i4"),
                                    ("c", "<i4")])
        frec["n"] = 3
        frec["a"], frec["b"], frec["c"] = faces.T.astype(np.int32)
        f.write(frec.tobytes())

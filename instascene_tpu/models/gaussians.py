"""Functional Gaussian-surfel parameter state.

TPU-first redesign of the reference's mutable GaussianModel
(scene/gaussian_model.py): a flax.struct pytree of fixed-capacity arrays with
an `alive` mask instead of dynamically growing tensors — XLA requires static
shapes, so densify/prune becomes masked scatter into padding slots plus
host-controlled capacity doubling (see models/densify.py).

Parameterization parity (gaussian_model.py:34-50):
  scaling stored as log (exp activation, 2 axes — surfels), opacity as logit
  (sigmoid), rotation as unnormalized quaternion (w,x,y,z), SH features split
  dc [N,1,3] / rest [N,R,3], optional seg_feature [N,E].

PLY attribute contract (gaussian_model.py:263-283):
  x,y,z,nx,ny,nz,f_dc_0..2,f_rest_0..(3R-1),opacity,scale_0..1,rot_0..3
  [,segfeat_0..E-1], all f4 — byte-compatible with the reference.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ..utils.general import inverse_sigmoid


@struct.dataclass
class GaussianParams:
    xyz: jnp.ndarray            # [C,3]
    features_dc: jnp.ndarray    # [C,1,3]
    features_rest: jnp.ndarray  # [C,R,3]
    scaling: jnp.ndarray        # [C,2] log-scale
    rotation: jnp.ndarray       # [C,4] quaternion (w,x,y,z), unnormalized
    opacity: jnp.ndarray        # [C,1] logit
    alive: jnp.ndarray          # [C] bool — capacity slots in use
    seg_feature: Optional[jnp.ndarray] = None  # [C,E]
    active_sh_degree: int = struct.field(pytree_node=False, default=0)
    max_sh_degree: int = struct.field(pytree_node=False, default=3)

    # ---- activations (gaussian_model.py:44-50,109-138) ----
    def scaling_activated(self):
        return jnp.exp(self.scaling) * self.alive[:, None]

    def opacity_activated(self):
        return jax.nn.sigmoid(self.opacity) * self.alive[:, None]

    def rotation_normalized(self):
        # rsqrt(+eps) keeps grads NaN-free on dead slots (all-zero quats)
        return self.rotation * jax.lax.rsqrt(
            jnp.sum(self.rotation * self.rotation, axis=-1, keepdims=True)
            + 1e-24)

    def features(self):
        return jnp.concatenate([self.features_dc, self.features_rest], axis=1)

    def seg_feature_normed(self):
        if self.seg_feature is None:
            return None
        return self.seg_feature / (jnp.linalg.norm(
            self.seg_feature, axis=1, keepdims=True) + 1e-6)

    @property
    def params(self):
        return self

    @property
    def capacity(self) -> int:
        return self.xyz.shape[0]

    def n_alive(self):
        return jnp.sum(self.alive.astype(jnp.int32))

    def one_up_sh_degree(self) -> "GaussianParams":
        if self.active_sh_degree < self.max_sh_degree:
            return self.replace(active_sh_degree=self.active_sh_degree + 1)
        return self


def create_from_pcd(points: np.ndarray, colors: np.ndarray, dist2: np.ndarray,
                    capacity: Optional[int] = None, max_sh_degree: int = 3,
                    seg_feat_dim: int = 0, seed: int = 0) -> GaussianParams:
    """Initialize from an SfM point cloud (gaussian_model.py:181-204):
    colors → SH dc, scales = log(sqrt(mean 3-NN dist²)) on both axes,
    random quaternions, opacity = logit(0.1)."""
    from ..ops.sh import RGB2SH, num_sh_coeffs
    n = points.shape[0]
    cap = capacity or n
    assert cap >= n
    rng = np.random.default_rng(seed)
    R = num_sh_coeffs(max_sh_degree) - 1

    def pad(a):
        return np.concatenate(
            [a, np.zeros((cap - n,) + a.shape[1:], a.dtype)], axis=0)

    f_dc = RGB2SH(colors.astype(np.float32))[:, None, :]
    scales = np.log(np.sqrt(np.maximum(dist2, 1e-7)))[:, None].repeat(2, 1)
    rots = rng.random((n, 4)).astype(np.float32)
    opac = inverse_sigmoid(0.1 * np.ones((n, 1), np.float32))
    alive = np.zeros(cap, bool)
    alive[:n] = True
    seg = None
    if seg_feat_dim:
        seg = rng.random((n, seg_feat_dim)).astype(np.float32)
        seg = seg / np.linalg.norm(seg, axis=1, keepdims=True)
        seg = pad(seg)
    return GaussianParams(
        xyz=jnp.asarray(pad(points.astype(np.float32))),
        features_dc=jnp.asarray(pad(f_dc.astype(np.float32))),
        features_rest=jnp.asarray(np.zeros((cap, R, 3), np.float32)),
        scaling=jnp.asarray(pad(scales.astype(np.float32))),
        rotation=jnp.asarray(pad(rots)),
        opacity=jnp.asarray(pad(opac.astype(np.float32))),
        alive=jnp.asarray(alive),
        seg_feature=jnp.asarray(seg) if seg is not None else None,
        active_sh_degree=0, max_sh_degree=max_sh_degree)


def compact(p: GaussianParams) -> GaussianParams:
    """Drop dead slots (host-side, for export)."""
    alive = np.asarray(p.alive)
    idx = np.nonzero(alive)[0]

    def take(a):
        return jnp.asarray(np.asarray(a)[idx])

    return GaussianParams(
        xyz=take(p.xyz), features_dc=take(p.features_dc),
        features_rest=take(p.features_rest), scaling=take(p.scaling),
        rotation=take(p.rotation), opacity=take(p.opacity),
        alive=jnp.ones(len(idx), bool),
        seg_feature=take(p.seg_feature) if p.seg_feature is not None else None,
        active_sh_degree=p.active_sh_degree, max_sh_degree=p.max_sh_degree)


# ---------------------------------------------------------------- PLY I/O

def save_ply(p: GaussianParams, path: str, crop_mask: Optional[np.ndarray] = None,
             export_as_3dgs: bool = False) -> None:
    """Byte-compatible with reference save_ply (gaussian_model.py:285-313).
    3DGS export appends a third tiny log-scale axis (:323-348)."""
    from ..data.ply import write_ply
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    pc = compact(p)
    keep = (np.asarray(crop_mask) if crop_mask is not None
            else np.ones(pc.capacity, bool))

    xyz = np.asarray(pc.xyz)[keep]
    n = len(xyz)
    # f_dc/f_rest flattened channel-major: transpose(1,2).flatten == [3*R] with
    # coefficient-fastest? reference stores (N,1,3)->(N,3) and (N,R,3)->(N,3R)
    # via transpose(1,2) => channel index slow, coeff fast.
    fd = np.asarray(pc.features_dc)[keep].transpose(0, 2, 1)
    f_dc = fd.reshape(n, fd.shape[1] * fd.shape[2])
    fr = np.asarray(pc.features_rest)[keep].transpose(0, 2, 1)
    f_rest = fr.reshape(n, fr.shape[1] * fr.shape[2])
    opac = np.asarray(pc.opacity)[keep]
    scale = np.asarray(pc.scaling)[keep]
    if export_as_3dgs:
        scale = np.concatenate(
            [scale, np.full((n, 1), np.log(1e-6), np.float32)], axis=1)
    rot = np.asarray(pc.rotation)[keep]
    cols = [("x", xyz[:, 0]), ("y", xyz[:, 1]), ("z", xyz[:, 2]),
            ("nx", np.zeros(n)), ("ny", np.zeros(n)), ("nz", np.zeros(n))]
    for i in range(f_dc.shape[1]):
        cols.append((f"f_dc_{i}", f_dc[:, i]))
    for i in range(f_rest.shape[1]):
        cols.append((f"f_rest_{i}", f_rest[:, i]))
    cols.append(("opacity", opac[:, 0]))
    for i in range(scale.shape[1]):
        cols.append((f"scale_{i}", scale[:, i]))
    for i in range(rot.shape[1]):
        cols.append((f"rot_{i}", rot[:, i]))
    if pc.seg_feature is not None:
        seg = np.asarray(pc.seg_feature)[keep]
        for i in range(seg.shape[1]):
            cols.append((f"segfeat_{i}", seg[:, i]))
    arr = np.empty(n, dtype=[(name, "f4") for name, _ in cols])
    for name, v in cols:
        arr[name] = v.astype(np.float32)
    write_ply(path, arr)


def load_ply(path: str, max_sh_degree: int = 3, capacity: Optional[int] = None,
             seg_feat_dim: int = 0, load_seg_feat: bool = False
             ) -> GaussianParams:
    """Parity: gaussian_model.py:364-422 (sets active_sh_degree = max)."""
    from ..data.ply import read_ply
    v = read_ply(path)["vertex"]
    names = v.dtype.names
    n = len(v)
    cap = capacity or n
    xyz = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    opac = np.asarray(v["opacity"], np.float32)[:, None]
    f_dc = np.stack([v["f_dc_0"], v["f_dc_1"], v["f_dc_2"]],
                    -1).astype(np.float32)[:, None, :]
    rest_names = sorted([x for x in names if x.startswith("f_rest_")],
                        key=lambda s: int(s.split("_")[-1]))
    R = (max_sh_degree + 1) ** 2 - 1
    assert len(rest_names) == 3 * R, (len(rest_names), R)
    f_rest = np.stack([v[x] for x in rest_names], -1).astype(np.float32)
    f_rest = f_rest.reshape(n, 3, R).transpose(0, 2, 1)  # channel-major on disk
    scale_names = sorted([x for x in names if x.startswith("scale_")],
                         key=lambda s: int(s.split("_")[-1]))[:2]
    scaling = np.stack([v[x] for x in scale_names], -1).astype(np.float32)
    rot_names = sorted([x for x in names if x.startswith("rot")],
                       key=lambda s: int(s.split("_")[-1]))
    rotation = np.stack([v[x] for x in rot_names], -1).astype(np.float32)
    seg = None
    if load_seg_feat and seg_feat_dim:
        seg_names = [x for x in names if x.startswith("segfeat")]
        if len(seg_names) == seg_feat_dim:
            seg = np.stack([v[f"segfeat_{i}"] for i in range(seg_feat_dim)],
                           -1).astype(np.float32)

    def pad(a):
        return np.concatenate(
            [a, np.zeros((cap - n,) + a.shape[1:], a.dtype)], axis=0)

    alive = np.zeros(cap, bool)
    alive[:n] = True
    return GaussianParams(
        xyz=jnp.asarray(pad(xyz)), features_dc=jnp.asarray(pad(f_dc)),
        features_rest=jnp.asarray(pad(f_rest)), scaling=jnp.asarray(pad(scaling)),
        rotation=jnp.asarray(pad(rotation)), opacity=jnp.asarray(pad(opac)),
        alive=jnp.asarray(alive),
        seg_feature=jnp.asarray(pad(seg)) if seg is not None else None,
        active_sh_degree=max_sh_degree, max_sh_degree=max_sh_degree)


# ---------------------------------------------------------------- instance ops

def crop_mask(p: GaussianParams, mask: np.ndarray, mode: str = "save"
              ) -> GaussianParams:
    """Keep (mode='save') or remove (mode='delete') gaussians by boolean mask
    over compacted order (gaussian_model.py:608-619)."""
    pc = compact(p)
    keep = np.asarray(mask, bool)
    if mode == "delete":
        keep = ~keep
    alive = jnp.asarray(keep)
    return pc.replace(alive=alive)


def crop_pts_with_convexhull(p: "GaussianParams", pts: np.ndarray,
                             mode: str = "save", return_bbox: bool = False):
    """Crop (mode='save') or delete the gaussians inside the convex hull of
    `pts` (Delaunay membership test). Parity: reference
    scene/gaussian_model.py:643-658 (crop_pts_with_convexhull); the optional
    bbox is returned as (center [3], rotation [3,3], extent [3]) of the
    axis-aligned box of the selected points, matching the reference's
    OrientedBoundingBox-from-AABB construction without the open3d dependency.

    Returns params or (params, bbox) when return_bbox."""
    from scipy.spatial import Delaunay
    pc = compact(p)
    xyz = np.asarray(pc.xyz)
    inside = Delaunay(np.asarray(pts, np.float64)).find_simplex(xyz) >= 0
    bbox = None
    if return_bbox and inside.any():
        sel = xyz[inside]
        lo, hi = sel.min(axis=0), sel.max(axis=0)
        bbox = ((lo + hi) / 2.0, np.eye(3), hi - lo)
    out = crop_mask(pc, inside, mode=mode)
    return (out, bbox) if return_bbox else out


def combine(a: GaussianParams, b: GaussianParams,
            load_seg_feat: bool = True) -> GaussianParams:
    """Concatenate two gaussian sets (gaussian_model.py:621-641); new points get
    the mean normalized seg feature of `a`."""
    a = compact(a)
    b = compact(b)

    def cat(x, y):
        return jnp.concatenate([x, y], axis=0)

    seg = None
    if a.seg_feature is not None and load_seg_feat:
        feat = np.asarray(a.seg_feature)
        mean = (feat / (np.linalg.norm(feat, axis=-1, keepdims=True) + 1e-9)
                ).mean(0)
        seg_b = np.broadcast_to(mean, (b.capacity, len(mean))).astype(np.float32)
        seg = cat(a.seg_feature, jnp.asarray(seg_b))
    return GaussianParams(
        xyz=cat(a.xyz, b.xyz), features_dc=cat(a.features_dc, b.features_dc),
        features_rest=cat(a.features_rest, b.features_rest),
        scaling=cat(a.scaling, b.scaling), rotation=cat(a.rotation, b.rotation),
        opacity=cat(a.opacity, b.opacity), alive=cat(a.alive, b.alive),
        seg_feature=seg, active_sh_degree=a.active_sh_degree,
        max_sh_degree=a.max_sh_degree)


def set_3d_feat(p: GaussianParams, seg3d_masks: np.ndarray, seg_feat_dim: int,
                gram_feat: bool = False, seed: int = 0):
    """Initialize per-gaussian seg features; gram_feat orthogonalizes one anchor
    per instance and assigns it to member gaussians (gaussian_model.py:149-179).
    Returns (params, class_feat or None)."""
    if p.seg_feature is not None:
        return p, None
    rng = np.random.default_rng(seed)
    n = p.capacity
    feat = rng.random((n, seg_feat_dim)).astype(np.float32)
    class_feat = None
    if gram_feat:
        k = seg3d_masks.shape[1]
        init = rng.random((k, seg_feat_dim)).astype(np.float32)
        # gram-schmidt
        for i in range(k):
            v = init[i]
            for j in range(i):
                v = v - np.dot(v, init[j]) * init[j]
            init[i] = v / (np.linalg.norm(v) + 1e-9)
        alive_n = int(np.asarray(p.n_alive()))
        for i in range(k):
            ids = np.nonzero(seg3d_masks[:, i])[0]
            ids = ids[ids < alive_n]
            feat[ids] = init[i]
        class_feat = init
    feat = feat / (np.linalg.norm(feat, axis=1, keepdims=True) + 1e-9)
    return p.replace(seg_feature=jnp.asarray(feat)), class_feat

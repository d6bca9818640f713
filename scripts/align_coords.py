#!/usr/bin/env python
"""Rigidly rotate a reconstructed scene: COLMAP poses + points and/or a
trained gaussian PLY (xyz, quaternions, SH coefficients).

Parity target: reference utils/align_coords.py (which, as shipped, cannot
run — it imports `base_utils.*` modules that do not exist in the repo and
hardcodes a developer path; this is the working equivalent). Semantics
match its intent exactly:

  * the rotation comes from <scene>/rotation_angles.txt (extrinsic x-y-z
    Euler degrees, the reference's scipy 'xyz' convention) or --degrees;
  * --rotate_colmap: c2w' = R4 @ c2w for every image (written back as
    w2c quaternions/translations to sparse/0_align/), points x' = R x
    (align_coords.py:99-146);
  * --ply: gaussian xyz' = x Rᵀ, rotation' = q_R ⊗ q, and the rest-SH
    coefficients rotated per degree (align_coords.py:166-256 — the
    reference uses e3nn Wigner-D; we derive the real-SH blocks from the
    framework's own basis, utils/sh_rotation.py) → <ply>_align.ply.

SH rotation is exact: tests/test_data_layer.py::test_sh_rotation_equivariance
pins eval_sh(rotate(c), R d) == eval_sh(c, d) to f32 precision.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rotate_colmap(scene_dir: str, R4: np.ndarray) -> str:
    from instascene_tpu.data.colmap import (ColmapImage, read_cameras_binary,
                                            read_images_binary,
                                            read_points3D_binary,
                                            rotmat2qvec, qvec2rotmat,
                                            write_cameras_binary,
                                            write_images_binary,
                                            write_points3D_binary)
    sparse = os.path.join(scene_dir, "sparse", "0")
    cams = read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    ims = read_images_binary(os.path.join(sparse, "images.bin"))
    xyz, rgb, _ = read_points3D_binary(os.path.join(sparse, "points3D.bin"))

    out = {}
    for k, im in ims.items():
        w2c = np.eye(4)
        w2c[:3, :3] = qvec2rotmat(im.qvec)
        w2c[:3, 3] = im.tvec
        c2w = R4 @ np.linalg.inv(w2c)
        w2c2 = np.linalg.inv(c2w)
        out[k] = ColmapImage(id=im.id, qvec=rotmat2qvec(w2c2[:3, :3]),
                             tvec=w2c2[:3, 3], camera_id=im.camera_id,
                             name=im.name, xys=im.xys,
                             point3D_ids=im.point3D_ids)
    xyz2 = xyz @ R4[:3, :3].T

    save_dir = os.path.join(scene_dir, "sparse", "0_align")
    os.makedirs(save_dir, exist_ok=True)
    write_cameras_binary(cams, os.path.join(save_dir, "cameras.bin"))
    write_images_binary(out, os.path.join(save_dir, "images.bin"))
    write_points3D_binary(xyz2, rgb, os.path.join(save_dir, "points3D.bin"))
    return save_dir


def rotate_gaussians(ply_path: str, R: np.ndarray, seg_feat_dim: int = 16,
                     rotate_xyz=True, rotate_rot=True, rotate_sh=True) -> str:
    import jax.numpy as jnp

    from instascene_tpu.models.gaussians import load_ply, save_ply
    from instascene_tpu.utils.sh_rotation import (compose_quaternion,
                                                  rotate_sh_rest,
                                                  rotmat_to_quat)
    # segfeat PLYs load with their features; plain geometry PLYs without
    try:
        p = load_ply(ply_path, seg_feat_dim=seg_feat_dim, load_seg_feat=True)
    except Exception:
        p = load_ply(ply_path)
    if rotate_xyz:
        p = p.replace(xyz=jnp.asarray(np.asarray(p.xyz) @ R.T))
    if rotate_rot:
        q = np.asarray(p.rotation)
        q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
        p = p.replace(rotation=jnp.asarray(
            compose_quaternion(rotmat_to_quat(R), q).astype(np.float32)))
    if rotate_sh:
        p = p.replace(features_rest=jnp.asarray(
            rotate_sh_rest(np.asarray(p.features_rest), R)))
    out_path = os.path.splitext(ply_path)[0] + "_align.ply"
    save_ply(p, out_path)
    return out_path


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--scene_dir", required=True)
    ap.add_argument("--degrees", default="",
                    help="rx,ry,rz extrinsic Euler degrees; default: read "
                         "<scene_dir>/rotation_angles.txt")
    ap.add_argument("--rotate_colmap", action="store_true")
    ap.add_argument("--ply", default="",
                    help="gaussian PLY to rotate (xyz+rotation+SH) → "
                         "<ply>_align.ply")
    ap.add_argument("--seg_feat_dim", type=int, default=16)
    ap.add_argument("--no_xyz", action="store_true")
    ap.add_argument("--no_rotation", action="store_true")
    ap.add_argument("--no_sh", action="store_true")
    args = ap.parse_args()

    from instascene_tpu.utils.sh_rotation import euler_deg_to_rotmat
    if args.degrees:
        deg = [float(x) for x in args.degrees.split(",")]
    else:
        deg = np.loadtxt(os.path.join(args.scene_dir,
                                      "rotation_angles.txt")).reshape(-1)
    R = euler_deg_to_rotmat(deg)
    R4 = np.eye(4)
    R4[:3, :3] = R

    if args.rotate_colmap:
        out = rotate_colmap(args.scene_dir, R4)
        print(f"aligned COLMAP model -> {out}")
    if args.ply:
        out = rotate_gaussians(args.ply, R, seg_feat_dim=args.seg_feat_dim,
                               rotate_xyz=not args.no_xyz,
                               rotate_rot=not args.no_rotation,
                               rotate_sh=not args.no_sh)
        print(f"aligned gaussians -> {out}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Offline monocular-normal prior generation → <prior_dir>/*.png|npy.

The reference runs the StableNormal diffusion model offline
(semantic_modules/inference_stablenormal.py) and train.py consumes its outputs
via --w_normal_prior <dir> with the contract (utils/camera_utils.py:63-78):

  * <source>/<prior_dir>/<image>.png : normals encoded as (1 - n)/2 RGB, or
  * <source>/<prior_dir>/<image>.npy : [H,W,3] in [0,1] (same encoding)
  * decoded as n = -(2x - 1), then rotated camera→world by inv(R)

Preference order here:
  1. --hf_model: a HuggingFace normal estimator (requires local weights)
  2. --from_mesh: bake normals by rasterizing a mesh through the framework's
     tile rasterizer (the reference's raytracing-based Camera.get_mesh_normal)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def normals_from_mesh(source_path, images, mesh_path, out_dir):
    from PIL import Image

    from instascene_tpu.config import ModelParams
    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.data.ply import read_ply
    from instascene_tpu.ops.mesh_raster import mesh_normal_prior

    mesh = read_ply(mesh_path)
    v = mesh["vertex"]
    verts = np.stack([v["x"], v["y"], v["z"]], -1).astype(np.float32)
    # faces stored in a face element; use the mesh writer's layout
    import struct
    # fall back: triangulate via trimesh-like parse unsupported — require our
    # writer's binary layout
    raise SystemExit("mesh-face parsing for external PLYs is not wired here; "
                     "use instascene_tpu.ops.mesh_raster.mesh_normal_prior "
                     "programmatically with (verts, faces) arrays")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_path", "-s", required=True)
    ap.add_argument("--images", default="images")
    ap.add_argument("--out_dir", default="stablenormal_normals")
    ap.add_argument("--hf_model", default="",
                    help="e.g. Stable-X/StableNormal (needs local weights)")
    args = ap.parse_args()

    img_dir = os.path.join(args.source_path, args.images)
    out_dir = os.path.join(args.source_path, args.out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if not args.hf_model:
        raise SystemExit("provide --hf_model (see docstring for the "
                         "normal-prior contract)")

    import torch
    from PIL import Image
    pipe = torch.hub.load("Stable-X/StableNormal", "StableNormal",
                          trust_repo=True) if args.hf_model == "hub" else None
    if pipe is None:
        from diffusers import DiffusionPipeline  # optional dependency
        pipe = DiffusionPipeline.from_pretrained(args.hf_model)
    for f in sorted(os.listdir(img_dir)):
        if not f.lower().endswith((".png", ".jpg", ".jpeg")):
            continue
        img = Image.open(os.path.join(img_dir, f)).convert("RGB")
        normal = pipe(img)
        arr = np.asarray(normal, np.float32)
        np.save(os.path.join(out_dir, f.split(".")[0] + ".npy"), arr)
        print("wrote", f)


if __name__ == "__main__":
    main()

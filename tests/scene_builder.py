"""Build a fully-renderable synthetic scene for end-to-end tests: three
colored gaussian blobs, cameras on a circle, ground-truth images + instance
segmaps rendered by our own rasterizer, COLMAP files + point_cloud.ply."""

import os

import numpy as np

import jax.numpy as jnp

from instascene_tpu.cameras import Camera
from instascene_tpu.data.synthetic import make_synthetic_scene
from instascene_tpu.models.gaussians import GaussianParams, save_ply
from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                          rasterize)
from instascene_tpu.utils.general import inverse_sigmoid


def make_blob_gaussians(seed=0, n_per=60, spread=0.25, scale=-2.3):
    """3 instance blobs with distinct base colors. Returns params + labels."""
    rng = np.random.default_rng(seed)
    centers = np.array([[-0.9, 0.0, 0.0], [0.9, 0.0, 0.0], [0.0, 0.9, 0.3]])
    base_colors = np.array([[0.9, 0.15, 0.1], [0.1, 0.8, 0.2],
                            [0.15, 0.2, 0.9]])
    xyz, colors, labels = [], [], []
    for i, (c, col) in enumerate(zip(centers, base_colors)):
        pts = c + rng.normal(0, spread, (n_per, 3))
        xyz.append(pts)
        colors.append(np.tile(col, (n_per, 1))
                      + rng.normal(0, 0.03, (n_per, 3)))
        labels.append(np.full(n_per, i + 1))
    xyz = np.concatenate(xyz).astype(np.float32)
    colors = np.clip(np.concatenate(colors), 0, 1).astype(np.float32)
    labels = np.concatenate(labels).astype(np.int32)
    n = len(xyz)

    from instascene_tpu.ops.sh import RGB2SH
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(RGB2SH(colors)[:, None, :]),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.full((n, 2), scale),
        rotation=jnp.asarray(
            rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.full((n, 1), float(inverse_sigmoid(0.9))),
        alive=jnp.ones(n, bool),
        active_sh_degree=0, max_sh_degree=3)
    return params, labels


def render_gt(params, labels, cam: Camera, bg=np.zeros(3)):
    """Render (rgb [H,W,3], segmap [H,W] int) with our rasterizer."""
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cfg = RasterizeConfig(width=cam.width, height=cam.height, chunk=16,
                          pair_cap=65536, tile_cap=256)
    onehot = np.zeros((len(labels), 4), np.float32)
    onehot[np.arange(len(labels)), labels] = 1.0
    out = rasterize(params.xyz, params.scaling_activated(),
                    params.rotation_normalized(),
                    params.opacity_activated()[:, 0], cm,
                    jnp.asarray(bg, dtype=jnp.float32), cfg,
                    shs=params.features(), sh_degree=0,
                    extras=jnp.asarray(onehot))
    rgb = np.clip(np.asarray(out.blend.color), 0, 1)
    seg_scores = np.asarray(out.blend.extra)
    alpha = np.asarray(out.blend.alpha)
    seg = np.argmax(seg_scores, axis=-1).astype(np.int32)
    seg[alpha < 0.5] = 0
    return rgb, seg


def build_e2e_scene(out_dir: str, width=64, height=48, n_cams=8, seed=0,
                    with_segmaps=True):
    """Creates scene dir with rendered gt images (+ segmaps + pretrained ply).
    Returns (params, labels, cam_list)."""
    params, labels = make_blob_gaussians(seed)
    make_synthetic_scene(out_dir, n_points=120, n_cams=n_cams, width=width,
                         height=height, radius=4.0, seed=seed,
                         write_images=False)
    # replace random SfM points by blob subsamples (for KNN-scale realism)
    from instascene_tpu.data.colmap import (write_points3D_binary)
    rng = np.random.default_rng(seed)
    xyz = np.asarray(params.xyz)
    sub = rng.choice(len(xyz), 120, replace=False)
    rgbs = (np.clip(np.asarray(params.features_dc)[:, 0, :] * 0.282 + 0.5,
                    0, 1) * 255).astype(np.uint8)
    write_points3D_binary(xyz[sub], rgbs[sub],
                          os.path.join(out_dir, "sparse/0/points3D.bin"))
    ply = os.path.join(out_dir, "sparse/0/points3D.ply")
    if os.path.exists(ply):
        os.remove(ply)

    from PIL import Image

    from instascene_tpu.config import ModelParams
    from instascene_tpu.data.dataset import read_colmap_scene
    info = read_colmap_scene(out_dir, "images", False)
    os.makedirs(os.path.join(out_dir, "images"), exist_ok=True)
    if with_segmaps:
        os.makedirs(os.path.join(out_dir, "sam/mask"), exist_ok=True)
    cams = []
    for ci in info.train_cameras:
        cam = Camera(uid=ci.uid, colmap_id=ci.uid, R=ci.R, T=ci.T,
                     fovx=ci.FovX, fovy=ci.FovY, image_name=ci.image_name,
                     width=width, height=height)
        rgb, seg = render_gt(params, labels, cam)
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(out_dir, "images", ci.image_name + ".png"))
        if with_segmaps:
            Image.fromarray(seg.astype(np.uint8)).save(
                os.path.join(out_dir, "sam/mask", ci.image_name + ".png"))
        cams.append(cam)
    save_ply(params, os.path.join(out_dir, "point_cloud.ply"))
    return params, labels, cams

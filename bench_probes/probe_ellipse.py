#!/usr/bin/env python
"""Exact-ish ellipse-vs-tile pair-culling headroom, per scene profile.

Round-3 measured 0% cullable pairs on the uniform bench profile (isotropic
near-filter-floor splats: rects are 1-2 tiles, no dead corners) and declared
pair culling a dead end AT THAT PROFILE. This probe re-decides the call on
the trained profile (anisotropic log-normal scales — elongated ellipses in
axis-aligned boxes leave dead corner tiles).

Method: for a random subset of gaussians, walk every (gaussian, tile) pair
of its binned rect and evaluate rho = min(rho3d, rho2d) on a 17x17 pixel
grid over the tile; the pair is cullable iff min rho > thr where
thr = 2*ln(255*opacity) (the kernels' alpha >= 1/255 mask, forward.cu:386)
— with a 1.2x safety margin for the sampling granularity. Runs on CPU.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    if jax.default_backend() != "cpu":
        pass  # fine either way; pure vectorized math
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.preprocess import (FILTER_INV_SQUARE,
                                               preprocess_gaussians)
    from instascene_tpu.ops.rasterize import CameraMats

    width, height = 1920, 1080
    tile = 16
    grid_x = width // tile
    n_sub = int(os.environ.get("PROBE_SUB", 40_000))

    for profile in ("uniform", "trained"):
        params, make_cam = make_bench_scene(n=300_000, profile=profile)
        cam = make_cam(0, width, height)
        cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                        jnp.asarray(cam.camera_center))
        pre = preprocess_gaussians(
            params.xyz, params.scaling_activated(),
            params.rotation_normalized(), cm.w2v, cm.full_proj, cm.campos,
            width, height, color=params.xyz * 0.0, alive=params.alive,
            opacity=params.opacity_activated())
        T = np.asarray(pre.T)
        xy = np.asarray(pre.xy)
        rmin = np.asarray(pre.rect_min)
        rmax = np.asarray(pre.rect_max)
        touched = np.asarray(pre.tiles_touched)
        opa = np.asarray(params.opacity_activated())[:, 0]

        rng = np.random.default_rng(0)
        vis = np.nonzero(touched > 0)[0]
        sub = rng.choice(vis, min(n_sub, len(vis)), replace=False)

        # per-gaussian affine ray coefficients (pack_flat_cols equivalence)
        Tu, Tv, Tw = T[sub, 0], T[sub, 1], T[sub, 2]
        A = np.cross(Tv, Tw)
        B = np.cross(Tw, Tu)
        C = np.cross(Tu, Tv)
        thr = 2.0 * np.log(np.maximum(255.0 * opa[sub], 1.0 + 1e-6))

        # 17x17 sample grid inside a tile (1-px steps incl. both borders)
        g = np.arange(0, tile + 1, 1.0)
        gx, gy = np.meshgrid(g, g)
        gx = gx.reshape(-1)
        gy = gy.reshape(-1)

        total_pairs = 0
        cullable = 0
        chunk = 4096
        for s0 in range(0, len(sub), chunk):
            sl = slice(s0, min(s0 + chunk, len(sub)))
            k = sl.stop - sl.start
            rm, rM = rmin[sub[sl]], rmax[sub[sl]]
            w_t = rM[:, 0] - rm[:, 0]
            h_t = rM[:, 1] - rm[:, 1]
            max_w, max_h = int(w_t.max()), int(h_t.max())
            for ti in range(max_h):
                for tj in range(max_w):
                    inside = (ti < h_t) & (tj < w_t)
                    if not inside.any():
                        continue
                    tx = (rm[:, 0] + tj) * tile
                    ty = (rm[:, 1] + ti) * tile
                    px = tx[:, None] + gx[None, :]
                    py = ty[:, None] + gy[None, :]
                    pz = px * A[sl, 2:3] + py * B[sl, 2:3] + C[sl, 2:3]
                    pz = np.where(pz == 0, 1e-12, pz)
                    sx = (px * A[sl, 0:1] + py * B[sl, 0:1] + C[sl, 0:1]) / pz
                    sy = (px * A[sl, 1:2] + py * B[sl, 1:2] + C[sl, 1:2]) / pz
                    rho3d = sx * sx + sy * sy
                    dx = xy[sub[sl], 0:1] - px
                    dy = xy[sub[sl], 1:2] - py
                    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
                    rho = np.minimum(rho3d, rho2d)
                    mn = rho.min(axis=1)
                    total_pairs += int(inside.sum())
                    cullable += int((inside & (mn > thr[sl] * 1.2)).sum())
        print(f"{profile}: sampled {len(sub)} gaussians, "
              f"{total_pairs} pairs, cullable {cullable} "
              f"({100.0 * cullable / max(total_pairs, 1):.1f}%)", flush=True)


if __name__ == "__main__":
    main()

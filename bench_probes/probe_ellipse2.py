#!/usr/bin/env python
"""Exact conic-vs-tile pair-culling headroom (the implementable test).

A pair (gaussian, tile) can contribute iff some pixel of the tile reaches
alpha >= 1/255, i.e. rho = min(rho3d, rho2d) <= thr = 2*ln(255*opacity).
rho3d <= thr <=> Q(x,y) = (x A0+y B0+C0)^2 + (x A1+y B1+C1)^2
                          - thr (x A2+y B2+C2)^2 <= 0.
Q is a quadratic in (x,y): its exact min over the tile box is attained at a
corner, an edge 1-D critical point, or the interior stationary point — 9
candidates, all closed-form. The rho2d disk test is a clamped-point
distance. Culling a pair with minQ > 0 and a missed disk is bit-exact (the
kernels mask alpha < 1/255 identically, forward.cu:386).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def quad_min_over_box(a, b, c, d, e, f, x0, x1, y0, y1):
    """Exact min of Q = a x^2 + b y^2 + c xy + d x + e y + f over
    [x0,x1]x[y0,y1]. All inputs [..., P] broadcastable arrays."""
    def Q(x, y):
        return a * x * x + b * y * y + c * x * y + d * x + e * y + f

    best = np.minimum(np.minimum(Q(x0, y0), Q(x0, y1)),
                      np.minimum(Q(x1, y0), Q(x1, y1)))
    # edge x=const: dQ/dy = 0 -> y* = -(c x + e) / (2b)
    for xc in (x0, x1):
        with np.errstate(divide="ignore", invalid="ignore"):
            ys = -(c * xc + e) / (2.0 * b)
        ok = np.isfinite(ys) & (ys > y0) & (ys < y1)
        best = np.where(ok, np.minimum(best, Q(xc, np.where(ok, ys, y0))),
                        best)
    for yc in (y0, y1):
        with np.errstate(divide="ignore", invalid="ignore"):
            xs = -(c * yc + d) / (2.0 * a)
        ok = np.isfinite(xs) & (xs > x0) & (xs < x1)
        best = np.where(ok, np.minimum(best, Q(np.where(ok, xs, x0), yc)),
                        best)
    # interior stationary point: solve [2a c; c 2b] [x;y] = -[d;e]
    det = 4.0 * a * b - c * c
    with np.errstate(divide="ignore", invalid="ignore"):
        xi = (-2.0 * b * d + c * e) / det
        yi = (-2.0 * a * e + c * d) / det
    ok = (np.abs(det) > 1e-20) & (xi > x0) & (xi < x1) & (yi > y0) & (yi < y1)
    best = np.where(ok, np.minimum(best, Q(np.where(ok, xi, x0),
                                           np.where(ok, yi, y0))), best)
    return best


def main():
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.preprocess import (FILTER_INV_SQUARE,
                                               preprocess_gaussians)
    from instascene_tpu.ops.rasterize import CameraMats

    width, height = 1920, 1080
    tile = 16
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
        Tu, Tv, Tw = T[sub, 0], T[sub, 1], T[sub, 2]
        A = np.cross(Tv, Tw)
        B = np.cross(Tw, Tu)
        C = np.cross(Tu, Tv)
        thr = 2.0 * np.log(np.maximum(255.0 * opa[sub], 1.0 + 1e-6))
        # Q = sum_k (x A_k + y B_k + C_k)^2 for k=0,1 minus thr*(k=2 term)
        s = np.array([1.0, 1.0])
        qa = A[:, 0] ** 2 + A[:, 1] ** 2 - thr * A[:, 2] ** 2
        qb = B[:, 0] ** 2 + B[:, 1] ** 2 - thr * B[:, 2] ** 2
        qc = 2.0 * (A[:, 0] * B[:, 0] + A[:, 1] * B[:, 1]
                    - thr * A[:, 2] * B[:, 2])
        qd = 2.0 * (A[:, 0] * C[:, 0] + A[:, 1] * C[:, 1]
                    - thr * A[:, 2] * C[:, 2])
        qe = 2.0 * (B[:, 0] * C[:, 0] + B[:, 1] * C[:, 1]
                    - thr * B[:, 2] * C[:, 2])
        qf = C[:, 0] ** 2 + C[:, 1] ** 2 - thr * C[:, 2] ** 2
        r2d = np.sqrt(np.maximum(thr, 0.0) / FILTER_INV_SQUARE)

        total_pairs = 0
        cullable = 0
        rm, rM = rmin[sub], rmax[sub]
        w_t = rM[:, 0] - rm[:, 0]
        h_t = rM[:, 1] - rm[:, 1]
        for ti in range(int(h_t.max())):
            for tj in range(int(w_t.max())):
                inside = (ti < h_t) & (tj < w_t)
                if not inside.any():
                    continue
                x0 = (rm[:, 0] + tj) * float(tile)
                y0 = (rm[:, 1] + ti) * float(tile)
                x1 = x0 + tile - 1.0
                y1 = y0 + tile - 1.0
                qmin = quad_min_over_box(qa, qb, qc, qd, qe, qf,
                                         x0, x1, y0, y1)
                # low-pass disk vs box
                cxx = np.clip(xy[sub, 0], x0, x1)
                cyy = np.clip(xy[sub, 1], y0, y1)
                dd = (xy[sub, 0] - cxx) ** 2 + (xy[sub, 1] - cyy) ** 2
                disk_hits = dd <= r2d * r2d
                cull = (qmin > 0.0) & ~disk_hits
                total_pairs += int(inside.sum())
                cullable += int((inside & cull).sum())
        print(f"{profile}: {len(sub)} gaussians, {total_pairs} pairs, "
              f"exact-cullable {cullable} "
              f"({100.0 * cullable / max(total_pairs, 1):.1f}%)", flush=True)


if __name__ == "__main__":
    main()

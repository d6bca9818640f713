"""Brute-force numpy oracle renderer for correctness tests.

Sequentially replays the exact CUDA forward semantics
(cuda_rasterizer/forward.cu:256-462) pixel-synchronously: gaussians globally
sorted by view depth (equivalent to the per-tile sort for tie-free depths),
each applied only to pixels whose tile lies in the gaussian's screen rect.
Slow (O(N · pixels)), tiny scenes only.
"""

from __future__ import annotations

import numpy as np

from .preprocess import FAR_N, FILTER_INV_SQUARE, NEAR_N


def render_brute(pre_np: dict, opacity: np.ndarray, color: np.ndarray,
                 extra, bg: np.ndarray, width: int, height: int,
                 tile: int = 16):
    """pre_np: numpy dict of preprocess outputs (T, normal_view, depth, xy,
    radius, rect_min, rect_max, valid). Returns dict of [H,W,·] maps."""
    n = opacity.shape[0]
    E = extra.shape[1] if extra is not None else 0
    npx = width * height
    px, py = np.meshgrid(np.arange(width), np.arange(height))
    px = px.reshape(-1).astype(np.float32)
    py = py.reshape(-1).astype(np.float32)
    tilex = (px.astype(int)) // tile
    tiley = (py.astype(int)) // tile

    order = np.argsort(pre_np["depth"], kind="stable")
    order = order[pre_np["valid"][order]]

    T = np.ones(npx, np.float32)
    done = np.zeros(npx, bool)
    C = np.zeros((npx, 3), np.float32)
    Nrm = np.zeros((npx, 3), np.float32)
    D = np.zeros(npx, np.float32)
    Ex = np.zeros((npx, E), np.float32)
    M1 = np.zeros(npx, np.float32)
    M2 = np.zeros(npx, np.float32)
    dist = np.zeros(npx, np.float32)
    med = np.zeros(npx, np.float32)
    pairs = []  # (gid, pix_id) where w > 0.1

    for g in order:
        Tg = pre_np["T"][g]  # [3,3] rows Tu,Tv,Tw
        Tu, Tv, Tw = Tg[0], Tg[1], Tg[2]
        rmin, rmax = pre_np["rect_min"][g], pre_np["rect_max"][g]
        in_rect = ((tilex >= rmin[0]) & (tilex < rmax[0])
                   & (tiley >= rmin[1]) & (tiley < rmax[1]))
        k = px[:, None] * Tw[None, :] - Tu[None, :]
        l = py[:, None] * Tw[None, :] - Tv[None, :]
        p = np.cross(k, l)
        pz_ok = p[:, 2] != 0
        pz = np.where(pz_ok, p[:, 2], 1.0)
        sx, sy = p[:, 0] / pz, p[:, 1] / pz
        rho3d = sx * sx + sy * sy
        dxy = pre_np["xy"][g][None, :] - np.stack([px, py], -1)
        rho2d = FILTER_INV_SQUARE * (dxy ** 2).sum(-1)
        use3d = rho3d <= rho2d
        rho = np.where(use3d, rho3d, rho2d)
        depth_ray = np.where(use3d, sx * Tw[0] + sy * Tw[1] + Tw[2], Tw[2])
        power = -0.5 * rho
        alpha = np.minimum(0.99, opacity[g] * np.exp(power))
        m = (in_rect & pz_ok & (depth_ray >= NEAR_N) & (power <= 0)
             & (alpha >= 1 / 255) & ~done)
        test_T = T * (1 - alpha)
        newly_done = m & (test_T < 1e-4)
        done = done | newly_done
        c = m & ~newly_done
        w = np.where(c, alpha * T, 0.0)

        md = FAR_N / (FAR_N - NEAR_N) * (1 - NEAR_N / np.where(c, depth_ray, 1.0))
        A = 1 - T
        dist += (md * md * A + M2 - 2 * md * M1) * w
        D += depth_ray * w
        M1 += md * w
        M2 += md * md * w
        med = np.where(c & (T > 0.5), depth_ray, med)
        C += w[:, None] * pre_np["color"][g][None, :]
        Nrm += w[:, None] * pre_np["normal_view"][g][None, :]
        if E:
            Ex += w[:, None] * extra[g][None, :]
        for pix in np.nonzero(w > 0.1)[0]:
            pairs.append((int(g), int(pix)))
        T = np.where(c, test_T, T)

    out_color = C + T[:, None] * bg[None, :]
    shp = (height, width)
    return {
        "color": out_color.reshape(height, width, 3),
        "depth": D.reshape(shp),
        "alpha": (1 - T).reshape(shp),
        "normal": Nrm.reshape(height, width, 3),
        "median_depth": med.reshape(shp),
        "distortion": dist.reshape(shp),
        "extra": Ex.reshape(height, width, E),
        "final_T": T.reshape(shp),
        "pairs": pairs,
    }

"""Tile-based triangle rasterizer: camera-ray mesh queries without a BVH.

TPU-native replacement for the reference's CUDA BVH ray tracer
(submodules/raytracing/src/bvh.cu, consumed only through
Camera.get_mesh_normal, scene/cameras.py:107-125): for pinhole-camera ray
bundles, a z-buffered tile rasterizer answers the same query —
(position, face_normal, face_id, depth) per pixel — as a data-parallel scan
instead of divergent tree traversal. Triangles are binned to 16x16 tiles with
the same static-capacity interval-expand used for gaussians; the per-tile pass
keeps a running min-depth (order-independent, no sort needed).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


class MeshRasterOut(NamedTuple):
    depth: jnp.ndarray     # [H,W] view-space z (0 = miss)
    face_id: jnp.ndarray   # [H,W] int32 (-1 = miss)
    position: jnp.ndarray  # [H,W,3] world-space hit point
    normal: jnp.ndarray    # [H,W,3] unit face normal (world)


@partial(jax.jit, static_argnames=("width", "height", "tile", "chunk",
                                   "pair_cap", "tile_cap"))
def rasterize_mesh(verts, faces, w2v, intr, width: int, height: int,
                   tile: int = 16, chunk: int = 64,
                   pair_cap: int = 1 << 20, tile_cap: int = 2048
                   ) -> MeshRasterOut:
    """verts [V,3] f32 world; faces [F,3] int32; w2v [4,4]; intr (fx,fy,cx,cy)."""
    f32 = jnp.float32
    verts = verts.astype(f32)
    grid_x = (width + tile - 1) // tile
    grid_y = (height + tile - 1) // tile
    num_tiles = grid_x * grid_y
    nf = faces.shape[0]

    pv = verts @ w2v[:3, :3].T + w2v[:3, 3]
    z = pv[:, 2]
    zs = jnp.maximum(z, 1e-6)
    u = pv[:, 0] / zs * intr[0] + intr[2]
    v = pv[:, 1] / zs * intr[1] + intr[3]
    tri_u = u[faces]                               # [F,3]
    tri_v = v[faces]
    tri_z = z[faces]
    valid = jnp.all(tri_z > 1e-4, axis=1)

    # tile rects from screen bboxes
    umin = jnp.min(tri_u, axis=1)
    umax = jnp.max(tri_u, axis=1)
    vmin = jnp.min(tri_v, axis=1)
    vmax = jnp.max(tri_v, axis=1)
    rx0 = jnp.clip(jnp.floor(umin / tile), 0, grid_x).astype(jnp.int32)
    ry0 = jnp.clip(jnp.floor(vmin / tile), 0, grid_y).astype(jnp.int32)
    rx1 = jnp.clip(jnp.floor(umax / tile) + 1, 0, grid_x).astype(jnp.int32)
    ry1 = jnp.clip(jnp.floor(vmax / tile) + 1, 0, grid_y).astype(jnp.int32)
    tiles_touched = jnp.where(valid, (rx1 - rx0) * (ry1 - ry0), 0)

    # interval expand (same trick as ops/binning.py)
    csum = jnp.cumsum(tiles_touched)
    total = csum[-1]
    offsets = csum - tiles_touched
    marker = jnp.zeros((pair_cap + 1,), jnp.int32)
    marker = marker.at[jnp.minimum(offsets, pair_cap)].add(1)
    fid = jnp.cumsum(marker[:pair_cap]) - 1
    slot_ok = jnp.arange(pair_cap) < jnp.minimum(total, pair_cap)
    fid = jnp.where(slot_ok, fid, 0)
    rank = jnp.arange(pair_cap, dtype=jnp.int32) - offsets[fid]
    rw = jnp.maximum(rx1[fid] - rx0[fid], 1)
    dy = rank // rw
    dx = rank - dy * rw
    tile_id = (ry0[fid] + dy) * grid_x + (rx0[fid] + dx)
    tile_id = jnp.where(slot_ok, tile_id, num_tiles)
    sorted_tile, sorted_fid = jax.lax.sort((tile_id, fid), num_keys=1)
    sorted_fid = jnp.where(sorted_tile < num_tiles, sorted_fid, nf)
    tstart = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles)
                              ).astype(jnp.int32)
    tcount = jnp.searchsorted(sorted_tile, jnp.arange(num_tiles),
                              side="right").astype(jnp.int32) - tstart
    k_idx = jnp.arange(tile_cap)
    pos = jnp.where((k_idx[None] < tcount[:, None])
                    & (tstart[:, None] + k_idx[None] < pair_cap),
                    tstart[:, None] + k_idx[None], pair_cap - 1)
    tile_faces = jnp.where(k_idx[None] < tcount[:, None],
                           sorted_fid[pos], nf)       # [T,K]

    # pad face attrs with sentinel row
    pad = lambda a: jnp.concatenate([a, jnp.zeros((1,) + a.shape[1:],
                                                  a.dtype)], 0)
    tri_u_p, tri_v_p, tri_z_p = pad(tri_u), pad(tri_v), pad(tri_z)

    P2 = tile * tile
    lane = jnp.arange(tile, dtype=f32)
    n_chunks = (tile_cap + chunk - 1) // chunk
    K_pad = n_chunks * chunk
    if K_pad != tile_cap:
        tile_faces = jnp.pad(tile_faces, ((0, 0), (0, K_pad - tile_cap)),
                             constant_values=nf)

    def tile_fn(t, frow):
        ty = (t // grid_x).astype(f32)
        tx = (t % grid_x).astype(f32)
        pxf = jnp.broadcast_to((tx * tile + lane)[None], (tile, tile)
                               ).reshape(-1)
        pyf = jnp.broadcast_to((ty * tile + lane)[:, None], (tile, tile)
                               ).reshape(-1)

        def body(carry, idx):
            best_z, best_f = carry
            f = idx
            ok = f != nf
            au, av = tri_u_p[f][:, 0], tri_v_p[f][:, 0]
            bu, bv = tri_u_p[f][:, 1], tri_v_p[f][:, 1]
            cu, cv = tri_u_p[f][:, 2], tri_v_p[f][:, 2]
            area = (bu - au) * (cv - av) - (bv - av) * (cu - au)
            area_ok = jnp.abs(area) > 1e-12
            inv_area = jnp.where(area_ok, 1.0 / jnp.where(area_ok, area, 1.0),
                                 0.0)
            px = pxf[None, :]
            py = pyf[None, :]
            w0 = ((bu[:, None] - px) * (cv[:, None] - py)
                  - (bv[:, None] - py) * (cu[:, None] - px)) * inv_area[:, None]
            w1 = ((cu[:, None] - px) * (av[:, None] - py)
                  - (cv[:, None] - py) * (au[:, None] - px)) * inv_area[:, None]
            w2 = 1.0 - w0 - w1
            inside = (w0 >= 0) & (w1 >= 0) & (w2 >= 0)
            # perspective-correct depth: 1/z interpolates linearly in screen
            inv_z = (w0 / tri_z_p[f][:, 0:1] + w1 / tri_z_p[f][:, 1:2]
                     + w2 / tri_z_p[f][:, 2:3])
            zhit = 1.0 / jnp.maximum(inv_z, 1e-12)
            hit = inside & ok[:, None] & area_ok[:, None] & (zhit > 1e-4)
            zhit = jnp.where(hit, zhit, jnp.inf)
            zmin = jnp.min(zhit, axis=0)
            amin = jnp.argmin(zhit, axis=0)
            f_at = f[amin]
            upd = zmin < best_z
            return (jnp.where(upd, zmin, best_z),
                    jnp.where(upd, f_at, best_f)), None

        carry0 = (jnp.full((P2,), jnp.inf), jnp.full((P2,), nf, jnp.int32))
        (bz, bf), _ = jax.lax.scan(body, carry0,
                                   frow.reshape(n_chunks, chunk))
        return bz, bf

    bz, bf = jax.vmap(tile_fn)(jnp.arange(num_tiles, dtype=jnp.int32),
                               tile_faces)

    def to_map(x):
        ch = x.shape[2:]
        x = x.reshape(grid_y, grid_x, tile, tile, *ch)
        return jnp.moveaxis(x, 2, 1).reshape(grid_y * tile, grid_x * tile,
                                             *ch)[:height, :width]

    depth = to_map(bz[..., None])[..., 0]
    face = to_map(bf[..., None])[..., 0]
    miss = ~jnp.isfinite(depth) | (face >= nf)
    depth = jnp.where(miss, 0.0, depth)
    face_out = jnp.where(miss, -1, face)

    # world position + face normal
    face_safe = jnp.where(miss, 0, face)
    fverts = verts[faces[face_safe]]              # [H,W,3,3]
    n = jnp.cross(fverts[..., 1, :] - fverts[..., 0, :],
                  fverts[..., 2, :] - fverts[..., 0, :])
    n = n * jax.lax.rsqrt(jnp.sum(n * n, axis=-1, keepdims=True) + 1e-24)
    c2w_rot = w2v[:3, :3].T
    cam_center = -(w2v[:3, :3].T @ w2v[:3, 3])
    xs = (jnp.arange(width, dtype=f32) - intr[2]) / intr[0]
    ys = (jnp.arange(height, dtype=f32) - intr[3]) / intr[1]
    xx, yy = jnp.meshgrid(xs, ys)
    dirs_cam = jnp.stack([xx, yy, jnp.ones_like(xx)], -1)
    dirs_w = jnp.einsum("hwk,jk->hwj", dirs_cam, c2w_rot.T)
    position = cam_center + depth[..., None] * dirs_w
    zero3 = jnp.zeros_like(n)
    return MeshRasterOut(depth=depth, face_id=face_out,
                         position=jnp.where(miss[..., None], 0.0, position),
                         normal=jnp.where(miss[..., None], zero3, n))


def mesh_normal_prior(cam, verts: np.ndarray, faces: np.ndarray):
    """Camera.get_mesh_normal parity (scene/cameras.py:107-125): per-pixel
    world-frame face normals + validity mask for the mono-normal-prior loss."""
    intr = jnp.asarray([cam.focal_x, cam.focal_y, cam.width / 2.0,
                        cam.height / 2.0], jnp.float32)
    out = rasterize_mesh(jnp.asarray(verts, dtype=jnp.float32),
                         jnp.asarray(faces, dtype=jnp.int32),
                         jnp.asarray(cam.w2c.astype(np.float32)), intr,
                         int(cam.width), int(cam.height))
    normal = np.asarray(out.normal)
    norm = np.linalg.norm(normal, axis=-1, keepdims=True)
    mask = ~((norm[..., 0] > 1.1) | (norm[..., 0] < 0.9))
    return normal / np.maximum(norm, 1e-9), mask

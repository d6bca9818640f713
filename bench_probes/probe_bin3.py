#!/usr/bin/env python
"""TPU probe (round 3): decompose the 21 ms 1080p visit-layout binning into
preprocess / expand+chains / sort / ranges+visits, and measure the
full-frame maps overhead, to pick the next optimization target."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 12
ITERS = 10


def chain(fn, label):
    import jax
    import jax.numpy as jnp
    s = jnp.zeros(())
    out = fn(s)
    jax.block_until_ready(out)
    for _ in range(WARMUP):
        out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<52s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians, build_visits
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)

    width, height = 1920, 1080
    tile = 16
    grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cap0 = RasterizeConfig(width=width, height=height).resolved(n).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=cap0, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        if total < 0.95 * cap0:
            break
        cap0 *= 2
    pair_cap = (int(total * 1.1) + 127) // 128 * 128
    print(f"pairs={total} cap={pair_cap}", flush=True)

    # visit-count composition
    tcn = np.asarray(tc)
    nonempty = tcn[tcn > 0]
    spans = np.sum(np.minimum(np.cumsum(tcn), pair_cap) // 128
                   - np.minimum(np.cumsum(tcn) - tcn, pair_cap) // 128 + 1)
    print(f"tiles={num_tiles} empty={np.sum(tcn == 0)} "
          f"median_pairs={np.median(nonempty):.0f} "
          f"visits~={spans + np.sum(tcn == 0)}", flush=True)

    xyz, sc, rot = (params.xyz, params.scaling_activated(),
                    params.rotation_normalized())
    shs = params.features()

    @jax.jit
    def pre_only(s):
        pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                   cm.full_proj, cm.campos, width, height,
                                   shs=shs, sh_degree=3, tile=tile,
                                   alive=params.alive)
        return pre.T[0, 0, 0] * 1e-20 + pre.tiles_touched[0] * 1e-20 + s
    chain(pre_only, "preprocess only (SH3)")

    def bin_partial(stop):
        @jax.jit
        def f(s):
            pre = preprocess_gaussians(xyz + s * 1e-30, sc, rot, cm.w2v,
                                       cm.full_proj, cm.campos, width, height,
                                       shs=shs, sh_degree=3, tile=tile,
                                       alive=params.alive)
            tiles_touched = jax.lax.stop_gradient(pre.tiles_touched)
            depth = jax.lax.stop_gradient(pre.depth)
            rect_min, rect_max = pre.rect_min, pre.rect_max
            csum = jnp.cumsum(tiles_touched)
            total = csum[-1]
            offsets = csum - tiles_touched
            marker = jnp.zeros((pair_cap + 1,), jnp.int32)
            scatter_pos = jnp.minimum(offsets, pair_cap)
            marker = marker.at[scatter_pos].add(jnp.ones((n,), jnp.int32))
            gid = jnp.cumsum(marker[:pair_cap]) - 1
            slot_valid = (jnp.arange(pair_cap, dtype=jnp.int32)
                          < jnp.minimum(total, pair_cap))
            gid = jnp.where(slot_valid, gid, 0)
            depth_bits = 17
            g_valid = tiles_touched > 0
            dmin = jnp.min(jnp.where(g_valid, depth, jnp.inf))
            dmax = jnp.max(jnp.where(g_valid, depth, -jnp.inf))
            dqg = jnp.clip((depth - dmin) / jnp.maximum(dmax - dmin, 1e-12),
                           0.0, 1.0)
            dqg = jnp.clip((dqg * ((1 << depth_bits) - 1)).astype(jnp.int32),
                           0, (1 << depth_bits) - 1)
            rw_g = jnp.maximum(rect_max[:, 0] - rect_min[:, 0], 1)

            def seg_broadcast(col):
                d = col - jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                           col[:-1]])
                buf = jnp.zeros((pair_cap + 1,), jnp.int32
                                ).at[scatter_pos].add(d)
                return jnp.cumsum(buf[:pair_cap])

            arange_pairs = jnp.arange(pair_cap, dtype=jnp.int32)
            b1 = seg_broadcast(((offsets.astype(jnp.int32) << 10)
                                | rw_g).astype(jnp.int32))
            b_off = b1 >> 10
            rw = jnp.maximum(b1 & 1023, 1)
            b_rect = seg_broadcast(((rect_min[:, 1] << 10)
                                    | rect_min[:, 0]).astype(jnp.int32))
            b_depth = seg_broadcast(dqg)
            rank = jnp.where(slot_valid, arange_pairs - b_off, 0)
            rmin_y = (b_rect >> 10) & 1023
            rmin_x = b_rect & 1023
            dy = rank // rw
            dx = rank - dy * rw
            tile_id = (rmin_y + dy) * grid_x + (rmin_x + dx)
            tile_id = jnp.where(slot_valid, tile_id, num_tiles)
            key = tile_id * (1 << depth_bits) + jnp.where(slot_valid, b_depth,
                                                          0)
            if stop == "expand":
                return key[0] * 1e-20 + s
            sorted_key, sorted_gid = jax.lax.sort((key, gid), num_keys=1,
                                                  is_stable=False)
            if stop == "sort":
                return (sorted_key[0] + sorted_gid[0]) * 1e-20 + s
            sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)
            sorted_gid = jnp.where(sorted_tile < num_tiles, sorted_gid, n)
            tile_ids_all = jnp.arange(num_tiles, dtype=jnp.int32)
            tile_start = jnp.searchsorted(sorted_tile, tile_ids_all,
                                          side="left").astype(jnp.int32)
            tile_end = jnp.searchsorted(sorted_tile, tile_ids_all,
                                        side="right").astype(jnp.int32)
            if stop == "ranges":
                return (tile_start[0] + tile_end[0] + sorted_gid[0]
                        ) * 1e-20 + s
            v = build_visits(tile_start, tile_end, total, pair_cap, num_tiles)
            return (v.visit_chunk[0] + v.visit_tile[0] + sorted_gid[0]
                    ) * 1e-20 + s
        return f

    chain(bin_partial("expand"), "pre + expand/chains/tilekey")
    chain(bin_partial("sort"), "pre + expand + sort")
    chain(bin_partial("ranges"), "pre + expand + sort + ranges")
    chain(bin_partial("visits"), "pre + expand + sort + ranges + visits")


if __name__ == "__main__":
    main()

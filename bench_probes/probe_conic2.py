#!/usr/bin/env python
"""TPU probe: conic pair culling section split — where do the A/B deltas of
probe_conic.py come from? Times preprocess alone, preprocess+binning, and
the full fresh frame with conic_cull off/on, per bench profile, each
variant at its own snug pair cap (as the product path sizes it)."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
WARMUP, ITERS = 12, 15


def chain(fn, label):
    import jax, jax.numpy as jnp
    s = jnp.zeros(()); out = fn(s); jax.block_until_ready(out)
    for _ in range(WARMUP): out = fn(out)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(ITERS): out = fn(out)
    jax.block_until_ready(out)
    ms = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{label:<64s} {ms:8.2f} ms", flush=True)
    return ms


def main():
    import jax, jax.numpy as jnp
    from bench import make_bench_scene
    from instascene_tpu.ops.binning import bin_gaussians
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.blend_visits import blend_fwd_pallas_visits
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import CameraMats, compute_binning_cache

    width, height = 1920, 1080
    tile = 16; grid_x = (width + 15) // 16
    num_tiles = grid_x * ((height + 15) // 16)

    for profile in ("uniform", "trained"):
        params, make_cam = make_bench_scene(n=300_000, profile=profile)
        cam = make_cam(0, width, height)
        cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                        jnp.asarray(cam.camera_center))
        xyz, sc, rot = (params.xyz, params.scaling_activated(),
                        params.rotation_normalized())
        opa = params.opacity_activated()[:, 0]
        shs = params.features()

        for conic in (False, True):
            # snug cap exactly like probe_conic.py
            pair_cap = 1398272
            for _ in range(4):
                _, tc, _ = compute_binning_cache(
                    params, cm, width, height, pair_cap=pair_cap,
                    tile_cap=128, impl="xla", conic_cull=conic)
                total = int(jnp.sum(tc))
                if total < 0.95 * pair_cap:
                    pair_cap = (int(total * 1.1) + 127) // 128 * 128
                    break
                pair_cap *= 2

            def pre_of(s, conic=conic):
                return preprocess_gaussians(
                    xyz + s * 1e-30, sc, rot, cm.w2v, cm.full_proj, cm.campos,
                    width, height, shs=shs, sh_degree=3, tile=tile,
                    alive=params.alive, opacity=opa, conic_cull=conic)

            tag = f"{profile} conic={int(conic)} cap={pair_cap}"

            @jax.jit
            def pre_only(s):
                pre = pre_of(s)
                r = (pre.T[0, 0, 0] + pre.xy[0, 0] + pre.color[0, 0]
                     + pre.tiles_touched[0].astype(jnp.float32))
                if pre.cull_lo is not None:
                    r = r + pre.cull_lo[0].astype(jnp.float32)
                return r * 1e-20 + s
            a = chain(pre_only, f"A) preprocess only            [{tag}]")

            @jax.jit
            def pre_bin(s, pair_cap=pair_cap):
                pre = pre_of(s)
                b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                                  layout="visits")
                return (b.sorted_gid[0]
                        + b.visits.visit_tile[0]).astype(jnp.float32) * 1e-20 + s
            b = chain(pre_bin, f"B) pre + fresh binning         [{tag}]")

            @jax.jit
            def fresh_frame(s, pair_cap=pair_cap):
                pre = pre_of(s)
                b = bin_gaussians(pre, width, height, pair_cap, 0, tile=tile,
                                  layout="visits")
                flat = pack_flat_cols(pre.T, pre.xy, pre.normal_view, opa,
                                      pre.color)
                packed = flat[b.sorted_gid]
                v = b.visits
                f = blend_fwd_pallas_visits(
                    packed, v.visit_tile, v.visit_chunk, v.visit_s0,
                    v.visit_s1, v.visit_tstart, num_tiles, tile, grid_x, 0)
                return (f.out[0, 0, 0]
                        + f.iout[0, 0, 0].astype(jnp.float32)) * 1e-20 + s
            f = chain(fresh_frame, f"F) full fresh frame            [{tag}]")
            print(f"   bin-only ~= {b - a:6.2f} ms   gather+kernel ~= "
                  f"{f - b:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""TPU probe (round 5): where does the multi-view step's 4.56x go, and what
does a merged single-launch virtual-image render save?

Parts:
  A. XLA row-gather at the semantic snug cap, dim=21 (what the tune probes)
     vs dim=37 (what the semantic path actually gathers: 21 + 16 features).
  B. plain semantic step vs MV step (reproduce the 4.56x at bench caps).
  C. one MV-view render in isolation: fwd, fwd+bwd.
  D. merged 2-view virtual-image launch (tile space concatenated, per-view
     homographies shifted by v*Hpad via the slab y_offset machinery) vs two
     separate renders in one jit — fwd+bwd each + exactness check.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WARMUP = 10
K = 5


def timed(step, init, warmup=WARMUP, k=K):
    """RTT-cancelled chained window: returns ms/iter."""
    s = step(init)
    float(s)
    for _ in range(warmup):
        s = step(s)
    float(s)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for _ in range(k):
            s = step(s)
        float(s)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            s = step(s)
        float(s)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k * 1e3)
    return best


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.optimizer import init_adam_state, semantic_lrs
    from instascene_tpu.ops.blend_pallas import pack_flat_cols
    from instascene_tpu.ops.blend_visits import blend_visits_diff
    from instascene_tpu.ops.preprocess import preprocess_gaussians
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              compute_binning_cache)
    from instascene_tpu.pipelines.train import camera_tensors
    from instascene_tpu.pipelines.train_semantic import (
        SemanticCamera, SemanticHypers, SemanticMVBlock, SemanticStepConfig,
        render_features, semantic_train_step)
    from instascene_tpu.semantic.contrastive import valid_ids_pack

    width, height = 976, 728
    E = 16
    params, make_cam = make_bench_scene(n=300_000)
    n = params.capacity
    rng = np.random.default_rng(1)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(6)]
    segmap = jnp.asarray(rng.integers(0, 40, (height, width)).astype(np.int32))
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    lrs = semantic_lrs(opt)
    key = jax.random.PRNGKey(0)
    n_mv = 5
    lab3d = jnp.asarray(rng.integers(0, 40, n).astype(np.int32))

    # snug caps exactly as bench_semantic
    max_pairs = 0
    for ct in cams:
        _, tc, _ = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, tile_cap=128, impl="xla")
        max_pairs = max(max_pairs, int(jnp.sum(tc)))
    snug_cap = max(128 * 1024, (int(max_pairs * 1.1) + 1023) // 1024 * 1024)
    cfg = RasterizeConfig(width=width, height=height, bwd_extras_only=True,
                          pair_cap=snug_cap)
    rcfg = cfg.resolved(n)
    cap = rcfg.pair_cap
    print(f"max_pairs={max_pairs} snug_cap={snug_cap} resolved_cap={cap}",
          flush=True)

    cache = []
    for ct in cams:
        cb, tc, nd = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, pair_cap=snug_cap)
        assert int(nd) == 0
        cache.append(cb)

    # ---- Part A: gather modes at this cap -------------------------------
    from instascene_tpu.ops.gather_tune import _time_gather
    for dim in (21, 37):
        for c in (cap, cap + 128, cap + 256):
            ms = _time_gather(c, dim, n + 1)
            print(f"A: gather cap={c} dim={dim}: {ms:.2f} ms "
                  f"({ms * 1e6 / c:.1f} ns/row)", flush=True)

    # ---- Part B: plain vs MV step ----------------------------------------
    seg_cs = valid_ids_pack(segmap.reshape(-1) > 0)
    vis_cs = valid_ids_pack(lab3d > 0)
    scfg = SemanticStepConfig(raster=cfg, batch=32 * 1024, max_labels=64)
    hyp = SemanticHypers(bg=jnp.zeros(3), lrs=lrs, lam_sv=jnp.float32(1e-6),
                         lam_mv=jnp.float32(1e-6),
                         lam_3d=jnp.float32(2.5e-6), seg3d_labels=lab3d)
    bundles = [SemanticCamera(
        w2v=ct.w2v, full_proj=ct.full_proj, campos=ct.campos, segmap=segmap,
        sorted_segmap=segmap, binning=cache[i], seg_samp=seg_cs,
        sorted_samp=seg_cs, vis3d_samp=vis_cs)
        for i, ct in enumerate(cams)]
    mv_block = SemanticMVBlock(
        w2v=jnp.stack([cams[v].w2v for v in range(1, 1 + n_mv)]),
        full_proj=jnp.stack([cams[v].full_proj for v in range(1, 1 + n_mv)]),
        campos=jnp.stack([cams[v].campos for v in range(1, 1 + n_mv)]),
        segmaps=jnp.stack([segmap] * n_mv),
        binning=jax.tree.map(lambda *xs: jnp.stack(xs),
                             *[cache[v] for v in range(1, 1 + n_mv)]))

    def step_of(do_mv):
        def step(st):
            p, s, k = st
            k, sub = jax.random.split(k)
            p, s, loss, _ = semantic_train_step(
                p, s, sub, bundles[0], mv_block if do_mv else None, hyp, scfg)
            return (p, s, k)
        def run(st):
            st = step(st)
            return st
        return step

    class St(tuple):
        def __float__(self):
            return float(self[0].seg_feature[0, 0])

    def wrap(do_mv):
        f = step_of(do_mv)
        return lambda st: St(f(st))

    t_plain = timed(wrap(False), St((params, opt_state, key)))
    t_mv = timed(wrap(True), St((params, opt_state, key)))
    print(f"B: plain step {t_plain:.1f} ms   MV step {t_mv:.1f} ms "
          f"({t_mv / t_plain:.2f}x)  extra per view "
          f"{(t_mv - t_plain) / n_mv:.1f} ms", flush=True)

    # ---- Part C: one MV-view render (extras fwd / fwd+bwd) --------------
    featn = params.seg_feature / (jnp.linalg.norm(
        params.seg_feature, axis=1, keepdims=True) + 1e-6)
    cot = jnp.asarray(rng.standard_normal((E,)).astype(np.float32))

    def one_view_loss(feat, v):
        ct = cams[v]
        out = render_features(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            jnp.zeros(3), cfg, feat, cache[v])
        et = out.blend.extra_tiles                     # [T, E, P2]
        return jnp.sum(et * cot[None, :, None]) * 1e-20

    @jax.jit
    def fwd1(s, feat):
        return s + one_view_loss(feat + s * 0.0, 1) + 1.0

    @jax.jit
    def fwdbwd1(s, feat):
        l, g = jax.value_and_grad(one_view_loss)(feat + s * 0.0, 1)
        return s + l + jnp.sum(g) * 1e-20 + 1.0

    sf = params.seg_feature
    t_f1 = timed(lambda s: fwd1(s, sf), jnp.float32(0))
    t_fb1 = timed(lambda s: fwdbwd1(s, sf), jnp.float32(0))
    print(f"C: 1-view extras fwd {t_f1:.1f} ms   fwd+bwd {t_fb1:.1f} ms",
          flush=True)

    # ---- Part D: merged 2-view virtual image vs 2 separate ---------------
    V = 2
    tile = 16
    grid_x = (width + 15) // 16
    grid_y = (height + 15) // 16
    T_tiles = grid_x * grid_y
    Hpad = grid_y * tile
    nch = cap // 128
    cbs = [cache[v] for v in range(1, 1 + V)]
    offs_g = [v * (n + 1) for v in range(V)]
    sg_cat = jnp.concatenate([cb.sorted_gid + offs_g[v]
                              for v, cb in enumerate(cbs)])
    vc_cat = jnp.concatenate([cb.visit_chunk + v * nch
                              for v, cb in enumerate(cbs)])
    vt_cat = jnp.concatenate([cb.visit_tile + v * T_tiles
                              for v, cb in enumerate(cbs)])
    vs0_cat = jnp.concatenate([cb.visit_s0 for cb in cbs])
    vs1_cat = jnp.concatenate([cb.visit_s1 for cb in cbs])
    vts_cat = jnp.concatenate([cb.visit_tstart + v * cap
                               for v, cb in enumerate(cbs)])
    order_cat = jnp.concatenate([cb.gid_order + v * cap
                                 for v, cb in enumerate(cbs)])
    goff_cat = jnp.concatenate([cb.gauss_offsets + v * cap
                                for v, cb in enumerate(cbs)])
    gcs_cat = jnp.concatenate([cb.gauss_csum + v * cap
                               for v, cb in enumerate(cbs)])
    bundle9 = (sg_cat, vc_cat, vt_cat, vs0_cat, vs1_cat, vts_cat,
               order_cat, goff_cat, gcs_cat)
    opac = params.opacity_activated()[:, 0]

    def merged_loss(feat):
        fn = feat / (jnp.linalg.norm(feat, axis=1, keepdims=True) + 1e-6)
        flats = []
        for v in range(V):
            ct = cams[1 + v]
            pre = preprocess_gaussians(
                params.xyz, params.scaling_activated(),
                params.rotation_normalized(), ct.w2v, ct.full_proj,
                ct.campos, width, height, color=params.xyz * 0.0,
                alive=params.alive,
                y_offset=jnp.float32(-v * Hpad), full_height=height)
            flats.append(pack_flat_cols(pre.T, pre.xy, pre.normal_view,
                                        opac, pre.color, fn))
        flat_cat = jnp.concatenate(flats, axis=0)
        out, iout = blend_visits_diff(
            flat_cat, bundle9, V * T_tiles, tile, grid_x, E, False,
            True, 128)
        return jnp.sum(out[:, 10:10 + E] * cot[None, :, None]) * 1e-20, out

    def sep_loss(feat):
        tot = 0.0
        outs = []
        for v in range(V):
            ct = cams[1 + v]
            o = render_features(
                params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
                jnp.zeros(3), cfg, feat, cache[1 + v])
            et = o.blend.extra_tiles
            outs.append(et)
            tot = tot + jnp.sum(et * cot[None, :, None]) * 1e-20
        return tot, outs

    def mk_fb(loss_fn):
        @jax.jit
        def fb(s, feat):
            l, g = jax.value_and_grad(
                lambda f: loss_fn(f)[0])(feat + s * 0.0)
            return s + l + jnp.sum(g) * 1e-20 + 1.0
        return fb

    def mk_f(loss_fn):
        @jax.jit
        def f(s, feat):
            return s + loss_fn(feat + s * 0.0)[0] + 1.0
        return f

    # exactness: merged tiles vs per-view tiles
    _, out_m = jax.jit(merged_loss)(sf)
    _, outs_s = jax.jit(sep_loss)(sf)
    for v in range(V):
        a = np.asarray(out_m[v * T_tiles:(v + 1) * T_tiles, 10:10 + E])
        b = np.asarray(outs_s[v])
        d = np.max(np.abs(a - b))
        r = d / max(np.max(np.abs(b)), 1e-9)
        print(f"D: view {v} merged-vs-separate max abs diff {d:.3e} "
              f"(rel {r:.3e})", flush=True)

    t_sep_f = timed(lambda s: mk_f(sep_loss)(s, sf), jnp.float32(0))
    t_mrg_f = timed(lambda s: mk_f(merged_loss)(s, sf), jnp.float32(0))
    t_sep_fb = timed(lambda s: mk_fb(sep_loss)(s, sf), jnp.float32(0))
    t_mrg_fb = timed(lambda s: mk_fb(merged_loss)(s, sf), jnp.float32(0))
    print(f"D: {V}-view fwd      separate {t_sep_f:.1f} ms   "
          f"merged {t_mrg_f:.1f} ms", flush=True)
    print(f"D: {V}-view fwd+bwd  separate {t_sep_fb:.1f} ms   "
          f"merged {t_mrg_fb:.1f} ms", flush=True)


if __name__ == "__main__":
    main()

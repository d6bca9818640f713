#!/usr/bin/env python
"""Benchmark: semantic-training iterations/sec at waldo_kitchen scale.

Baseline (BASELINE.md): the reference trains 10,000 semantic iterations in
~20 min on an A100 40GB → 8.33 it/s. This bench builds a synthetic scene at
comparable scale (300k gaussians, 976x728 render, 16 feature channels) and
times the jitted contrastive train step (render fwd+bwd on the feature
channel + ProtoNCE losses), printing ONE JSON line.

Also measured (reported as extra keys): geometry train step it/s and 1080p
render FPS.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

BASELINE_SEMANTIC_ITS = 10_000 / (20 * 60)  # 8.33 it/s on A100

# The axon runtime executes the first ~5 invocations of a freshly-compiled
# program ~20x slower than steady state (server-side tiered optimization);
# every bench burns this many fenced iterations before its timed window.
WARMUP_ITERS = int(os.environ.get("BENCH_WARMUP", 12))


def _short_ms(run, warm=WARMUP_ITERS, k=4, loops=2):
    """ms/iter from an RTT-cancelled K-vs-2K differenced window (the
    fetch round trip cancels exactly; min over repeats tames host jitter).
    `run()` advances chained state and returns a host-fetchable value."""
    float(run())
    for _ in range(warm):
        out = run()
    float(out)
    best = float("inf")
    for _ in range(loops):
        t0 = time.perf_counter()
        for _ in range(k):
            out = run()
        float(out)
        t1 = time.perf_counter()
        for _ in range(2 * k):
            out = run()
        float(out)
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / k * 1e3)
    return max(best, 1e-3)


def _full_ms(run, iters):
    """Plain timed window (the round-1..4 bench methodology, kept for
    round-over-round comparability — includes one fetch RTT over `iters`)."""
    t0 = time.perf_counter()
    for _ in range(iters):
        out = run()
    float(out)
    return (time.perf_counter() - t0) / iters * 1e3


def steady_ms(make_run, base_cap, iters, extra, name,
              deltas=(0, 128, 256), retry_deltas=(384, 512),
              warm=WARMUP_ITERS, tol=1.18):
    """Slow-roll-hardened measurement (round 5; VERDICT r4 items 2+6).

    The pack gather's fast/slow mode at a FIXED row count re-rolls per
    compiled PROGRAM (ops/gather_tune.py; docs/PERFORMANCE.md round 4:
    1-in-6 driver runs landed the trained render at 17.5 fps with a cap
    that measures 20.4 everywhere else). So the bench measures, never
    trusts: warm + short-window each candidate cap, pick the fastest
    (smallest within 1.5%), run the full window there, and if the full
    window regresses >18% against its own short window (a mid-run tier
    flip), bump to a fresh cap — a NEW program, hence a fresh roll — and
    re-verify. Every pick and every slow roll lands in the bench JSON
    extras so a low number is attributable.

    make_run(cap) -> chained run() whose return is host-fetchable.
    Returns ms/iter of the accepted full window."""
    probes = []
    events = 0
    for d in deltas:
        cap = base_cap + d
        try:
            run = make_run(cap)
            probes.append((_short_ms(run, warm=warm), cap, run))
        except Exception:
            continue
    if not probes:
        raise RuntimeError(f"{name}: no candidate cap measured")
    best_ms = min(ms for ms, _, _ in probes)
    events += sum(1 for ms, _, _ in probes if ms > best_ms * 1.15)
    ms_pick, cap_pick, run_pick = next(
        (p for p in probes if p[0] <= best_ms * 1.015))
    full = _full_ms(run_pick, iters)
    retries = list(retry_deltas)
    while full > ms_pick * tol and retries:
        # mid-run tier flip: the program that probed fast rolled slow in the
        # long window — recompile at a fresh cap and re-verify
        events += 1
        cap = base_cap + retries.pop(0)
        try:
            run = make_run(cap)
            ms = _short_ms(run, warm=warm)
            f2 = _full_ms(run, iters)
        except Exception:
            break
        if f2 < full:
            full, ms_pick, cap_pick = f2, ms, cap
    extra[f"{name}_cap"] = cap_pick
    if events:
        extra[f"{name}_slow_rolls"] = events
    return full


def make_bench_scene(n=300_000, seed=0, profile="uniform"):
    """Synthetic waldo-scale scene in one of two statistical profiles.

    profile="uniform" (the round-1..3 bench): isotropic near-filter-floor
    splats at opacity 0.5 with uniform-random instance labels — kept for
    round-over-round comparability of the headline.

    profile="trained" models a post-training 2DGS distribution (the one
    real workloads render; reference train.py:139-151 densifies to
    anisotropic splats, gaussian_model.py:586-598 prunes opacity<0.05):
    - spatially clustered instances (60 clusters, lognormal radii) plus a
      diffuse background fraction;
    - anisotropic log-normal surfel scales: shared log-normal base size x
      a log-normal per-axis anisotropy ratio (median ~1.6x);
    - long-tailed opacity: 60% survivors pushed toward 1 by the photo
      loss, 30% mid, 10% recent opacity-reset survivors near the 0.05
      prune floor;
    - per-cluster base colors and seg features."""
    import jax.numpy as jnp

    from instascene_tpu.cameras import Camera
    from instascene_tpu.data.synthetic import look_at
    from instascene_tpu.models.gaussians import GaussianParams
    from instascene_tpu.utils.general import inverse_sigmoid
    rng = np.random.default_rng(seed)
    if profile == "uniform":
        xyz = rng.normal(0, 1.0, (n, 3)).astype(np.float32)
        scaling = np.log(rng.uniform(0.004, 0.02, (n, 2))).astype(np.float32)
        opacity = np.full((n, 1), float(inverse_sigmoid(0.5)), np.float32)
        fdc = rng.normal(0, 0.3, (n, 1, 3)).astype(np.float32)
        segf = rng.random((n, 16)).astype(np.float32)
        clusters = None
    elif profile == "trained":
        K = 60
        centers = rng.normal(0, 0.9, (K, 3))
        radii = np.exp(rng.normal(np.log(0.18), 0.5, K))
        n_bg = n // 8                     # diffuse walls/floor background
        n_fg = n - n_bg
        clusters = np.concatenate([
            rng.integers(0, K, n_fg), np.full(n_bg, K)]).astype(np.int32)
        xyz = np.empty((n, 3), np.float32)
        fg = clusters < K
        xyz[fg] = (centers[clusters[fg]]
                   + rng.normal(size=(n_fg, 3)) * radii[clusters[fg], None]
                   ).astype(np.float32)
        xyz[~fg] = rng.normal(0, 1.6, (n_bg, 3)).astype(np.float32)
        base = rng.normal(np.log(0.008), 0.7, n)       # log-normal size
        aniso = np.abs(rng.normal(0.5, 0.35, n))       # log anisotropy ratio
        scaling = np.stack([base + 0.5 * aniso, base - 0.5 * aniso],
                           axis=-1).astype(np.float32)
        u = rng.random(n)
        op = np.where(
            u < 0.6, 0.5 + 0.495 * rng.random(n) ** 0.35,   # toward 1
            np.where(u < 0.9, 0.05 + 0.45 * rng.random(n),  # mid
                     0.05 + 0.05 * rng.random(n)))          # reset survivors
        opacity = inverse_sigmoid(np.clip(op, 0.05, 0.995)
                                  ).astype(np.float32)[:, None]
        cluster_color = rng.normal(0, 0.45, (K + 1, 3))
        fdc = (cluster_color[clusters][:, None]
               + rng.normal(0, 0.08, (n, 1, 3))).astype(np.float32)
        cluster_feat = rng.random((K + 1, 16))
        segf = (cluster_feat[clusters]
                + 0.05 * rng.random((n, 16))).astype(np.float32)
    else:
        raise ValueError(profile)
    params = GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(fdc),
        features_rest=jnp.zeros((n, 15, 3)),
        scaling=jnp.asarray(scaling),
        rotation=jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32)),
        opacity=jnp.asarray(opacity),
        alive=jnp.ones(n, bool),
        seg_feature=jnp.asarray(segf),
        active_sh_degree=3, max_sh_degree=3)

    def make_cam(i, width, height):
        ang = 2 * np.pi * i / 16
        pos = np.array([4.0 * np.cos(ang), 4.0 * np.sin(ang), 1.5])
        R_w2c, t = look_at(pos, np.zeros(3))
        return Camera(uid=i, colmap_id=i, R=R_w2c.T, T=t, fovx=1.2, fovy=0.95,
                      image_name=str(i), width=width, height=height)

    if profile == "trained":
        make_cam.clusters = clusters
        make_cam.centers = centers
    return params, make_cam


def bench_semantic(params, make_cam, width=976, height=728, iters=20,
                   extra=None):
    import jax
    import jax.numpy as jnp

    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.optimizer import init_adam_state, semantic_lrs
    from instascene_tpu.ops.rasterize import RasterizeConfig
    from instascene_tpu.pipelines.train import camera_tensors
    from instascene_tpu.pipelines.train_semantic import (
        SemanticCamera, SemanticHypers, SemanticMVBlock, SemanticStepConfig,
        semantic_train_step)

    extra = extra if extra is not None else {}
    rng = np.random.default_rng(1)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(6)]
    segmap = jnp.asarray(rng.integers(0, 40, (height, width)).astype(np.int32))
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    lrs = semantic_lrs(opt)
    key = jax.random.PRNGKey(0)
    n_mv = 5
    lab3d = jnp.asarray(rng.integers(0, 40, params.capacity).astype(np.int32))

    # frozen-geometry binning cache with the trainer's snug-cap sizing
    # (SegSplatting._precompute_binning): probe true totals, cap at 1.1x —
    # the per-step pack gather and chain-reduce run over pair_cap rows.
    # extras_dim=16: the semantic gather moves a 37-column table (21 base +
    # 16 features); cfg.pair_cap is irrelevant on the cached-binning path —
    # candidate caps are carried by the rebuilt caches (steady_ms).
    from instascene_tpu.ops.rasterize import CameraMats, compute_binning_cache
    max_pairs = 0
    for ct in cams:
        _, tc, _ = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, tile_cap=128, impl="xla")
        max_pairs = max(max_pairs, int(jnp.sum(tc)))
    # mirrors SegSplatting._precompute_binning's sizing (1.02x: geometry is
    # frozen so the probed totals are exact; round 5 — was 1.1x)
    snug_cap = max(128 * 1024, (int(max_pairs * 1.02) + 1023) // 1024 * 1024)
    cfg = RasterizeConfig(width=width, height=height, bwd_extras_only=True,
                          extras_dim=16)
    from instascene_tpu.semantic.contrastive import valid_ids_pack
    seg_cs = valid_ids_pack(segmap.reshape(-1) > 0)
    vis_cs = valid_ids_pack(lab3d > 0)

    scfg = SemanticStepConfig(raster=cfg, batch=32 * 1024, max_labels=64)
    hyp = SemanticHypers(bg=jnp.zeros(3), lrs=lrs,
                         lam_sv=jnp.float32(1e-6), lam_mv=jnp.float32(1e-6),
                         lam_3d=jnp.float32(2.5e-6), seg3d_labels=lab3d)

    num_tiles = ((width + 15) // 16) * ((height + 15) // 16)
    mv_k = 128
    rng_sel = np.random.default_rng(7)
    sel = jnp.asarray(np.stack([np.sort(rng_sel.choice(
        num_tiles, mv_k, replace=False)).astype(np.int32)
        for _ in range(n_mv)]))

    _built = {}

    def build(cap):
        """Per-camera caches + step inputs at an exact candidate cap."""
        if cap in _built:
            return _built[cap]
        cache = []
        for ct in cams:
            cb, tc, nd = compute_binning_cache(
                params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
                width, height, pair_cap=cap, extras_dim=16,
                tune_gather=False)
            assert int(nd) == 0, "candidate cap dropped pairs"
            cache.append(cb)
        bundles = [SemanticCamera(
            w2v=ct.w2v, full_proj=ct.full_proj, campos=ct.campos,
            segmap=segmap, sorted_segmap=segmap, binning=cache[i],
            seg_samp=seg_cs, sorted_samp=seg_cs, vis3d_samp=vis_cs)
            for i, ct in enumerate(cams)]
        # real multi-view inputs (views 1..5) for the every-10th-iter MV step
        mv_common = dict(
            w2v=jnp.stack([cams[v].w2v for v in range(1, 1 + n_mv)]),
            full_proj=jnp.stack(
                [cams[v].full_proj for v in range(1, 1 + n_mv)]),
            campos=jnp.stack([cams[v].campos for v in range(1, 1 + n_mv)]),
            segmaps=jnp.stack([segmap] * n_mv),
            binning=jax.tree.map(lambda *xs: jnp.stack(xs),
                                 *[cache[v] for v in range(1, 1 + n_mv)]))
        _built[cap] = (bundles, mv_common)
        return _built[cap]

    def make_run_of(mv_mode):
        """mv_mode: None (plain), 'full', 'sub'."""
        def make_run(cap):
            bundles, mv_common = build(cap)
            mv = (None if mv_mode is None else SemanticMVBlock(
                **mv_common, sel_tiles=sel if mv_mode == "sub" else None))
            st = [params, opt_state, key, 0]

            def run():
                k, sub = jax.random.split(st[2])
                p, s, loss, _ = semantic_train_step(
                    st[0], st[1], sub, bundles[st[3] % len(cams)], mv,
                    hyp, scfg)
                st[0], st[1], st[2], st[3] = p, s, k, st[3] + 1
                return loss
            return run
        return make_run

    t_norm = steady_ms(make_run_of(None), snug_cap, iters, extra,
                       "semantic_plain") * 1e-3
    t_mv = t_mv_sub = None
    n_mv_iters = max(5, iters // 3)
    try:
        t_mv = steady_ms(make_run_of("full"), snug_cap, n_mv_iters, extra,
                         "semantic_mv") * 1e-3
        t_mv_sub = steady_ms(make_run_of("sub"), snug_cap, n_mv_iters, extra,
                             "semantic_mv_sub") * 1e-3
    except Exception:
        pass
    # the every-10th-iter multi-view step (5 extra feature renders, matching
    # the reference's train_semantic.py:145-172) blends 1:9 into the honest
    # sustained rate
    blend = lambda t: (1.0 / (0.9 * t_norm + 0.1 * t)) if t else None
    return 1.0 / t_norm, blend(t_mv), blend(t_mv_sub)


def bench_geometry(params, make_cam, width=976, height=728, iters=10,
                   dist=False, extra=None, name="geometry"):
    import jax
    import jax.numpy as jnp

    from instascene_tpu.config import OptimizationParams
    from instascene_tpu.models.densify import init_stats
    from instascene_tpu.models.optimizer import (geometry_lrs,
                                                 init_adam_state)
    from instascene_tpu.ops.rasterize import RasterizeConfig
    from instascene_tpu.pipelines.train import camera_tensors, train_step

    rng = np.random.default_rng(2)
    params = params.replace(seg_feature=None)
    cams = [camera_tensors(make_cam(i, width, height)) for i in range(4)]
    gt = jnp.asarray(rng.random((height, width, 3)).astype(np.float32))
    opt = OptimizationParams()
    opt_state = init_adam_state(params)
    stats = init_stats(params.capacity)
    lrs = geometry_lrs(opt, 1.0, 1e-4)
    # steady-state pair cap, as GeometryTrainer._adapt_caps re-snugs once
    # densification ends (1.1x the high-water total at 128k granularity —
    # 2/3 of a 30k-iter run trains at this cap; every binning stage is
    # O(pair_cap))
    from instascene_tpu.ops.rasterize import CameraMats, compute_binning_cache
    hiwater = 0
    for ct in cams:
        _, tc0, _ = compute_binning_cache(
            params, CameraMats(ct.w2v, ct.full_proj, ct.campos),
            width, height, impl="xla")
        hiwater = max(hiwater, int(jnp.sum(tc0)))
    gran = 128 * 1024
    snug = max(gran, (hiwater * 110 // 100 + gran - 1) // gran * gran)
    # no_depth_dist: lambda_dist == 0 is the reference default, so default
    # training never reads rend_dist — the trainer's _cfg skips the kernels'
    # distortion machinery at compile time; the bench models the same.
    # dist=True models the 2DGS bounded-scene recipe instead
    # (--lambda_dist 100, depth_ratio 0 → full distortion + expected-depth
    # kernels), so the non-default path has a stated rate too.
    depth_ratio = 0.0 if dist else 1.0
    dummy = jnp.zeros(1)
    bg = jnp.zeros(3)
    lam = tuple(jnp.float32(v) for v in
                (0.2, 100.0 if dist else 0.0, 0.05, 0.0))

    def cfg_at(cap):
        return RasterizeConfig(width=width, height=height, pair_cap=cap,
                               no_depth_dist=not dist, tune_gather=False)

    # slow-roll-hardened cap pick + full-window re-verify (steady_ms): the
    # real train step is its own gather-mode oracle — candidate caps are
    # probed with the ACTUAL jitted step, the full window runs at the
    # winner, and a mid-run tier flip triggers a fresh-cap recompile
    def make_run(cap):
        cfg_c = cfg_at(cap)
        st = [params, opt_state, stats, 0]

        def run():
            i = st[3]
            ct = cams[i % len(cams)]
            p, o, s, m = train_step(st[0], st[1], st[2], ct.w2v,
                                    ct.full_proj, ct.campos, ct.c2w_rot, gt,
                                    dummy, dummy, bg, lrs, *lam, cfg_c,
                                    ct.tanfovx, ct.tanfovy,
                                    depth_ratio, False)
            st[0], st[1], st[2], st[3] = p, o, s, i + 1
            return m["loss"]
        return run

    extra = extra if extra is not None else {}
    ms = steady_ms(make_run, snug, iters, extra, name)
    return 1e3 / ms


def bench_render_fps(params, make_cam, width=1920, height=1080, iters=20,
                     viewer=False, extra=None, name="render"):
    """Full-quality forward fps (viewer=False) or the interactive GUI path
    (viewer=True: color+alpha+16-ch features, aux maps skipped). Both re-bin
    every frame, as an orbiting camera pays. Slow-roll-hardened: candidate
    caps are probed and the full window re-verified (steady_ms)."""
    import jax
    import jax.numpy as jnp

    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    # honest caps: at 1080p the true pair count exceeds the auto heuristic —
    # probe the true total (sum of uncapped per-tile counts) and size snugly
    from instascene_tpu.ops.rasterize import compute_binning_cache
    pair_cap = RasterizeConfig(width=width, height=height).resolved(
        params.capacity).pair_cap
    for _ in range(4):
        _, tc, _ = compute_binning_cache(params, cm, width, height,
                                         pair_cap=pair_cap, tile_cap=128,
                                         impl="xla")
        total = int(jnp.sum(tc))
        if total < 0.95 * pair_cap:
            # the exact total for this camera was just probed; every binning
            # chain, the sort, the pack gather and the kernel tail scale with
            # the cap, so keep the slack snug (product render paths grow
            # their caps on n_dropped instead). 3% slack: the CUDA reference
            # allocates its pair buffers to the EXACT per-frame total
            # (rasterizer_impl.cu resizes to num_rendered), so a near-exact
            # static cap is the faithful comparison point; the margin only
            # absorbs candidate-cap deltas in steady_ms.
            pair_cap = (int(total * 1.03) + 127) // 128 * 128
            break
        pair_cap *= 2
    if os.environ.get("BENCH_DEBUG"):
        print(f"[bench_render_fps {width}x{height} viewer={viewer}] "
              f"pairs={total} cap={pair_cap}", file=sys.stderr, flush=True)
    extras = params.seg_feature_normed() if viewer else None

    def make_run(cap):
        # tune_gather=False: the candidate cap IS the experiment — the
        # step-level probe subsumes the micro-probe snap
        cfg = RasterizeConfig(width=width, height=height, pair_cap=cap,
                              fwd_viewer=viewer, tune_gather=False)

        # chain iterations (identical re-dispatches get deduped here)
        @jax.jit
        def step(p_feat):
            b = rasterize(params.xyz, params.scaling_activated(),
                          params.rotation_normalized(),
                          params.opacity_activated()[:, 0],
                          cm, jnp.zeros(3), cfg, shs=params.features(),
                          sh_degree=3, extras=extras).blend
            x = b.color[0, 0, 0]
            if viewer:
                x = x + b.extra[0, 0, 0]
            return p_feat + 1e-20 * x + 1.0

        box = [jnp.zeros(())]

        def run():
            box[0] = step(box[0])
            return box[0]
        return run

    extra = extra if extra is not None else {}
    ms = steady_ms(make_run, pair_cap, iters, extra, name)
    return 1e3 / ms


def bench_tracker_view(params, make_cam, width=976, height=728, iters=5):
    """Priors-stage tracker render (track_contrib=True -> Pallas top-K
    contributor mode, round-3) — seconds per view at waldo scale."""
    import jax
    import jax.numpy as jnp

    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    cfg = RasterizeConfig(width=width, height=height, track_contrib=True)
    seg = params.seg_feature_normed()

    @jax.jit
    def view(s):
        out = rasterize(params.xyz, params.scaling_activated(),
                        params.rotation_normalized(),
                        params.opacity_activated()[:, 0],
                        cm, jnp.zeros(3), cfg, shs=params.features(),
                        sh_degree=3, extras=seg)
        b = out.blend
        return s + 1e-20 * (b.color[0, 0, 0]
                            + b.contrib_ids[0, 0, 0].astype(jnp.float32))
    x = view(jnp.zeros(()))
    float(x)
    for _ in range(WARMUP_ITERS):
        x = view(x)
    float(x)
    t0 = time.perf_counter()
    for _ in range(iters):
        x = view(x)
    float(x)
    return (time.perf_counter() - t0) / iters


def main():
    params, make_cam = make_bench_scene(
        n=int(os.environ.get("BENCH_N", 300_000)))
    extra = {}
    sem_its = None
    try:
        plain_its, with_mv, with_mv_sub = bench_semantic(
            params, make_cam, iters=int(os.environ.get("BENCH_ITERS", 20)),
            extra=extra)
        # HEADLINE = honest sustained rate incl. the every-10th-iter
        # reference-exact multi-view step (the A100 baseline's 20-min
        # wall-clock includes those too); plain-step rate kept as an extra
        # for round-over-round comparability.
        sem_its = with_mv if with_mv else plain_its
        extra["semantic_plain_steps_its"] = round(plain_its, 3)
        if with_mv_sub:
            # sustained rate with the tile-subsampled MV variant
            # (--mv_tile_subsample 128 — renders 128 tiles/view instead of
            # 5 full images)
            extra["semantic_with_mv_subsampled_its"] = round(with_mv_sub, 3)
    except Exception as e:  # keep the JSON line coming no matter what
        extra["semantic_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        extra["geometry_train_its"] = round(
            bench_geometry(params, make_cam, extra=extra, name="geometry"), 3)
    except Exception as e:
        extra["geometry_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # the 2DGS bounded-scene recipe (--lambda_dist 100, depth_ratio 0)
        extra["geometry_train_dist_its"] = round(
            bench_geometry(params, make_cam, dist=True, extra=extra,
                           name="geometry_dist"), 3)
    except Exception as e:
        extra["geometry_dist_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        extra["render_1080p_fps"] = round(
            bench_render_fps(params, make_cam, extra=extra,
                             name="render_1080p"), 2)
    except Exception as e:
        extra["fps_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        extra["gui_feature_render_1080p_fps"] = round(
            bench_render_fps(params, make_cam, viewer=True, extra=extra,
                             name="gui_1080p"), 2)
    except Exception as e:
        extra["gui_fps_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        # 4K exercises the sequential tile-slab fallback (the visit arrays
        # of a single 3840x2160 launch exceed the SMEM scalar-prefetch
        # budget; ops/rasterize._slab_plan splits the frame)
        extra["render_4k_fps"] = round(
            bench_render_fps(params, make_cam, width=3840, height=2160,
                             iters=8, extra=extra, name="render_4k"), 2)
    except Exception as e:
        extra["fps4k_error"] = f"{type(e).__name__}: {e}"[:200]
    try:
        extra["tracker_view_s"] = round(
            bench_tracker_view(params, make_cam), 3)
    except Exception as e:
        extra["tracker_error"] = f"{type(e).__name__}: {e}"[:200]

    # trained-profile scene (anisotropic log-normal scales, long-tail
    # opacity, clustered instances — the distribution real workloads
    # render): every profile-sensitive tuning decision is re-measured here
    tp_params, tp_cam = make_bench_scene(
        n=int(os.environ.get("BENCH_N", 300_000)), profile="trained")
    for name, fn in (
            ("trained_render_1080p_fps",
             lambda: bench_render_fps(tp_params, tp_cam, extra=extra,
                                      name="trained_render_1080p")),
            ("trained_gui_render_1080p_fps",
             lambda: bench_render_fps(tp_params, tp_cam, viewer=True,
                                      extra=extra, name="trained_gui_1080p")),
            ("trained_geometry_train_its",
             lambda: bench_geometry(tp_params, tp_cam, extra=extra,
                                    name="trained_geometry")),
    ):
        try:
            extra[name] = round(fn(), 3)
        except Exception as e:
            extra[name + "_error"] = f"{type(e).__name__}: {e}"[:200]
    if sem_its is None and "geometry_train_its" in extra:
        sem_its = 0.0
    print(json.dumps({
        "metric": "semantic train iters/sec sustained incl. multi-view "
                  "(waldo-scale synthetic, 300k gaussians, 976x728, 16ch)",
        "value": round(sem_its, 3) if sem_its is not None else None,
        "unit": "it/s",
        "vs_baseline": (round(sem_its / BASELINE_SEMANTIC_ITS, 3)
                        if sem_its else None),
        "extra": extra,
    }))


if __name__ == "__main__":
    main()

"""Geometry training pipeline — train.py parity (reference train.py:34-185).

One fully-jitted train step: render → photometric (L1+SSIM) + depth-distortion
+ normal-consistency (+ optional mono-normal prior) losses → grads (including
the t_offset densification grad tap) → Adam update + densify stats. Densify/
prune runs as a second jitted function every `densification_interval` iters.
"""

from __future__ import annotations

import math
import os
import random
import time
from dataclasses import dataclass
from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..cameras import Camera
from ..losses import cos_loss, l1_loss, photometric_loss, psnr, ssim
from ..models import densify as dens
from ..models.gaussians import GaussianParams, create_from_pcd, save_ply
from ..models.optimizer import (AdamState, adam_step, geometry_lrs,
                                init_adam_state)
from ..ops.depth_utils import depth_to_normal
from ..ops.knn import mean_dist2_knn3
from ..ops.rasterize import (CameraMats, RasterizeConfig, densify_screen_grad,
                             rasterize)
from ..utils.general import get_expon_lr_func


def rays_from_cam(width: int, height: int, tanfovx: float, tanfovy: float,
                  c2w_rot: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel world ray directions [H,W,3], jnp (device-side)."""
    fx = width / (2 * tanfovx)
    fy = height / (2 * tanfovy)
    x = (jnp.arange(width, dtype=jnp.float32) - width / 2) / fx
    y = (jnp.arange(height, dtype=jnp.float32) - height / 2) / fy
    xx, yy = jnp.meshgrid(x, y)
    dirs = jnp.stack([xx, yy, jnp.ones_like(xx)], axis=-1)
    return jnp.einsum("hwk,jk->hwj", dirs, c2w_rot)


def render_for_training(params: GaussianParams, cam: CameraMats, bg,
                        cfg: RasterizeConfig, t_offset, c2w_rot,
                        tanfovx: float, tanfovy: float, depth_ratio: float):
    """Render + derived maps needed by the training losses (channels-last)."""
    out = rasterize(params.xyz, params.scaling_activated(),
                    params.rotation_normalized(),
                    params.opacity_activated()[:, 0], cam, bg, cfg,
                    shs=params.features(), sh_degree=params.active_sh_degree,
                    extras=(params.seg_feature_normed()
                            if params.seg_feature is not None else None),
                    t_offset=t_offset, alive=params.alive)
    b = out.blend
    rend_normal = jnp.einsum("hwk,kj->hwj", b.normal, cam.w2v[:3, :3])
    alpha = b.alpha[..., None]
    alpha_ok = alpha > 0
    depth_exp = jnp.where(alpha_ok,
                          b.depth[..., None] / jnp.where(alpha_ok, alpha, 1.0),
                          0.0)
    depth_med = jnp.nan_to_num(b.median_depth[..., None], 0, 0)
    surf_depth = depth_exp * (1 - depth_ratio) + depth_ratio * depth_med
    rays = rays_from_cam(cfg.width, cfg.height, tanfovx, tanfovy, c2w_rot)
    surf_normal = depth_to_normal(surf_depth[..., 0], rays, cam.campos)
    surf_normal = surf_normal * jax.lax.stop_gradient(alpha)
    return out, rend_normal, surf_normal, alpha, surf_depth


def geometry_loss_fn(p, t_offset, cam: CameraMats, bg, cfg, c2w_rot,
                     tanfovx, tanfovy, depth_ratio, gt_image,
                     normal_prior, normal_mask,
                     lambda_dssim, lambda_dist, lambda_normal,
                     lambda_normal_prior, has_normal_prior: bool):
    """The full geometry training loss (reference train.py:71-103): photo
    (L1+SSIM) + depth-distortion + normal-consistency + optional mono-normal
    prior. Shared verbatim by the single-chip train_step and the DP step."""
    out, rend_normal, surf_normal, alpha, _ = render_for_training(
        p, cam, bg, cfg, t_offset, c2w_rot, tanfovx, tanfovy, depth_ratio)
    image = out.blend.color
    photo, ll1 = photometric_loss(image, gt_image, lambda_dssim)
    dist_loss = lambda_dist * jnp.mean(out.blend.distortion)
    normal_error = jnp.mean(1.0 - jnp.sum(rend_normal * surf_normal,
                                          axis=-1))
    normal_loss = lambda_normal * normal_error
    if has_normal_prior:
        prior = normal_prior * jax.lax.stop_gradient(alpha)
        dots = 1.0 - jnp.sum(prior * rend_normal, axis=-1)
        msum = jnp.maximum(jnp.sum(normal_mask), 1.0)
        prior_err = jnp.sum(dots * normal_mask) / msum
        normal_loss = normal_loss + lambda_normal_prior * prior_err
    total = photo + dist_loss + normal_loss
    aux = {"ll1": ll1, "photo": photo, "dist": dist_loss,
           "normal": normal_loss, "radii": out.radii,
           "visible": out.visible, "depth": out.depth,
           "n_dropped": out.n_dropped, "image": image,
           "total_pairs": out.total_pairs}
    return total, aux


@partial(jax.jit, static_argnames=("cfg", "tanfovx", "tanfovy", "depth_ratio",
                                   "has_normal_prior"))
def train_step(params: GaussianParams, opt_state: AdamState,
               stats: dens.DensifyStats, w2v, full_proj, campos, c2w_rot,
               gt_image, normal_prior, normal_mask, bg, lrs,
               lambda_dssim, lambda_dist, lambda_normal, lambda_normal_prior,
               cfg: RasterizeConfig, tanfovx: float, tanfovy: float,
               depth_ratio: float, has_normal_prior: bool):
    cam = CameraMats(w2v, full_proj, campos)
    t0 = jnp.zeros((params.capacity, 3, 3), jnp.float32)

    def loss_fn(p, t_offset):
        return geometry_loss_fn(
            p, t_offset, cam, bg, cfg, c2w_rot, tanfovx, tanfovy, depth_ratio,
            gt_image, normal_prior, normal_mask, lambda_dssim, lambda_dist,
            lambda_normal, lambda_normal_prior, has_normal_prior)

    # allow_int: the params pytree carries the bool `alive` mask (grad ignored)
    (loss, aux), (grads, t_grad) = jax.value_and_grad(
        loss_fn, argnums=(0, 1), has_aux=True, allow_int=True)(params, t0)

    screen_grad = densify_screen_grad(t_grad, aux["depth"],
                                      cfg.width, cfg.height)
    stats = dens.add_densification_stats(stats, screen_grad, aux["visible"],
                                         aux["radii"])
    params, opt_state = adam_step(params, grads, opt_state, lrs)
    metrics = {"loss": loss, "ll1": aux["ll1"], "dist": aux["dist"],
               "normal": aux["normal"], "n_dropped": aux["n_dropped"],
               "total_pairs": aux["total_pairs"]}
    return params, opt_state, stats, metrics


@partial(jax.jit, static_argnames=("cfg", "tanfovx", "tanfovy", "depth_ratio"))
def eval_step(params: GaussianParams, w2v, full_proj, campos, c2w_rot,
              gt_image, bg, cfg: RasterizeConfig, tanfovx, tanfovy,
              depth_ratio):
    cam = CameraMats(w2v, full_proj, campos)
    out, rend_normal, surf_normal, alpha, surf_depth = render_for_training(
        params, cam, bg, cfg, None, c2w_rot, tanfovx, tanfovy, depth_ratio)
    img = jnp.clip(out.blend.color, 0.0, 1.0)
    gt = jnp.clip(gt_image, 0.0, 1.0)
    # image maps are returned for the training_report TB grids
    # (reference train.py:236-267); scalar-only callers never fetch them
    return {"l1": l1_loss(img, gt), "psnr": psnr(img, gt), "image": img,
            "surf_depth": surf_depth, "rend_normal": rend_normal,
            "surf_normal": surf_normal, "rend_alpha": alpha,
            "rend_dist": out.blend.distortion, "gt": gt}


def pick_step_cap(run_at_cap, base_cap: int, deltas=(0, 128, 256),
                  warm: int = 6, k: int = 3, return_ms: bool = False):
    """Step-level pair-cap autotune.

    The pack gather's fast/slow mode at a FIXED row count is decided per
    compiled program (ops/gather_tune.py documents the runtime roulette:
    the micro-probe tune removes the deterministic losses but a large
    program like a train step re-rolls at compile time), so the only
    reliable oracle for a training step is the step itself. Time the
    caller's jitted step at base_cap + each delta and return the fastest
    cap. `run_at_cap(cap)` returns a closure running ONE step at that cap
    (cfg must pin the cap EXACTLY — RasterizeConfig(tune_gather=False))
    whose return is host-fetchable. Timing discipline per gather_tune.py:
    host-fetch fences (block_until_ready can no-op on the axon tunnel),
    K-vs-2K RTT-cancelling windows, min over repeats. Costs len(deltas)
    compiles once (amortized by the persistent compile cache) + ~2 s; a
    <1.5% spread is noise, where the smallest cap wins. Disable with
    INSTASCENE_STEP_TUNE=0."""
    import jax
    if (jax.default_backend() == "cpu"
            or os.environ.get("INSTASCENE_STEP_TUNE", "1") == "0"):
        return (base_cap, None) if return_ms else base_cap
    results = []
    for d in deltas:
        cap = base_cap + d
        try:
            run = run_at_cap(cap)
            float(run())                     # compile + first call
            for _ in range(warm):
                out = run()
            float(out)
            ms = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                for _ in range(k):
                    out = run()
                float(out)
                t1 = time.perf_counter()
                for _ in range(2 * k):
                    out = run()
                float(out)
                t2 = time.perf_counter()
                ms = min(ms, ((t2 - t1) - (t1 - t0)) / k * 1e3)
            results.append((max(ms, 1e-3), cap))
        except Exception:
            continue
    if not results:
        return (base_cap, None) if return_ms else base_cap
    best = min(ms for ms, _ in results)
    ms_pick, cap_pick = next((m, c) for m, c in results if m <= best * 1.015)
    return (cap_pick, ms_pick) if return_ms else cap_pick


@dataclass
class CameraTensors:
    w2v: jnp.ndarray
    full_proj: jnp.ndarray
    campos: jnp.ndarray
    c2w_rot: jnp.ndarray
    gt_image: jnp.ndarray
    normal_prior: Optional[jnp.ndarray]
    normal_mask: Optional[jnp.ndarray]
    tanfovx: float
    tanfovy: float


def camera_tensors(cam: Camera) -> CameraTensors:
    return CameraTensors(
        w2v=jnp.asarray(cam.w2v), full_proj=jnp.asarray(cam.full_proj),
        campos=jnp.asarray(cam.camera_center),
        c2w_rot=jnp.asarray(cam.c2w[:3, :3].astype(np.float32)),
        gt_image=jnp.asarray(cam.image) if cam.image is not None else None,
        normal_prior=jnp.asarray(cam.normal) if cam.normal is not None else None,
        normal_mask=(jnp.asarray(cam.normal_mask.astype(np.float32))
                     if cam.normal_mask is not None else None),
        tanfovx=float(cam.tanfovx), tanfovy=float(cam.tanfovy))


class GeometryTrainer:
    """Drives the 2DGS geometry optimization (train.py:34-185 parity)."""

    def __init__(self, dataset, opt, pipe, scene, seed: int = 0,
                 capacity_multiplier: float = 4.0,
                 rasterize_opts: Optional[dict] = None, dp: int = 0):
        self.opt = opt
        self.pipe = pipe
        self.dataset = dataset
        self.scene = scene
        pcd = scene.scene_info.point_cloud
        n0 = len(pcd.points)
        cap = int(2 ** math.ceil(math.log2(max(n0 * capacity_multiplier, 1024))))
        dist2 = np.asarray(mean_dist2_knn3(jnp.asarray(
            pcd.points.astype(np.float32))))
        self.params = create_from_pcd(
            pcd.points.astype(np.float32), pcd.colors.astype(np.float32),
            dist2, capacity=cap, max_sh_degree=dataset.sh_degree, seed=seed)
        self.opt_state = init_adam_state(self.params)
        self.stats = dens.init_stats(cap)
        self.spatial_lr_scale = float(scene.cameras_extent)
        self.xyz_sched = get_expon_lr_func(
            lr_init=opt.position_lr_init * self.spatial_lr_scale,
            lr_final=opt.position_lr_final * self.spatial_lr_scale,
            lr_delay_mult=opt.position_lr_delay_mult,
            max_steps=opt.position_lr_max_steps)
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if dataset.white_background else [0.0, 0.0, 0.0])
        self.cams = [camera_tensors(c) for c in scene.get_train_cameras()]
        self.cam_objs = scene.get_train_cameras()
        self.test_cams = [camera_tensors(c) for c in scene.get_test_cameras()]
        self.test_cam_objs = scene.get_test_cameras()
        self.rng = random.Random(seed)
        self.key = jax.random.PRNGKey(seed)
        self.rasterize_opts = rasterize_opts or {}
        impl = getattr(pipe, "rasterizer_impl", "auto")
        if impl != "auto":
            self.rasterize_opts.setdefault("impl", impl)
        self.ema = {"loss": 0.0, "dist": 0.0, "normal": 0.0}
        self._pair_cap = 0
        self._pair_hiwater = 0
        # camera-batch data parallelism: `dp` chips render one camera each,
        # gradients pmean over ICI (the TPU-native scaling capability the
        # single-GPU reference lacks; SURVEY.md §2.3)
        self.dp = int(dp)
        self._dp_step = None
        self._dp_key = None
        if self.dp:
            from ..parallel.data_parallel import make_mesh
            sizes = {(int(c.width), int(c.height)) for c in self.cam_objs}
            if len(sizes) != 1:
                raise ValueError(
                    f"--dp requires a uniform camera resolution; got {sizes}")
            self.mesh = make_mesh(self.dp)

    def _cfg(self, cam: Camera, lam_dist: float = 1.0) -> RasterizeConfig:
        opts = dict(self.rasterize_opts)
        if self._pair_cap and "pair_cap" not in opts:
            opts["pair_cap"] = self._pair_cap
            if getattr(self, "_cap_exact", False):
                # the post-densify snug was step-tuned to an exact winner —
                # resolved() must not re-snap it (pick_step_cap docstring)
                opts.setdefault("tune_gather", False)
        if (lam_dist == 0.0 and float(self.pipe.depth_ratio) == 1.0
                and "no_depth_dist" not in opts):
            # distortion loss off (the reference default lambda_dist == 0,
            # or the pre-3k gate) and median-only surf depth: the kernels'
            # distortion machinery is dead weight the hand-written backward
            # cannot DCE — skip it at compile time. The 3k gate costs one
            # extra (cached) compile when lambda_dist > 0 turns on.
            opts["no_depth_dist"] = True
        return RasterizeConfig(width=int(cam.width), height=int(cam.height),
                               **opts)

    def _adapt_caps(self, metrics, iteration: int = 0) -> None:
        """Sticky high-water pair_cap: the expand+sort is O(pair_cap), so
        shrink toward the observed pair count (one recompile) and double on
        overflow. Growth phase keeps 1.25x/256k-granular headroom (each
        distinct cap is a fresh XLA program — recompiles are minutes cold on
        the tunnel, so densification must not walk the cap); once
        densification ends the pair count can only drift with the camera,
        so a one-time re-snug to 1.1x/128k claws back the slack every
        remaining step pays (sort, chains, pack gather, kernel tail are all
        O(pair_cap) — ~6 ms/step at waldo scale)."""
        dropped = int(metrics["n_dropped"])
        total = int(metrics["total_pairs"])
        self._pair_hiwater = max(self._pair_hiwater, total)
        if dropped > 0:
            cur = self._pair_cap or max(64 * 1024, 4 * self.params.capacity)
            self._pair_cap = cur * 2
            if iteration > self.opt.densify_until_iter:
                # overflow after the post-densification snug: stay big (a
                # growth-phase overflow must NOT disable the later re-snug)
                self._post_densify_snug = True
        elif self._pair_cap == 0:
            gran = 256 * 1024
            cap = max(gran, (int(total * 1.25) + gran - 1) // gran * gran)
            default = max(64 * 1024, 4 * self.params.capacity)
            if cap < default:
                self._pair_cap = cap
        elif (iteration > self.opt.densify_until_iter
              and not getattr(self, "_post_densify_snug", False)):
            gran = 128 * 1024
            snug = max(gran, (int(self._pair_hiwater * 1.1) + gran - 1)
                       // gran * gran)
            if snug < self._pair_cap:
                # 2/3 of a 30k-iter run trains at this cap — worth timing
                # the REAL step at {snug, +128, +256} once and pinning the
                # winner (per-program gather-mode roulette, pick_step_cap)
                tuned = self._step_tune_snug(snug, iteration)
                self._pair_cap = tuned
                self._cap_exact = True
                self._snug_base = snug
            self._post_densify_snug = True

    def _step_tune_snug(self, snug: int, iteration: int,
                        deltas=(0, 128, 256)) -> int:
        """Time the real jitted train step at snug + each delta and return
        the winner (pick_step_cap); records the winner's measured ms as the
        steady-state expectation for the slow-roll watchdog (step()). No
        state is advanced — train_step is pure, outputs are discarded."""
        import dataclasses

        import jax as _jax
        if (_jax.default_backend() == "cpu"
                or os.environ.get("INSTASCENE_STEP_TUNE", "1") == "0"):
            return snug   # pick_step_cap would no-op; skip the setup too

        from ..models.optimizer import dev_scalar
        opt = self.opt
        ct = self.cams[0]
        cam_obj = self.cam_objs[0]
        lrs = geometry_lrs(opt, self.spatial_lr_scale,
                           self.xyz_sched(iteration))
        lam_normal = opt.lambda_normal if iteration > 7000 else 0.0
        lam_dist = opt.lambda_dist if iteration > 3000 else 0.0
        lam_prior = opt.lambda_normal_prior if iteration > 7000 else 0.0
        has_prior = ct.normal_prior is not None
        if not hasattr(self, "_dummy1"):
            self._dummy1 = jnp.zeros(1)
        base = self._cfg(cam_obj, lam_dist=lam_dist)

        def run_at_cap(cap):
            cfg = dataclasses.replace(base, pair_cap=cap, tune_gather=False)

            def run():
                _, _, _, m = train_step(
                    self.params, self.opt_state, self.stats,
                    ct.w2v, ct.full_proj, ct.campos, ct.c2w_rot,
                    ct.gt_image,
                    ct.normal_prior if has_prior else self._dummy1,
                    ct.normal_mask if has_prior else self._dummy1,
                    self.bg, lrs, dev_scalar(opt.lambda_dssim),
                    dev_scalar(lam_dist), dev_scalar(lam_normal),
                    dev_scalar(lam_prior), cfg, ct.tanfovx, ct.tanfovy,
                    float(self.pipe.depth_ratio), has_prior)
                return m["loss"]
            return run
        cap, ms = pick_step_cap(run_at_cap, snug, deltas=deltas,
                                return_ms=True)
        self._tuned_step_ms = ms
        return cap

    def _steady_watch(self, iteration: int) -> None:
        """Slow-roll watchdog (round 5; VERDICT r4 item 2): the gather's
        in-program mode can flip when the runtime re-optimizes a warm
        program, so the tuned cap's measured ms (pick_step_cap) is checked
        against the MEDIAN inter-step wall time over a 200-step window
        (median: robust to eval/save/log pauses inside the window). On a
        >30% sustained regression, re-run the step tune at fresh caps
        (+384/+512 — new programs, hence fresh gather rolls), re-pin, and
        log the event; `slow_roll_events` counts them for the bench/CLI."""
        tuned = getattr(self, "_tuned_step_ms", None)
        if tuned is None or self.dp:
            self._watch_prev = None
            return
        now = time.perf_counter()
        prev = getattr(self, "_watch_prev", None)
        self._watch_prev = now
        if prev is None:
            self._watch_deltas = []
            return
        self._watch_deltas.append(now - prev)
        if len(self._watch_deltas) < 200:
            return
        med_ms = sorted(self._watch_deltas)[len(self._watch_deltas) // 2] * 1e3
        self._watch_deltas = []
        if med_ms <= tuned * 1.3:
            return
        self.slow_roll_events = getattr(self, "slow_roll_events", 0) + 1
        shift = 384 * self.slow_roll_events
        print(f"[steady_watch] iter {iteration}: median step {med_ms:.1f} ms "
              f"vs tuned {tuned:.1f} ms — re-rolling the cap "
              f"(event #{self.slow_roll_events})", flush=True)
        base = getattr(self, "_snug_base", self._pair_cap)
        tuned_cap = self._step_tune_snug(
            base, iteration, deltas=(shift, shift + 128, shift + 256))
        self._pair_cap = tuned_cap
        self._cap_exact = True
        self._watch_prev = None

    def _pop_cam(self) -> int:
        if not getattr(self, "_stack", None):
            self._stack = list(range(len(self.cams)))
        return self._stack.pop(self.rng.randint(0, len(self._stack) - 1))

    def _dp_run(self, iteration: int) -> dict:
        """One DP iteration: `dp` cameras, one per chip, pmean'd gradients."""
        from ..parallel.data_parallel import build_dp_train_step, lrs_vector
        opt = self.opt
        idxs = [self._pop_cam() for _ in range(self.dp)]
        cts = [self.cams[i] for i in idxs]
        has_prior = all(ct.normal_prior is not None for ct in cts)
        cfg = self._cfg(self.cam_objs[idxs[0]],
                        lam_dist=(opt.lambda_dist if iteration > 3000
                                  else 0.0))
        ct0 = cts[0]
        # the DP step bakes the batch's fov (used by the depth->normal ray
        # grid); mixed-intrinsics datasets would silently get camera 0's
        # rays for every view, so reject them explicitly
        fovs = {(round(float(ct.tanfovx), 6), round(float(ct.tanfovy), 6))
                for ct in cts}
        if len(fovs) != 1:
            raise ValueError(
                f"--dp requires uniform camera intrinsics; got tanfovs "
                f"{sorted(fovs)} in one batch")
        key = (cfg, has_prior, next(iter(fovs)))
        if self._dp_step is None or self._dp_key != key:
            self._dp_step = build_dp_train_step(
                cfg, ct0.tanfovx, ct0.tanfovy, float(self.pipe.depth_ratio),
                self.mesh, has_normal_prior=has_prior)
            self._dp_key = key
        lrs = geometry_lrs(opt, self.spatial_lr_scale,
                           self.xyz_sched(iteration))
        lam_normal = opt.lambda_normal if iteration > 7000 else 0.0
        lam_dist = opt.lambda_dist if iteration > 3000 else 0.0
        lam_prior = opt.lambda_normal_prior if iteration > 7000 else 0.0
        stackf = lambda f: jnp.stack([f(ct) for ct in cts])
        np_ = (stackf(lambda ct: ct.normal_prior) if has_prior
               else jnp.zeros((self.dp, 1, 1, 1)))
        nm_ = (stackf(lambda ct: ct.normal_mask) if has_prior
               else jnp.zeros((self.dp, 1, 1)))
        (self.params, self.opt_state, self.stats,
         metrics) = self._dp_step(
            self.params, self.opt_state, self.stats,
            stackf(lambda ct: ct.w2v), stackf(lambda ct: ct.full_proj),
            stackf(lambda ct: ct.campos), stackf(lambda ct: ct.c2w_rot),
            stackf(lambda ct: ct.gt_image), np_, nm_, self.bg,
            lrs_vector(lrs), jnp.float32(opt.lambda_dssim),
            jnp.float32(lam_dist), jnp.float32(lam_normal),
            jnp.float32(lam_prior))
        return metrics

    def step(self, iteration: int, cam_idx: Optional[int] = None) -> dict:
        opt = self.opt
        if iteration % 1000 == 0:
            self.params = self.params.one_up_sh_degree()

        if self.dp and cam_idx is None:
            metrics = self._dp_run(iteration)
        else:
            if cam_idx is None:
                cam_idx = self._pop_cam()
            ct = self.cams[cam_idx]
            cam_obj = self.cam_objs[cam_idx]

            lrs = geometry_lrs(opt, self.spatial_lr_scale,
                               self.xyz_sched(iteration))
            lam_normal = opt.lambda_normal if iteration > 7000 else 0.0
            lam_dist = opt.lambda_dist if iteration > 3000 else 0.0
            lam_prior = opt.lambda_normal_prior if iteration > 7000 else 0.0
            has_prior = ct.normal_prior is not None

            cfg = self._cfg(cam_obj, lam_dist=lam_dist)
            from ..models.optimizer import dev_scalar
            if not hasattr(self, "_dummy1"):
                self._dummy1 = jnp.zeros(1)
            self.params, self.opt_state, self.stats, metrics = train_step(
                self.params, self.opt_state, self.stats,
                ct.w2v, ct.full_proj, ct.campos, ct.c2w_rot, ct.gt_image,
                ct.normal_prior if has_prior else self._dummy1,
                ct.normal_mask if has_prior else self._dummy1,
                self.bg, lrs, dev_scalar(opt.lambda_dssim),
                dev_scalar(lam_dist), dev_scalar(lam_normal),
                dev_scalar(lam_prior), cfg, ct.tanfovx, ct.tanfovy,
                float(self.pipe.depth_ratio), has_prior)

        if iteration % 50 == 1:
            self._adapt_caps(metrics, iteration)
        self._steady_watch(iteration)

        # densification schedule (train.py:139-151)
        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                size_thr = 20.0 if iteration > opt.opacity_reset_interval else 0.0
                self.key, sub = jax.random.split(self.key)
                (self.params, self.opt_state, self.stats,
                 n_overflow) = dens.densify_and_prune(
                    self.params, self.opt_state, self.stats, sub,
                    opt.densify_grad_threshold, opt.opacity_cull,
                    float(self.scene.cameras_extent), size_thr,
                    percent_dense=opt.percent_dense,
                    use_screen_size=iteration > opt.opacity_reset_interval)
                if int(n_overflow) > 0:
                    cap = self.params.capacity
                    (self.params, self.opt_state,
                     self.stats) = dens.grow_capacity(
                        self.params, self.opt_state, self.stats, cap * 2)
            if (iteration % opt.opacity_reset_interval == 0
                    or (self.dataset.white_background
                        and iteration == opt.densify_from_iter)):
                self.params, self.opt_state = dens.reset_opacity(
                    self.params, self.opt_state)
        return metrics

    def evaluate(self, cameras: Optional[List[int]] = None,
                 split: str = "train") -> dict:
        cams = self.cams if split == "train" else self.test_cams
        objs = self.cam_objs if split == "train" else self.test_cam_objs
        idxs = cameras if cameras is not None else range(len(cams))
        l1s, psnrs = [], []
        for i in idxs:
            ct = cams[i]
            cfg = self._cfg(objs[i])
            m = eval_step(self.params, ct.w2v, ct.full_proj, ct.campos,
                          ct.c2w_rot, ct.gt_image, self.bg, cfg,
                          ct.tanfovx, ct.tanfovy, float(self.pipe.depth_ratio))
            l1s.append(float(m["l1"]))
            psnrs.append(float(m["psnr"]))
        return {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}

    def training_report(self, tb, iteration: int,
                        is_first_test_iter: bool = False,
                        max_tb_views: int = 5) -> dict:
        """Held-out + train-slice evaluation with TB scalars and image grids.

        Parity: reference train.py:222-279 — configs are {'test': ALL test
        cameras (the --eval every-8th split)} and {'train': cameras
        [idx % n_train for idx in range(5, 30, 5)]}; logs L1/PSNR per config
        and, for the first `max_tb_views` views, render/depth/normal/alpha/
        dist image grids (+ ground truth at the first test iteration)."""
        from ..utils.tb import log_eval_images, log_eval_scalars
        results = {}
        n_train = len(self.cams)
        configs = [("test", self.test_cams, self.test_cam_objs,
                    list(range(len(self.test_cams)))),
                   ("train", self.cams, self.cam_objs,
                    [idx % n_train for idx in range(5, 30, 5)])]
        for name, cams, objs, idxs in configs:
            if not idxs or not cams:
                continue
            l1s, psnrs = [], []
            for k, i in enumerate(idxs):
                ct = cams[i]
                cfg = self._cfg(objs[i])
                m = eval_step(self.params, ct.w2v, ct.full_proj, ct.campos,
                              ct.c2w_rot, ct.gt_image, self.bg, cfg,
                              ct.tanfovx, ct.tanfovy,
                              float(self.pipe.depth_ratio))
                l1s.append(float(m["l1"]))
                psnrs.append(float(m["psnr"]))
                if tb is not None and k < max_tb_views:
                    log_eval_images(tb, iteration, name,
                                    objs[i].image_name, m,
                                    with_gt=is_first_test_iter)
            res = {"l1": float(np.mean(l1s)), "psnr": float(np.mean(psnrs))}
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {res['l1']:.4f} PSNR {res['psnr']:.2f}")
            log_eval_scalars(tb, iteration, name, res["l1"], res["psnr"],
                             int(self.params.n_alive()))
            results[name] = res
        return results

    def save(self, iteration: int):
        path = os.path.join(self.scene.model_path,
                            f"point_cloud/iteration_{iteration}",
                            "point_cloud.ply")
        save_ply(self.params, path)
        return path

    def train(self, iterations: Optional[int] = None,
              test_iterations=(), save_iterations=(), log_every: int = 10,
              progress: bool = True):
        from tqdm import tqdm
        iterations = iterations or self.opt.iterations
        bar = tqdm(range(1, iterations + 1), desc="Training",
                   disable=not progress)
        for it in bar:
            metrics = self.step(it)
            if it % log_every == 0:
                for k in ("loss", "dist", "normal"):
                    self.ema[k] = (0.4 * float(metrics[k])
                                   + 0.6 * self.ema[k])
                bar.set_postfix({
                    "Loss": f"{self.ema['loss']:.5f}",
                    "distort": f"{self.ema['dist']:.5f}",
                    "normal": f"{self.ema['normal']:.5f}",
                    "Points": int(self.params.n_alive())})
            if it in test_iterations:
                self.training_report(
                    None, it, is_first_test_iter=it == min(test_iterations))
            if it in save_iterations:
                self.save(it)
        return self

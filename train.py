#!/usr/bin/env python
"""2DGS geometry training CLI — flag-compatible with the reference train.py.

Usage (same as reference): python train.py -s <data_dir> [-m out] [--eval] ...
"""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instascene_tpu.config import (ModelParams, OptimizationParams,
                                   PipelineParams, save_cfg_args)
from instascene_tpu.utils.general import safe_state


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    ModelParams.add_to_parser(parser)
    OptimizationParams.add_to_parser(parser)
    PipelineParams.add_to_parser(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true", default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7_000, 15_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7_000, 15_000, 30_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--disable_viewer", action="store_true", default=False)
    parser.add_argument("--dp", type=int, default=0,
                        help="camera-batch data parallelism over this many "
                             "devices (one camera per chip per step, "
                             "gradients pmean'd over ICI)")
    parser.add_argument("--profile_trace", type=str, default=None,
                        help="capture a jax.profiler trace (TensorBoard/"
                             "Perfetto) of the profile window into this dir")
    parser.add_argument("--profile_window", nargs=2, type=int,
                        default=[100, 120],
                        help="[start, end) iterations of --profile_trace "
                             "(past warm-up so the steady state is traced)")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)

    safe_state(args.quiet)
    if args.detect_anomaly:
        # parity with torch.autograd.set_detect_anomaly (reference
        # train.py:306): fail fast on the first NaN/Inf in any jitted op
        import jax
        jax.config.update("jax_debug_nans", True)

    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.train import GeometryTrainer
    from instascene_tpu.viewer.network_gui import NetworkGUI

    scene = Scene(dataset)
    print(f"Output folder: {scene.model_path}")
    save_cfg_args(scene.model_path, args)

    trainer = GeometryTrainer(dataset, opt, pipe, scene, dp=args.dp)
    first_iter = 0
    if args.start_checkpoint:
        from instascene_tpu.pipelines.checkpoint import load_checkpoint
        (trainer.params, trainer.opt_state, trainer.stats,
         first_iter) = load_checkpoint(args.start_checkpoint)
        print(f"Resumed from {args.start_checkpoint} at iter {first_iter}")

    gui = None
    if not args.disable_viewer:
        try:
            gui = NetworkGUI(args.ip, args.port)
        except OSError:
            gui = None

    import time as _time

    from tqdm import tqdm

    from instascene_tpu.utils.tb import log_train_scalars, maybe_summary_writer
    tb = maybe_summary_writer(scene.model_path)
    bar = tqdm(range(first_iter + 1, opt.iterations + 1),
               desc="Training progress")
    from instascene_tpu.utils.profiling import TraceWindow
    tracer = TraceWindow(args.profile_trace, *args.profile_window)
    for it in bar:
        tracer.tick(it)
        _t0 = _time.perf_counter()
        try:
            metrics = trainer.step(it)
        except FloatingPointError:
            # jax_debug_nans tripped: dump the training state for offline
            # repro before re-raising (the reference's debug mode dumps
            # snapshot_fw.dump on CUDA failure,
            # diff_surfel_rasterization/__init__.py:93-101)
            snap = os.path.join(scene.model_path, f"nan_snapshot_{it}.npz")
            import numpy as _np
            fields = {
                k: getattr(trainer.params, k)
                for k in trainer.params.__dataclass_fields__}
            _np.savez(snap, iteration=it,
                      **{f"p_{k}": _np.asarray(v) for k, v in fields.items()
                         if hasattr(v, "shape")})
            print(f"\n[ITER {it}] NaN detected — params snapshot: {snap}")
            raise
        if tb is not None and it % 10 == 0:
            log_train_scalars(tb, it, metrics, _time.perf_counter() - _t0)
        if it % 10 == 0:
            for k in ("loss", "dist", "normal"):
                trainer.ema[k] = 0.4 * float(metrics[k]) + 0.6 * trainer.ema[k]
            bar.set_postfix({"Loss": f"{trainer.ema['loss']:.5f}",
                             "distort": f"{trainer.ema['dist']:.5f}",
                             "normal": f"{trainer.ema['normal']:.5f}",
                             "Points": int(trainer.params.n_alive())})
        if it in args.test_iterations:
            # test (--eval held-out split) + train-slice eval with TB image
            # grids (reference train.py:222-279)
            trainer.training_report(
                tb, it, is_first_test_iter=it == min(args.test_iterations))
        if it in args.save_iterations:
            print(f"\n[ITER {it}] Saving Gaussians")
            trainer.save(it)
        if it in args.checkpoint_iterations:
            from instascene_tpu.pipelines.checkpoint import save_checkpoint
            save_checkpoint(trainer, scene.model_path, it)
        if gui is not None:
            gui.tick(trainer, pipe, dataset)

    tracer.close()  # finalize a trace left open by a run ending mid-window
    print("\nTraining complete.")


if __name__ == "__main__":
    main()

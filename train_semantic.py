#!/usr/bin/env python
"""Semantic feature-lifting CLI — flag-compatible with the reference
train_semantic.py. Expects a pretrained point_cloud.ply in the data dir."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from instascene_tpu.config import (ModelParams, OptimizationParams,
                                   PipelineParams)


def main(argv=None):
    parser = ArgumentParser(description="Training script parameters")
    ModelParams.add_to_parser(parser)
    OptimizationParams.add_to_parser(parser)
    PipelineParams.add_to_parser(parser)
    parser.add_argument("--dp", type=int, default=0,
                        help="camera-batch data parallelism over this many "
                             "devices during contrastive training")
    parser.add_argument("--profile_trace", type=str, default=None,
                        help="capture a jax.profiler trace (TensorBoard/"
                             "Perfetto) of the profile window into this dir")
    parser.add_argument("--profile_window", nargs=2, type=int,
                        default=[100, 120],
                        help="[start, end) contrastive iterations to trace")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)

    from instascene_tpu.pipelines.train_semantic import SegSplatting

    segsplat = SegSplatting(dataset, opt, pipe, dp=args.dp)
    if args.profile_trace:
        segsplat.profile_trace = args.profile_trace
        segsplat.profile_window = tuple(args.profile_window)
    segsplat.robust_semantic_priors()
    segsplat.train_segfeat()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()

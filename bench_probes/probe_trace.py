#!/usr/bin/env python
"""Capture a jax.profiler trace of the 1080p fresh-binning render frame."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from bench import make_bench_scene
    from instascene_tpu.ops.rasterize import (CameraMats, RasterizeConfig,
                                              rasterize)

    width, height = 1920, 1080
    params, make_cam = make_bench_scene(n=300_000)
    cam = make_cam(0, width, height)
    cm = CameraMats(jnp.asarray(cam.w2v), jnp.asarray(cam.full_proj),
                    jnp.asarray(cam.camera_center))
    total = 1_271_985
    chunk = 128
    pair_cap = (int(total * 1.3) + chunk - 1) // chunk * chunk
    cfg = RasterizeConfig(width=width, height=height, pair_cap=pair_cap)

    xyz = params.xyz
    sc = params.scaling_activated()
    rot = params.rotation_normalized()
    op = params.opacity_activated()[:, 0]
    shs = params.features()

    @jax.jit
    def full(s):
        img = rasterize(xyz + s * 1e-20, sc, rot, op, cm, jnp.zeros(3),
                        cfg, shs=shs, sh_degree=3).blend.color
        return s + img[0, 0, 0] * 1e-20

    s = full(jnp.zeros(()))
    jax.block_until_ready(s)
    for _ in range(12):
        s = full(s)
    jax.block_until_ready(s)
    with jax.profiler.trace("/tmp/trace_fps"):
        for _ in range(5):
            s = full(s)
        jax.block_until_ready(s)
    print("trace done", flush=True)


if __name__ == "__main__":
    main()

"""Train geometry against GT imagery from an INDEPENDENT image-formation
model (VERDICT r4 item 4).

tests/scene_builder.py's GT comes from the repo's own 2DGS rasterizer, so
e2e training there cannot catch a shared forward bias. This scene's images
come from the triangle z-buffer rasterizer + analytic Lambertian shading
(tests/mesh_scene_builder.py) — a fully disjoint code path — the closest
in-environment proxy to the reference's training on photographs
(reference train.py:57-104).

Calibration (CPU, this machine): PSNR 19.9 @ 100 iters, dip to 17.5 during
early densification, 20.4 @ 400, 23.7 @ 900; gaussians 300 -> 2048.
"""

import sys, os

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from mesh_scene_builder import build_mesh_e2e_scene

from instascene_tpu.config import (ModelParams, OptimizationParams,
                                   PipelineParams)


@pytest.mark.slow
def test_geometry_trains_on_mesh_rendered_gt(tmp_path):
    d = tmp_path / "parent" / "scene"
    build_mesh_e2e_scene(str(d))

    dataset = ModelParams(source_path=str(d), sh_degree=3)
    opt = OptimizationParams(
        iterations=400, densify_from_iter=100, densification_interval=100,
        densify_until_iter=400, opacity_reset_interval=10_000,
        position_lr_max_steps=400)
    pipe = PipelineParams()

    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.pipelines.train import GeometryTrainer
    scene = Scene(dataset, output_root=str(tmp_path / "out"))
    trainer = GeometryTrainer(
        dataset, opt, pipe, scene,
        rasterize_opts={"chunk": 16, "pair_cap": 65536, "tile_cap": 256})
    n0 = int(trainer.params.n_alive())
    for it in range(1, 401):
        trainer.step(it)
    ev = trainer.evaluate([0, 3, 6])
    # floor well under the calibrated 20.4 but far above the ~11 PSNR of
    # the untrained init — a shared-forward-bias failure cannot pass this
    assert np.isfinite(ev["psnr"]) and ev["psnr"] >= 18.5, ev
    n1 = int(trainer.params.n_alive())
    assert n1 >= 2 * n0, (n0, n1)  # densification engaged on real structure

#!/usr/bin/env python
"""TSDF mesh extraction CLI (2DGS capability, reference utils/mesh_utils.py).

Renders all training views of a trained model and fuses them into a mesh."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from instascene_tpu.config import ModelParams, PipelineParams
    parser = ArgumentParser()
    ModelParams.add_to_parser(parser)
    PipelineParams.add_to_parser(parser)
    parser.add_argument("--ply_path", type=str, default="",
                        help="trained point_cloud.ply (default: "
                             "<source_path>/point_cloud.ply)")
    parser.add_argument("--voxel_size", type=float, default=0.004)
    parser.add_argument("--sdf_trunc", type=float, default=0.02)
    parser.add_argument("--depth_trunc", type=float, default=3.0)
    parser.add_argument("--unbounded", action="store_true")
    parser.add_argument("--mesh_res", type=int, default=512)
    parser.add_argument("--num_clusters", type=int, default=1000)
    parser.add_argument("--output", type=str, default="fuse.ply")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    dataset = ModelParams.extract(args)
    pipe = PipelineParams.extract(args)

    from instascene_tpu.data.dataset import Scene
    from instascene_tpu.mesh.extractor import (GaussianExtractor,
                                               post_process_mesh,
                                               write_mesh_ply)
    from instascene_tpu.models.gaussians import load_ply

    ply = args.ply_path or os.path.join(dataset.source_path,
                                        "point_cloud.ply")
    params = load_ply(ply)
    scene = Scene(dataset)
    extractor = GaussianExtractor(params, pipe)
    extractor.reconstruction(scene.get_train_cameras())
    if args.unbounded:
        verts, faces, cols = extractor.extract_mesh_unbounded(args.mesh_res)
    else:
        verts, faces, cols = extractor.extract_mesh_bounded(
            voxel_size=args.voxel_size, sdf_trunc=args.sdf_trunc,
            depth_trunc=args.depth_trunc)
    verts, faces, cols = post_process_mesh(verts, faces, cols,
                                           args.num_clusters)
    out = os.path.join(scene.model_path, args.output)
    write_mesh_ply(out, verts, faces, cols)
    print(f"mesh saved: {out} ({len(verts)} verts, {len(faces)} faces)")


if __name__ == "__main__":
    main()

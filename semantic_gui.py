#!/usr/bin/env python
"""Interactive segmentation GUI — reference semantic_gui.py parity.

With dearpygui installed and a display, opens the interactive viewer; in
headless environments use --headless with --click x,y[,x2,y2...] to run the
same click→segment→save flow programmatically."""

import os
import sys
from argparse import ArgumentParser

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main(argv=None):
    parser = ArgumentParser()
    parser.add_argument("--ply_path", "-p", type=str, required=True)
    parser.add_argument("--seg_feat_dim", type=int, default=16)
    parser.add_argument("--interactive_note", type=str, default="default")
    parser.add_argument("--width", type=int, default=800)
    parser.add_argument("--height", type=int, default=600)
    parser.add_argument("--score_threshold", type=float, default=0.7)
    parser.add_argument("--headless", action="store_true")
    parser.add_argument("--click", type=str, default="",
                        help="headless: comma-separated pixel coords x,y,...")
    parser.add_argument("--camera_radius", type=float, default=2.0)
    parser.add_argument("--out_dir", type=str,
                        default="interactive_segmentation")
    parser.add_argument("--use_colmap_camera", action="store_true",
                        help="browse the scene's COLMAP training cameras "
                             "(requires --source_path)")
    parser.add_argument("--source_path", "-s", type=str, default="",
                        help="scene dir for --use_colmap_camera")
    parser.add_argument("--downscale_ratio", "-r", type=int, default=1)
    parser.add_argument("--render_mode", type=str, default="rgb",
                        choices=["rgb", "feature", "depth", "normal",
                                 "alpha"],
                        help="headless preview mode")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])

    from instascene_tpu.config import PipelineParams
    from instascene_tpu.models.gaussians import load_ply
    from instascene_tpu.viewer.gui import (OrbitCamera, SegmentationEngine,
                                           compose_frame, run_gui)

    params = load_ply(args.ply_path, max_sh_degree=3,
                      seg_feat_dim=args.seg_feat_dim, load_seg_feat=True)
    if params.seg_feature is None:
        raise SystemExit("PLY has no segfeat_* attributes — run "
                         "train_semantic.py first")
    engine = SegmentationEngine(params, PipelineParams(),
                                score_threshold=args.score_threshold)

    train_cameras = None
    if args.use_colmap_camera:
        if not args.source_path:
            raise SystemExit("--use_colmap_camera requires --source_path")
        # reference semantic_gui.py:176-182: COLMAP cameras without images
        from instascene_tpu.config import ModelParams
        from instascene_tpu.data.dataset import Scene
        scene = Scene(ModelParams(source_path=args.source_path,
                                  resolution=args.downscale_ratio),
                      load_images=False)
        train_cameras = scene.get_train_cameras()

    if args.headless:
        if train_cameras:
            mini = train_cameras[0]
        else:
            cam = OrbitCamera(args.width, args.height, r=args.camera_radius)
            mini = cam.minicam()
        coords = [float(x) for x in args.click.split(",") if x]
        for i in range(0, len(coords) - 1, 2):
            engine.click(mini, int(coords[i]), int(coords[i + 1]))
            print(f"click at ({coords[i]}, {coords[i+1]})")
        if engine.chosen_features:
            save_dir = os.path.join(args.out_dir, args.interactive_note)
            mask = engine.segment_3d(save_dir, 0)
            print(f"segmented {int(mask.sum())} gaussians → {save_dir}")
        else:
            need_aux = args.render_mode in ("depth", "normal", "alpha")
            frame = engine.render_view(mini, need_aux=need_aux)
            buf = compose_frame(engine, frame, args.render_mode)
            from PIL import Image
            os.makedirs(args.out_dir, exist_ok=True)
            Image.fromarray((np.clip(frame["rgb"], 0, 1) * 255
                             ).astype(np.uint8)).save(
                os.path.join(args.out_dir, "preview_rgb.png"))
            Image.fromarray((np.clip(frame["feat_rgb"], 0, 1) * 255
                             ).astype(np.uint8)).save(
                os.path.join(args.out_dir, "preview_feat.png"))
            Image.fromarray((np.clip(buf, 0, 1) * 255).astype(np.uint8)).save(
                os.path.join(args.out_dir,
                             f"preview_{args.render_mode}.png"))
            print(f"wrote previews to {args.out_dir}")
    else:
        run_gui(engine, args.width, args.height, args.interactive_note,
                train_cameras=train_cameras, ply_path=args.ply_path)


if __name__ == "__main__":
    main()

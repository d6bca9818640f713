#!/usr/bin/env python
"""Offline 2D instance-mask generation → sam/mask/*.png.

The reference uses CropFormer (semantic_modules/CropFormer, a detectron2 +
HorNet stack in its own conda env) purely as an OFFLINE preprocessing step:
the pipeline only consumes integer label maps at sam/mask/<image>.png
(reference run_cropformer.py:153-165). Any panoptic/instance segmenter
satisfies the contract:

  * one PNG per training image, same base name
  * uint8/uint16 pixels; 0 = unlabeled/background, k>0 = instance k
  * NEAREST-resize-safe (labels, not colors)

This script produces that layout with, in order of preference:
  1. a HuggingFace Mask2Former checkpoint (pass --hf_model; requires the
     weights to be available locally — this environment has no egress)
  2. --from_dir: copy/convert existing label maps (e.g. CropFormer output)
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def masks_from_hf(image_paths, out_dir, model_name, confidence=0.8):
    import torch
    from PIL import Image
    from transformers import (AutoImageProcessor,
                              Mask2FormerForUniversalSegmentation)
    processor = AutoImageProcessor.from_pretrained(model_name)
    model = Mask2FormerForUniversalSegmentation.from_pretrained(model_name)
    model.eval()
    for p in image_paths:
        img = Image.open(p).convert("RGB")
        inputs = processor(images=img, return_tensors="pt")
        with torch.no_grad():
            out = model(**inputs)
        seg = processor.post_process_instance_segmentation(
            out, target_sizes=[img.size[::-1]],
            threshold=confidence)[0]["segmentation"]
        seg = np.asarray(seg.cpu().numpy()).astype(np.int32)
        seg = np.where(seg < 0, 0, seg + 1)  # -1 noise → 0; ids from 1
        name = os.path.basename(p).split(".")[0] + ".png"
        Image.fromarray(seg.astype(np.uint16)).save(os.path.join(out_dir,
                                                                 name))
        print("wrote", name, "instances:", int(seg.max()))


def masks_from_dir(image_paths, out_dir, src_dir):
    from PIL import Image
    for p in image_paths:
        base = os.path.basename(p).split(".")[0]
        for ext in (".png", ".npy"):
            src = os.path.join(src_dir, base + ext)
            if os.path.exists(src):
                arr = (np.load(src) if ext == ".npy"
                       else np.array(Image.open(src)))
                if arr.ndim == 3:
                    arr = arr[..., 0]
                Image.fromarray(arr.astype(np.uint16)).save(
                    os.path.join(out_dir, base + ".png"))
                break
        else:
            print(f"warning: no mask source for {base}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--source_path", "-s", required=True)
    ap.add_argument("--images", default="images")
    ap.add_argument("--hf_model", default="",
                    help="e.g. facebook/mask2former-swin-large-coco-instance")
    ap.add_argument("--from_dir", default="",
                    help="directory of precomputed label maps to convert")
    ap.add_argument("--confidence", type=float, default=0.8)
    args = ap.parse_args()

    img_dir = os.path.join(args.source_path, args.images)
    out_dir = os.path.join(args.source_path, "sam/mask")
    os.makedirs(out_dir, exist_ok=True)
    image_paths = sorted(
        os.path.join(img_dir, f) for f in os.listdir(img_dir)
        if f.lower().endswith((".png", ".jpg", ".jpeg")))
    if args.from_dir:
        masks_from_dir(image_paths, out_dir, args.from_dir)
    elif args.hf_model:
        masks_from_hf(image_paths, out_dir, args.hf_model, args.confidence)
    else:
        raise SystemExit("provide --hf_model or --from_dir (see docstring "
                         "for the sam/mask contract)")


if __name__ == "__main__":
    main()

"""TensorBoard logging, used when torch.utils.tensorboard is importable.

Parity: reference train.py:26-31 (`prepare_output_and_logger`) and
:214-277 (`training_report` scalars). The writer is optional exactly as in
the reference — absence of tensorboard downgrades to stdout-only."""

from __future__ import annotations

from typing import Optional


def maybe_summary_writer(log_dir: str):
    """A torch SummaryWriter on `log_dir`, or None when unavailable."""
    try:
        from torch.utils.tensorboard import SummaryWriter
    except Exception:
        print("Tensorboard not available: not logging progress")
        return None
    return SummaryWriter(log_dir)


def log_train_scalars(writer: Optional[object], it: int, metrics: dict,
                      elapsed_s: float) -> None:
    """Per-iteration scalars (train.py:218-221)."""
    if writer is None:
        return
    writer.add_scalar("train_loss_patches/l1_loss", float(metrics["ll1"]), it)
    writer.add_scalar("train_loss_patches/total_loss",
                      float(metrics["loss"]), it)
    writer.add_scalar("train_loss_patches/dist_loss",
                      float(metrics["dist"]), it)
    writer.add_scalar("train_loss_patches/normal_loss",
                      float(metrics["normal"]), it)
    writer.add_scalar("iter_time", elapsed_s * 1e3, it)


def log_eval_scalars(writer: Optional[object], it: int, split: str,
                     l1: float, psnr: float, n_points: int) -> None:
    """Evaluation scalars (train.py:254-272)."""
    if writer is None:
        return
    writer.add_scalar(f"{split}/loss_viewpoint - l1_loss", l1, it)
    writer.add_scalar(f"{split}/loss_viewpoint - psnr", psnr, it)
    writer.add_scalar("total_points", n_points, it)


def _colormap(img, cmap: str = "turbo"):
    """[H,W] → [H,W,3] float colormap (reference utils/general_utils.colormap);
    grayscale fallback when matplotlib is unavailable."""
    import numpy as np
    img = np.asarray(img, dtype=np.float32)
    lo, hi = float(img.min()), float(img.max())
    norm = (img - lo) / (hi - lo + 1e-12)
    try:
        import matplotlib.cm as cm
        return cm.get_cmap(cmap)(norm)[..., :3].astype(np.float32)
    except Exception:
        return np.repeat(norm[..., None], 3, axis=-1)


def log_eval_images(writer: Optional[object], it: int, split: str,
                    view_name: str, maps: dict, with_gt: bool = False) -> None:
    """Per-view evaluation image grids (train.py:236-267): render, turbo-
    colormapped depth & distortion, rend/surf normals, alpha (+ GT once).
    `maps` is an eval_step result dict (channels-last device arrays)."""
    if writer is None:
        return
    import numpy as np

    def chw(x):   # [H,W,C] float → [1,C,H,W] for add_images
        x = np.asarray(x, dtype=np.float32)
        if x.ndim == 2:
            x = x[..., None]
        return np.clip(np.transpose(x, (2, 0, 1))[None], 0.0, 1.0)

    base = f"{split}_view_{view_name}"
    writer.add_images(f"{base}/render", chw(maps["image"]), global_step=it)
    depth = np.asarray(maps["surf_depth"])[..., 0]
    writer.add_images(f"{base}/depth",
                      chw(_colormap(depth / (depth.max() + 1e-12))),
                      global_step=it)
    writer.add_images(f"{base}/rend_normal",
                      chw(np.asarray(maps["rend_normal"]) * 0.5 + 0.5),
                      global_step=it)
    writer.add_images(f"{base}/surf_normal",
                      chw(np.asarray(maps["surf_normal"]) * 0.5 + 0.5),
                      global_step=it)
    writer.add_images(f"{base}/rend_alpha", chw(maps["rend_alpha"]),
                      global_step=it)
    writer.add_images(f"{base}/rend_dist",
                      chw(_colormap(np.asarray(maps["rend_dist"]))),
                      global_step=it)
    if with_gt and "gt" in maps and maps["gt"] is not None:
        writer.add_images(f"{base}/ground_truth", chw(maps["gt"]),
                          global_step=it)

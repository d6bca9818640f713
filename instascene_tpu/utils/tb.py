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

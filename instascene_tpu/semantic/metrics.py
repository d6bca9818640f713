"""Instance segmentation quality metrics.

The reference repo publishes no in-repo metrics (its mIoU table lives in the
paper, arXiv 2507.08416); this module adds the measurable axis the rebuild
tracks round-over-round: mean IoU of predicted instance sets vs ground truth
under optimal one-to-one matching.
"""

from __future__ import annotations

import numpy as np


def instance_miou(pred_labels: np.ndarray, true_labels: np.ndarray,
                  ignore_label: int = 0) -> float:
    """Mean IoU over ground-truth instances with Hungarian-matched predicted
    instances.

    pred_labels/true_labels: integer label per element (gaussian or pixel);
    `ignore_label` (default 0 = background/unassigned) participates in
    neither side. Unmatched ground-truth instances contribute IoU 0, so the
    score penalizes both under- and over-segmentation.
    """
    pred = np.asarray(pred_labels).reshape(-1)
    true = np.asarray(true_labels).reshape(-1)
    if pred.shape != true.shape:
        raise ValueError(f"shape mismatch {pred.shape} vs {true.shape}")
    t_ids = np.unique(true[true != ignore_label])
    p_ids = np.unique(pred[pred != ignore_label])
    if len(t_ids) == 0:
        return 1.0 if len(p_ids) == 0 else 0.0
    if len(p_ids) == 0:
        return 0.0
    iou = np.zeros((len(t_ids), len(p_ids)), np.float64)
    for i, t in enumerate(t_ids):
        tm = true == t
        ts = tm.sum()
        for j, q in enumerate(p_ids):
            pm = pred == q
            inter = np.count_nonzero(tm & pm)
            if inter:
                iou[i, j] = inter / (ts + pm.sum() - inter)
    from scipy.optimize import linear_sum_assignment
    ri, ci = linear_sum_assignment(-iou)
    return float(iou[ri, ci].sum() / len(t_ids))

"""Segmentation metrics.

Parity with the reference's ``utils/metric.py``:

* ``seg_metrics`` reproduces ``metric(gt, pred, spacing)``
  (/root/reference/utils/metric.py:20-75): confusion-style counts with
  smooth=0.001 in every denominator; returns (jaccard, dice) without
  spacing and (precision, recall, jaccard, dice, hd95) with spacing.
* ``hausdorff_95`` replaces MONAI's ``compute_hausdorff_distance(
  percentile=95, spacing=...)`` (metric.py:6,29-32) with a scipy
  distance-transform implementation (undirected: max of both directed
  95th percentiles, MONAI's default).

TPU-first improvement over the reference: the train-loop metric runs
on-device inside the jitted train step (``dice_from_counts`` over psum-able
counts) instead of the reference's per-step CPU sync
(/root/reference/train.py:221, SURVEY §2.8).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from scipy import ndimage

SMOOTH = 0.001  # reference metric.py:57


# ---------------------------------------------------------------------------
# Device-side (jit-friendly) metrics
# ---------------------------------------------------------------------------


def confusion_counts(gt: jnp.ndarray, pred: jnp.ndarray):
    """Binary confusion counts (device). gt/pred: any shape, {0,1}-valued.

    Returns (tp, fp, fn, tn, gt_sum, pred_sum, intersection, union) — all
    scalars; these are psum-able across a mesh axis, which is the proper
    implementation of the reference's TODO "use reduce to sum up all rank's
    calculation results" (/root/reference/train.py:220-224).
    """
    g = gt.astype(jnp.float32)
    p = pred.astype(jnp.float32)
    tp = jnp.sum(g * p)
    fp = jnp.sum(p * (1 - g))
    fn = jnp.sum(g * (1 - p))
    tn = jnp.sum((1 - g) * (1 - p))
    inter = tp
    union = tp + fp + fn
    return tp, fp, fn, tn, jnp.sum(g), jnp.sum(p), inter, union


def dice_jaccard(gt: jnp.ndarray, pred: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(jaccard, dice) with the reference's smooth=0.001 (metric.py:68-69)."""
    tp, fp, fn, tn, g_sum, p_sum, inter, union = confusion_counts(gt, pred)
    jaccard = inter / (union + SMOOTH)
    dice = 2 * inter / (g_sum + p_sum + SMOOTH)
    return jaccard, dice


# ---------------------------------------------------------------------------
# Host-side full-volume metrics (predict path)
# ---------------------------------------------------------------------------


def _surface(mask: np.ndarray) -> np.ndarray:
    """Boundary voxels: mask XOR its erosion (MONAI get_mask_edges)."""
    if not mask.any():
        return np.zeros_like(mask, dtype=bool)
    eroded = ndimage.binary_erosion(mask)
    return mask ^ eroded


def hausdorff_95(
    gt: np.ndarray, pred: np.ndarray, spacing: Sequence[float]
) -> float:
    """95th-percentile Hausdorff distance (undirected), physical units."""
    gt = np.asarray(gt, dtype=bool)
    pred = np.asarray(pred, dtype=bool)
    if not gt.any() or not pred.any():
        return float("inf")
    # Crop both masks to the union bounding box + 1 background voxel of
    # margin (MONAI's get_mask_edges does the same): the EDT cost scales
    # with the crop, not the volume — this is what keeps the host-side
    # metric off the predict pipeline's critical path. EXACT: all surface
    # voxels and their mutual distances live inside the box, and erosion
    # border behavior is preserved (where fg touches the array border the
    # crop border coincides with it; elsewhere the margin supplies the
    # background neighbor) — pinned by the brute-force oracle test.
    union = gt | pred
    crop = []
    for ax in range(union.ndim):
        other = tuple(i for i in range(union.ndim) if i != ax)
        idx = np.flatnonzero(union.any(axis=other))
        crop.append(
            slice(max(int(idx[0]) - 1, 0), min(int(idx[-1]) + 2, union.shape[ax]))
        )
    gt = gt[tuple(crop)]
    pred = pred[tuple(crop)]
    s_gt = _surface(gt)
    s_pred = _surface(pred)
    if not s_gt.any() or not s_pred.any():
        return float("inf")
    spacing = np.asarray(spacing, dtype=np.float64)
    dt_gt = ndimage.distance_transform_edt(~s_gt, sampling=spacing)
    dt_pred = ndimage.distance_transform_edt(~s_pred, sampling=spacing)
    d_pred_to_gt = dt_gt[s_pred]
    d_gt_to_pred = dt_pred[s_gt]
    return float(
        max(np.percentile(d_pred_to_gt, 95), np.percentile(d_gt_to_pred, 95))
    )


def seg_metrics(
    gt: np.ndarray,
    pred: np.ndarray,
    spacing: Optional[Sequence[float]] = None,
):
    """Reference ``metric()`` semantics (metric.py:20-75).

    gt/pred: integer masks of any (broadcast-compatible) shape.
    Without spacing -> (jaccard, dice); with spacing ->
    (precision, recall, jaccard, dice, hd95).
    """
    gdth = np.asarray(gt).astype(int).squeeze()
    pred_i = np.asarray(pred).astype(int).squeeze()

    gdth_sum = gdth.sum()
    pred_sum = pred_i.sum()
    intersection = gdth & pred_i
    union = gdth | pred_i
    intersection_sum = np.count_nonzero(intersection)
    union_sum = np.count_nonzero(union)

    tp = intersection.sum()

    jaccard = intersection_sum / (union_sum + SMOOTH)
    dice = 2 * intersection_sum / (gdth_sum + pred_sum + SMOOTH)

    if spacing is None:
        return jaccard, dice

    precision = tp / (pred_sum + SMOOTH)
    recall = tp / (gdth_sum + SMOOTH)
    hd95 = hausdorff_95(gdth > 0, pred_i > 0, spacing)
    return precision, recall, jaccard, dice, hd95


def multiclass_seg_metrics(
    gt: np.ndarray,
    pred: np.ndarray,
    n_classes: int,
    spacing: Optional[Sequence[float]] = None,
):
    """Macro-averaged per-foreground-class metrics (capability extension —
    the reference's metric() is binary-only). Classes absent from both gt
    and pred are skipped."""
    gt = np.asarray(gt).squeeze()
    pred = np.asarray(pred).squeeze()
    per_class = []
    for c in range(1, n_classes):
        g = gt == c
        p = pred == c
        if not g.any() and not p.any():
            continue
        per_class.append(seg_metrics(g.astype(int), p.astype(int), spacing))
    if not per_class:
        return (0.0, 0.0) if spacing is None else (0.0, 0.0, 0.0, 0.0, float("inf"))
    finite = np.asarray(
        [[v if np.isfinite(v) else np.nan for v in row] for row in per_class],
        dtype=np.float64,
    )
    return tuple(np.nanmean(finite, axis=0))


def brats_metrics(gt: np.ndarray, wt: np.ndarray, et: np.ndarray, tc: np.ndarray, spacing):
    """BraTS WT/ET/TC wrapper (reference ``all_metric``, metric.py:9-17)."""
    return tuple(
        seg_metrics(g, p, spacing) for g, p in ((gt[0], wt), (gt[1], et), (gt[2], tc))
    )

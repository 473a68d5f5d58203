"""Loss functions (device-side, jit-friendly).

Numerically matching the reference's ``utils/loss_function.py``:

* ``bce_with_logits``   — the only loss the reference actually trains with
  (nn.BCEWithLogitsLoss at /root/reference/train.py:115,209), on
  ``[B, ..., 2]`` logits vs a constructed (background, foreground) one-hot;
* ``cross_entropy``     — cross_entropy_3D (loss_function.py:8-16);
* ``binary_dice_loss``  — BinaryDiceLoss smooth=1, p=2 (loss_function.py:61-99);
* ``dice_loss``         — DiceLoss: sigmoid + global soft dice, eps 1e-5
  (loss_function.py:102-130);
* ``multiclass_dice_loss`` — DiceLossss: per-class soft dice over one-hot,
  smooth 1e-5, optional softmax/weights (loss_function.py:148-185);
* ``focal_loss``        — standard binary focal loss (library extension,
  named in BASELINE.json's fused-loss inventory).

All take channels-LAST tensors (TPU layout). Each reduction is a single
fused XLA reduction — the BASELINE.json "one fused masked-reduction kernel"
is delivered by XLA fusion of the elementwise log-sigmoid/one-hot work into
the reduce; see ops/fused.py for the Pallas variant used on the hot path.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp


def one_hot_background(gt: jnp.ndarray) -> jnp.ndarray:
    """Build the reference's 2-channel target from a binary mask:
    channel 0 = (gt == 0), channel 1 = gt (/root/reference/train.py:191-193).

    gt: [B, ..., 1] float -> [B, ..., 2] float.
    """
    gt_back = (gt == 0).astype(gt.dtype)
    return jnp.concatenate([gt_back, gt], axis=-1)


def bce_with_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.BCEWithLogitsLoss (mean reduction), numerically stable."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    # max(x,0) - x*y + log(1 + exp(-|x|))
    loss = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    return jnp.mean(loss)


def cross_entropy(
    logits: jnp.ndarray,
    target_indices: jnp.ndarray,
    weight: Optional[jnp.ndarray] = None,
    size_average: bool = True,
) -> jnp.ndarray:
    """cross_entropy_3D: log_softmax over channels + NLL over all voxels.

    logits: [B, ..., C]; target_indices: integer [B, ...].
    """
    logits = logits.astype(jnp.float32)
    log_p = jax.nn.log_softmax(logits, axis=-1)
    tgt = target_indices.astype(jnp.int32)
    picked = jnp.take_along_axis(log_p, tgt[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = jnp.asarray(weight)[tgt]
        loss = -jnp.sum(picked * w)
    else:
        loss = -jnp.sum(picked)
    if size_average:
        loss = loss / tgt.size
    return loss


def binary_dice_loss(
    predict: jnp.ndarray,
    target: jnp.ndarray,
    smooth: float = 1.0,
    p: int = 2,
    reduction: str = "mean",
) -> jnp.ndarray:
    """BinaryDiceLoss (loss_function.py:61-99): per-sample soft dice on
    already-activated predictions, flattened over everything but batch."""
    b = predict.shape[0]
    pre = predict.reshape(b, -1).astype(jnp.float32)
    tar = target.reshape(b, -1).astype(jnp.float32)
    num = jnp.sum(pre * tar, axis=1) + smooth
    den = jnp.sum(pre**p + tar**p, axis=1) + smooth
    loss = 1 - num / den
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    if reduction == "none":
        return loss
    raise ValueError(f"Unexpected reduction {reduction}")


def dice_loss(predict: jnp.ndarray, target: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """DiceLoss (loss_function.py:102-130): sigmoid -> global soft dice
    (intersection/union summed over the whole batch)."""
    pre = jax.nn.sigmoid(predict.astype(jnp.float32)).reshape(predict.shape[0], -1)
    tar = target.astype(jnp.float32).reshape(target.shape[0], -1)
    intersection = jnp.sum(jnp.sum(pre * tar, axis=-1))
    union = jnp.sum(jnp.sum(pre + tar, axis=-1))
    return 1 - 2 * (intersection + eps) / (union + eps)


def multiclass_dice_loss(
    inputs: jnp.ndarray,
    target_indices: jnp.ndarray,
    n_classes: int,
    weight: Optional[Sequence[float]] = None,
    softmax: bool = False,
) -> jnp.ndarray:
    """DiceLossss (loss_function.py:148-185): one-hot target + per-class soft
    dice with smooth 1e-5, averaged over classes.

    inputs: [B, ..., C]; target_indices: [B, ...] integer labels.
    """
    smooth = 1e-5
    x = inputs.astype(jnp.float32)
    if softmax:
        x = jax.nn.softmax(x, axis=-1)
    onehot = jax.nn.one_hot(target_indices.astype(jnp.int32), n_classes, dtype=jnp.float32)
    if weight is None:
        weight = [1.0] * n_classes
    w = jnp.asarray(weight, dtype=jnp.float32)

    score = x.reshape(-1, n_classes)
    tgt = onehot.reshape(-1, n_classes)
    intersect = jnp.sum(score * tgt, axis=0)
    y_sum = jnp.sum(tgt * tgt, axis=0)
    z_sum = jnp.sum(score * score, axis=0)
    dice = (2 * intersect + smooth) / (z_sum + y_sum + smooth)
    return jnp.sum((1 - dice) * w) / n_classes


def focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jnp.ndarray:
    """Binary focal loss on logits (library extension beyond the reference)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(logits)
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return jnp.mean(alpha_t * (1 - p_t) ** gamma * ce)


LOSS_REGISTRY = {
    "bce_with_logits": bce_with_logits,
    "cross_entropy": cross_entropy,
    "binary_dice": binary_dice_loss,
    "dice": dice_loss,
    "multiclass_dice": multiclass_dice_loss,
    "focal": focal_loss,
}

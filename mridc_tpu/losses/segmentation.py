"""Segmentation losses: MONAI-style Dice and weighted cross-entropy (jnp).

Functional parity with reference:
mridc/collections/segmentation/losses/dice.py:17 (``Dice`` — sigmoid/softmax
activations, optional one-hot targets, squared_pred, jaccard, smooth_nr/dr,
batch reduction) and losses/cross_entropy.py:10 (``MC_CrossEntropyLoss`` —
class weights + label smoothing; the reference's MC sampling loop reduces to a
single evaluation for deterministic nets, which is what it computes in eval).

Layout: class axis LAST ([B, H, W, C] / [B, D, H, W, C]) — NHWC-native.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["one_hot", "dice_loss", "Dice", "cross_entropy_loss", "CrossEntropyLoss"]


def one_hot(labels: jnp.ndarray, num_classes: int) -> jnp.ndarray:
    """Integer labels [...,] -> one-hot [..., C]."""
    return jax.nn.one_hot(labels.astype(jnp.int32), num_classes, dtype=jnp.float32)


def dice_loss(
    target: jnp.ndarray,
    pred: jnp.ndarray,
    include_background: bool = True,
    to_onehot_y: bool = False,
    sigmoid: bool = True,
    softmax: bool = False,
    squared_pred: bool = False,
    jaccard: bool = False,
    smooth_nr: float = 1e-5,
    smooth_dr: float = 1e-5,
    batch: bool = True,
):
    """Returns (dice_score, dice_loss) like the reference's forward.

    target/pred: [B, ..., C] with class axis last.
    """
    if sigmoid:
        pred = jax.nn.sigmoid(pred)
    n_ch = pred.shape[-1]
    if softmax and n_ch > 1:
        pred = jax.nn.softmax(pred, axis=-1)
    if to_onehot_y and n_ch > 1:
        target = one_hot(target.argmax(-1) if target.shape[-1] == n_ch else target[..., 0], n_ch)
    if not include_background and n_ch > 1:
        target = target[..., 1:]
        pred = pred[..., 1:]

    # reduce over spatial dims (and batch when batch=True), keep class axis
    spatial_axes = tuple(range(1, target.ndim - 1))
    reduce_axes = ((0,) + spatial_axes) if batch else spatial_axes

    intersection = (target * pred).sum(axis=reduce_axes)
    ground = (target**2 if squared_pred else target).sum(axis=reduce_axes)
    prediction = (pred**2 if squared_pred else pred).sum(axis=reduce_axes)
    denom = ground + prediction
    if jaccard:
        denom = 2.0 * (denom - intersection)
    score = (2.0 * intersection + smooth_nr) / (denom + smooth_dr)
    loss = 1.0 - score
    return score.mean(), loss.mean()


class Dice:
    """Callable matching the reference constructor arguments."""

    def __init__(
        self,
        include_background: bool = True,
        to_onehot_y: bool = False,
        sigmoid: bool = True,
        softmax: bool = False,
        other_act=None,
        squared_pred: bool = False,
        jaccard: bool = False,
        flatten: bool = False,
        reduction: str = "mean",
        smooth_nr: float = 1e-5,
        smooth_dr: float = 1e-5,
        batch: bool = True,
    ):
        del other_act, flatten, reduction
        self.kw = dict(
            include_background=include_background,
            to_onehot_y=to_onehot_y,
            sigmoid=sigmoid,
            softmax=softmax,
            squared_pred=squared_pred,
            jaccard=jaccard,
            smooth_nr=smooth_nr,
            smooth_dr=smooth_dr,
            batch=batch,
        )

    def __call__(self, target, pred):
        return dice_loss(target, pred, **self.kw)


def cross_entropy_loss(
    target_labels: jnp.ndarray,
    logits: jnp.ndarray,
    weight: Optional[Sequence[float]] = None,
    label_smoothing: float = 0.0,
) -> jnp.ndarray:
    """Mean weighted CE over [B, ..., C] logits and integer targets [B, ...]."""
    n_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits, axis=-1)
    tgt = one_hot(target_labels, n_classes)
    if label_smoothing:
        tgt = tgt * (1 - label_smoothing) + label_smoothing / n_classes
    ce = -(tgt * logp).sum(-1)
    if weight is not None:
        w = jnp.asarray(weight, jnp.float32)
        pix_w = (tgt * w).sum(-1)
        return (ce * pix_w).sum() / jnp.maximum(pix_w.sum(), 1e-12)
    return ce.mean()


class CrossEntropyLoss:
    def __init__(self, num_samples: int = 50, ignore_index: int = -100, reduction: str = "none",
                 label_smoothing: float = 0.0, weight=None):
        del num_samples, ignore_index, reduction
        self.label_smoothing = label_smoothing
        self.weight = weight

    def __call__(self, target_labels, logits):
        return cross_entropy_loss(target_labels, logits, self.weight, self.label_smoothing)

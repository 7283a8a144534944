"""Subsampling-mask application, center masking and cropping.

Functional parity with reference: mridc/collections/common/parts/utils.py
(``apply_mask`` :293, ``mask_center`` :357, ``batched_mask_center`` :395,
``center_crop`` :432, ``complex_center_crop`` :458, ``center_crop_to_smallest``
:486). Mask *generation* lives host-side in :mod:`mridc_tpu.data.subsample`;
these functions are pure jnp and safe inside ``jit``.

Layout: complex arrays ``[batch, coils, h, w]``; masks are real arrays
broadcastable to that shape (typically ``[1, 1, h, w]``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax.numpy as jnp
import numpy as np

__all__ = [
    "apply_mask",
    "mask_center",
    "batched_mask_center",
    "center_crop",
    "center_crop_to_smallest",
]


def apply_mask(
    data,
    mask_func=None,
    seed: Optional[Union[int, Tuple[int, ...]]] = None,
    padding: Optional[Sequence[int]] = None,
    shift: bool = False,
    half_scan_percentage: float = 0.0,
    center_scale: float = 0.02,
    existing_mask: Optional[np.ndarray] = None,
):
    """Subsample k-space by elementwise mask multiplication.

    Mirrors reference utils.py:293-355: generates the mask host-side via
    ``mask_func`` (a :class:`mridc_tpu.data.subsample.MaskFunc`) unless
    ``existing_mask`` is given, optionally zeroes a padding band along the
    phase-encode axis, optionally fftshifts the mask, and multiplies.

    Returns ``(masked_data, mask, acceleration)``.
    """
    data = jnp.asarray(data)
    if existing_mask is None:
        shape = np.array(data.shape if not jnp.iscomplexobj(data) else data.shape + (2,))
        shape[:-3] = 1
        mask, acc = mask_func(shape, seed, half_scan_percentage=half_scan_percentage, scale=center_scale)
    else:
        mask = existing_mask
        acc = np.asarray(mask).size / max(float(np.asarray(mask).sum()), 1)

    # copy: the padding band must not mutate a caller-owned mask
    mask = np.array(mask, dtype=np.float32, copy=True)
    if padding is not None and padding[0] != 0:
        # reference utils.py:333-336 zeroes dim 2 — the phase-encode axis of
        # its [1, (1|h), w, 1] mask layouts
        if mask.ndim >= 3:
            mask[:, :, : padding[0]] = 0
            mask[:, :, padding[1] :] = 0
        else:
            mask[..., : padding[0]] = 0
            mask[..., padding[1] :] = 0

    # The generator layout carries a trailing singleton "complex" axis
    # (reference masks are [1, h, w, 1] / [1, 1, w, 1]). Keep it for
    # real-view data (it broadcasts against the [..., 2] axis); drop it for
    # the native-complex layout.
    data_is_real_view = not jnp.iscomplexobj(data) and data.shape[-1] == 2
    if mask.ndim > 2 and mask.shape[-1] == 1 and not data_is_real_view:
        mask = mask[..., 0]

    mask_j = jnp.asarray(mask)
    if shift:
        mask_j = jnp.fft.fftshift(mask_j, axes=(-2, -1))

    masked_data = data * mask_j + 0.0
    return masked_data, mask_j, acc


def mask_center(x: jnp.ndarray, mask_from: int, mask_to: int, mask_type: str = "2D") -> jnp.ndarray:
    """Zero everything outside the ACS center band (reference utils.py:357-393).

    The reference indexes FIXED dims (dim 2 for "2D", dim 3 for "1D"),
    independent of whether a trailing complex axis exists — for
    ``[B, C, H, W(, 2)]`` that is the H band ("2D") or the W band ("1D").
    """
    if isinstance(mask_from, (list, tuple)):
        mask_from = mask_from[0]
    if isinstance(mask_to, (list, tuple)):
        mask_to = mask_to[0]
    out = jnp.zeros_like(x)
    if mask_type == "1D":
        return out.at[:, :, :, mask_from:mask_to].set(x[:, :, :, mask_from:mask_to])
    if mask_type == "2D":
        return out.at[:, :, mask_from:mask_to].set(x[:, :, mask_from:mask_to])
    raise ValueError(f"Unknown mask_type {mask_type!r}")


def batched_mask_center(
    x: jnp.ndarray, mask_from: jnp.ndarray, mask_to: jnp.ndarray, mask_type: str = "2D"
) -> jnp.ndarray:
    """Per-batch-element ACS band masking (reference utils.py:395-430).

    Implemented with an index comparison instead of a python loop so it stays
    jittable with traced ``mask_from``/``mask_to``.
    """
    mask_from = jnp.atleast_1d(jnp.asarray(mask_from))
    mask_to = jnp.atleast_1d(jnp.asarray(mask_to))
    if mask_from.shape[0] == 1:
        # reference dispatches length-1 inputs to mask_center (axis follows
        # mask_type); implemented with an index comparison to stay jittable
        # with traced bounds
        axis = 3 if mask_type == "1D" else 2
    else:
        # the reference's batched branch always bands dim 3
        # (utils.py:509 ``mask[i, :, :, start:end]``), regardless of type
        axis = 3
    n = x.shape[axis]
    idx = jnp.arange(n)
    # [batch, n] keep-band indicator (batch may be 1 -> broadcasts over x)
    keep = (idx[None, :] >= mask_from[:, None]) & (idx[None, :] < mask_to[:, None])
    shape = [mask_from.shape[0]] + [1] * (x.ndim - 1)
    shape[axis] = n
    keep = keep.reshape(shape)
    return jnp.where(keep, x, jnp.zeros_like(x))


def center_crop(data: jnp.ndarray, shape: Tuple[int, int]) -> jnp.ndarray:
    """Center crop over the trailing two (spatial) axes (reference utils.py:432)."""
    h, w = int(shape[0]), int(shape[1])
    if not (0 < h <= data.shape[-2] and 0 < w <= data.shape[-1]):
        raise ValueError(f"Invalid crop {shape} for array of shape {data.shape}")
    top = (data.shape[-2] - h) // 2
    left = (data.shape[-1] - w) // 2
    return data[..., top : top + h, left : left + w]


def center_crop_to_smallest(x: jnp.ndarray, y: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Crop both inputs to the common smallest spatial size (reference utils.py:486)."""
    h = min(x.shape[-2], y.shape[-2])
    w = min(x.shape[-1], y.shape[-1])
    return center_crop(x, (h, w)), center_crop(y, (h, w))

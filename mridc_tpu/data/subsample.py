"""K-space subsampling mask generators (host-side numpy).

Functional parity with reference: mridc/collections/common/data/subsample.py
(``MaskFunc`` :42, ``RandomMaskFunc`` :153, ``Equispaced1D/2D`` :221/:296,
``Gaussian1D/2D`` :377/:493, ``Poisson2D`` :621, ``create_masker`` :845).

Masks are generated on the host with ``np.random.RandomState`` seeded
per-filename (``temp_seed``), exactly as the reference does, so the seeded
generators (random1d, equispaced1d/2d) are **bit-identical** to the reference.
The TPU never sees this code: masks are precomputed per (shape, acceleration,
seed) and shipped to the device as plain arrays.

Mask layout: returned arrays broadcast against k-space of shape
``[..., h, w]`` — 1D masks are ``[1, 1, w]``-like (singleton everywhere except
the phase-encode/second-to-last *column* axis of the reference layout, which in
the native-complex layout is the last axis before the dropped complex dim),
2D masks carry both spatial axes. ``apply_mask`` in :mod:`mridc_tpu.ops.masking`
drops the trailing singleton complex axis.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional, Sequence, Tuple, Union

import numpy as np

__all__ = [
    "temp_seed",
    "MaskFunc",
    "RandomMaskFunc",
    "Equispaced1DMaskFunc",
    "Equispaced2DMaskFunc",
    "Gaussian1DMaskFunc",
    "Gaussian2DMaskFunc",
    "Poisson2DMaskFunc",
    "create_masker",
]


# mask generation is RNG-stateful (get_state/seed/draw/set_state on a shared
# RandomState) and runs on loader worker threads (data/prefetch.py): the
# whole critical section must be atomic or interleaved seeds corrupt masks.
# One global lock: mask drawing is microseconds against the h5+transform
# pipeline it overlaps, so serializing it costs nothing.
_TEMP_SEED_LOCK = threading.RLock()


@contextlib.contextmanager
def temp_seed(rng: np.random.RandomState, seed: Optional[Union[int, Tuple[int, ...]]]):
    """Temporarily seed ``rng``; restores state on exit (reference :13-40).
    Thread-safe: the seed/draw/restore sequence holds a global lock."""
    with _TEMP_SEED_LOCK:
        if seed is None:
            yield
        else:
            state = rng.get_state()
            rng.seed(seed)
            try:
                yield
            finally:
                rng.set_state(state)


class MaskFunc:
    """Base class: holds (center_fractions, accelerations) pairs and an RNG."""

    def __init__(self, center_fractions: Sequence[float], accelerations: Sequence[int]):
        if len(center_fractions) != len(accelerations):
            raise ValueError("Number of center fractions should match number of accelerations")
        self.center_fractions = list(center_fractions)
        self.accelerations = list(accelerations)
        self.rng = np.random.RandomState()

    def __call__(self, shape, seed=None, half_scan_percentage: float = 0.0, scale: float = 0.02):
        raise NotImplementedError

    def choose_acceleration(self):
        """Uniformly pick one (center_fraction, acceleration) pair (reference :138-152)."""
        choice = self.rng.randint(0, len(self.accelerations))
        return self.center_fractions[choice], self.accelerations[choice]


def _column_mask_shape(shape) -> list:
    """All-singleton shape with the column count at dim -2 (reference layout)."""
    mask_shape = [1 for _ in shape]
    mask_shape[-2] = int(shape[-2])
    return mask_shape


class RandomMaskFunc(MaskFunc):
    """Uniform-random column mask with fully sampled center (reference :153-220).

    Bit-identical to the reference for a given seed: the center band is set
    *after* drawing ``rng.uniform(size=num_cols)``.
    """

    def __call__(self, shape, seed=None, half_scan_percentage: float = 0.0, scale: float = 0.02):
        if len(shape) < 3:
            raise ValueError("Shape should have 3 or more dimensions")
        with temp_seed(self.rng, seed):
            num_cols = int(shape[-2])
            center_fraction, acceleration = self.choose_acceleration()
            num_low_freqs = int(round(num_cols * center_fraction))
            prob = (num_cols / acceleration - num_low_freqs) / (num_cols - num_low_freqs)
            mask = self.rng.uniform(size=num_cols) < prob
            pad = (num_cols - num_low_freqs + 1) // 2
            mask[pad : pad + num_low_freqs] = True
            mask = mask.reshape(_column_mask_shape(shape)).astype(np.float32)
        return mask, acceleration


class Equispaced1DMaskFunc(MaskFunc):
    """Equispaced column mask with random offset (reference :221-295)."""

    def __call__(self, shape, seed=None, half_scan_percentage: float = 0.0, scale: float = 0.02):
        if len(shape) < 3:
            raise ValueError("Shape should have 3 or more dimensions")
        with temp_seed(self.rng, seed):
            center_fraction, acceleration = self.choose_acceleration()
            num_cols = int(shape[-2])
            num_low_freqs = int(round(num_cols * center_fraction))

            mask = np.zeros(num_cols, dtype=np.float32)
            pad = (num_cols - num_low_freqs + 1) // 2
            mask[pad : pad + num_low_freqs] = True

            # spacing adjusted for the fully-sampled center (fastMRI convention)
            adjusted_accel = (acceleration * (num_low_freqs - num_cols)) / (
                num_low_freqs * acceleration - num_cols
            )
            offset = self.rng.randint(0, round(adjusted_accel))
            accel_samples = np.around(np.arange(offset, num_cols - 1, adjusted_accel)).astype(np.uint32)
            mask[accel_samples] = True
            mask = mask.reshape(_column_mask_shape(shape)).astype(np.float32)
        return mask, acceleration


class Equispaced2DMaskFunc(MaskFunc):
    """Equispaced grid mask over both spatial axes (reference :296-376).

    The per-axis acceleration/center fraction is half the requested value, and
    the reported acceleration is the requested one (reference :374).
    """

    def __call__(self, shape, seed=None, half_scan_percentage: float = 0.0, scale: float = 0.02):
        if len(shape) < 3:
            raise ValueError("Shape should have 3 or more dimensions")
        with temp_seed(self.rng, seed):
            center_fraction, acceleration = self.choose_acceleration()
            axis_accel = acceleration / 2
            axis_cf = center_fraction / 2

            num_cols = int(shape[-2])
            num_rows = int(shape[-3])
            num_low_cols = int(round(num_cols * axis_cf))
            num_low_rows = int(round(num_rows * axis_cf))

            mask = np.zeros([num_rows, num_cols], dtype=np.float32)
            pad_cols = (num_cols - num_low_cols + 1) // 2
            pad_rows = (num_rows - num_low_rows + 1) // 2
            mask[pad_rows : pad_rows + num_low_rows, pad_cols : pad_cols + num_low_cols] = True

            rows = np.arange(0, num_rows, axis_accel).astype(np.int64)
            cols = np.arange(0, num_cols, axis_accel).astype(np.int64)
            mask[np.ix_(rows, cols)] = True

            mask_shape = [1 for _ in shape]
            mask_shape[-2] = num_cols
            mask_shape[-3] = num_rows
            mask = mask.reshape(mask_shape).astype(np.float32)
        return mask, acceleration


class Gaussian1DMaskFunc(MaskFunc):
    """Gaussian-density column mask; center_fraction acts as FWHM (reference :377-492).

    A ``scale``-fraction center band is fully sampled; the remaining columns are
    drawn without replacement from a 1D Gaussian density over column index.
    """

    def __call__(self, shape, seed=None, half_scan_percentage: float = 0.0, scale: float = 0.02):
        if len(shape) < 3:
            raise ValueError("Shape should have 3 or more dimensions")
        with temp_seed(self.rng, seed):
            num_cols = int(shape[-2])
            fwhm, acceleration = self.choose_acceleration()

            scaled = max(int(num_cols * scale), 1)
            start = (num_cols - scaled) // 2
            mask = np.zeros(num_cols, dtype=np.float32)
            mask[start : start + scaled] = 1.0

            sigma = fwhm / np.sqrt(8 * np.log(2))
            x = np.linspace(-1.0, 1.0, num_cols)
            kernel = np.exp(-(x**2) / (2 * sigma**2))
            kernel = kernel / kernel.sum()

            n_sample = int(num_cols / acceleration)
            idxs = self.rng.choice(num_cols, size=n_sample, replace=False, p=kernel)
            mask[idxs] = 1.0

            if half_scan_percentage:
                mask[: int(np.round(num_cols * half_scan_percentage))] = 0.0
            mask = mask.reshape(_column_mask_shape(shape)).astype(np.float32)
        return mask, acceleration


class Gaussian2DMaskFunc(MaskFunc):
    """Gaussian-density 2D mask with fully sampled center ellipse (reference :493-620)."""

    def __call__(self, shape, seed=None, half_scan_percentage: float = 0.0, scale: float = 0.02):
        if len(shape) < 3:
            raise ValueError("Shape should have 3 or more dimensions")
        with temp_seed(self.rng, seed):
            num_rows, num_cols = int(shape[-3]), int(shape[-2])
            fwhm, acceleration = self.choose_acceleration()
            if not isinstance(fwhm, (list, tuple)):
                fwhm = [fwhm, fwhm]

            # fully-sampled center ellipse with half-axes scale*n
            a, b = scale * num_rows, scale * num_cols
            yy, xx = np.mgrid[:num_rows, :num_cols]
            ellipse = ((yy - num_rows / 2) / max(a, 1e-6)) ** 2 + ((xx - num_cols / 2) / max(b, 1e-6)) ** 2
            mask = (ellipse < 1).astype(np.float32)

            kernels = []
            for f, n in zip(fwhm, (num_rows, num_cols)):
                sigma = f / np.sqrt(8 * np.log(2))
                x = np.linspace(-1.0, 1.0, n)
                kernels.append(np.exp(-(x**2) / (2 * sigma**2)))
            kernel = np.sqrt(np.outer(kernels[0], kernels[1]))
            kernel = kernel / kernel.sum()

            n_sample = int(num_rows * num_cols / acceleration)
            flat_idx = self.rng.choice(num_rows * num_cols, size=n_sample, replace=False, p=kernel.ravel())
            mask.ravel()[flat_idx] = 1.0

            if half_scan_percentage:
                mask[: int(np.round(num_rows * half_scan_percentage)), :] = 0.0

            mask_shape = [1 for _ in shape]
            mask_shape[-2] = num_cols
            mask_shape[-3] = num_rows
            mask = mask.reshape(mask_shape).astype(np.float32)
        return mask, acceleration


class Poisson2DMaskFunc(MaskFunc):
    """Variable-density Poisson-disc 2D mask (reference :621-844, after sigpy).

    Pure-numpy dart-throwing with a binary search over the density slope to hit
    the requested acceleration within ``tol``.
    """

    def __call__(
        self,
        shape,
        seed=None,
        half_scan_percentage: float = 0.0,
        scale: float = 0.02,
        calib: Tuple[float, float] = (0.0, 0.0),
        crop_corner: bool = True,
        max_attempts: int = 30,
        tol: float = 0.3,
    ):
        if len(shape) < 3:
            raise ValueError("Shape should have 3 or more dimensions")
        with temp_seed(self.rng, seed):
            ny, nx = int(shape[-3]), int(shape[-2])
            _, acceleration = self.choose_acceleration()

            y, x = np.mgrid[:ny, :nx]
            x = np.maximum(abs(x - nx / 2) - calib[-1] / 2, 0).astype(np.float64)
            x /= max(x.max(), 1e-12)
            y = np.maximum(abs(y - ny / 2) - calib[-2] / 2, 0).astype(np.float64)
            y /= max(y.max(), 1e-12)
            r = np.hypot(x, y)

            slope_max, slope_min = 40.0, 0.0
            d = max(nx, ny)
            mask = np.zeros((ny, nx))
            actual_acceleration = np.inf
            while slope_min < slope_max:
                slope = (slope_max + slope_min) / 2
                radius_x = np.clip((1 + r * slope) * nx / d, 1, None)
                radius_y = np.clip((1 + r * slope) * ny / d, 1, None)
                mask = self._poisson_disc(nx, ny, max_attempts, radius_x, radius_y, calib)
                if crop_corner:
                    mask *= r < 1
                with np.errstate(divide="ignore", invalid="ignore"):
                    actual_acceleration = mask.size / max(np.sum(mask), 1)
                if abs(actual_acceleration - acceleration) < tol:
                    break
                if actual_acceleration < acceleration:
                    slope_min = slope
                else:
                    slope_max = slope

            # always include a fully-sampled center circle of radius scale*ny
            cy, cx = (ny - 1) / 2, (nx - 1) / 2
            yy, xx = np.indices((ny, nx))
            radius = int(ny * scale)
            mask = np.logical_or(mask, ((yy - int(cy)) ** 2 + (xx - int(cx)) ** 2) < radius**2).astype(np.float32)

            if abs(actual_acceleration - acceleration) >= tol:
                raise ValueError(f"Cannot generate mask to satisfy acceleration factor of {acceleration}.")

            if half_scan_percentage:
                mask[: int(np.round(ny * half_scan_percentage)), :] = 0.0

            mask_shape = [1 for _ in shape]
            mask_shape[-2] = nx
            mask_shape[-3] = ny
            mask = mask.reshape(mask_shape)
        return mask, acceleration

    def _poisson_disc(self, nx, ny, max_attempts, radius_x, radius_y, calib):
        mask = np.zeros((ny, nx))
        mask[
            int(ny / 2 - calib[-2] / 2) : int(ny / 2 + calib[-2] / 2),
            int(nx / 2 - calib[-1] / 2) : int(nx / 2 + calib[-1] / 2),
        ] = 1

        pxs = np.empty(nx * ny, np.int64)
        pys = np.empty(nx * ny, np.int64)
        pxs[0] = self.rng.randint(0, nx)
        pys[0] = self.rng.randint(0, ny)
        num_actives = 1
        while num_actives > 0:
            i = self.rng.randint(0, num_actives)
            px, py = pxs[i], pys[i]
            rx, ry = radius_x[py, px], radius_y[py, px]
            done = False
            k = 0
            while not done and k < max_attempts:
                v = (self.rng.random_sample() * 3 + 1) ** 0.5
                t = 2 * np.pi * self.rng.random_sample()
                qx = px + v * rx * np.cos(t)
                qy = py + v * ry * np.sin(t)
                if 0 <= qx < nx and 0 <= qy < ny:
                    startx, endx = max(int(qx - rx), 0), min(int(qx + rx + 1), nx)
                    starty, endy = max(int(qy - ry), 0), min(int(qy + ry + 1), ny)
                    sub = mask[starty:endy, startx:endx]
                    if sub.any():
                        ys, xs = np.nonzero(sub)
                        ys = ys + starty
                        xs = xs + startx
                        close = (((qx - xs) / radius_x[ys, xs]) ** 2 + ((qy - ys) / radius_y[ys, xs]) ** 2) < 1
                        done = not close.any()
                    else:
                        done = True
                k += 1
            if done:
                pxs[num_actives] = int(qx)
                pys[num_actives] = int(qy)
                mask[int(qy), int(qx)] = 1
                num_actives += 1
            else:
                pxs[i] = pxs[num_actives - 1]
                pys[i] = pys[num_actives - 1]
                num_actives -= 1
        return mask


MASKER_REGISTRY = {
    "random1d": RandomMaskFunc,
    "equispaced1d": Equispaced1DMaskFunc,
    "equispaced2d": Equispaced2DMaskFunc,
    "gaussian1d": Gaussian1DMaskFunc,
    "gaussian2d": Gaussian2DMaskFunc,
    "poisson2d": Poisson2DMaskFunc,
}
MASKER_NAMES = tuple(MASKER_REGISTRY)


def create_masker(
    mask_type_str: str,
    center_fractions: Union[Sequence[float], float],
    accelerations: Union[Sequence[int], int],
) -> MaskFunc:
    """Factory over all mask types (reference :845-900)."""
    if isinstance(center_fractions, (int, float)):
        center_fractions = [center_fractions]
    if isinstance(accelerations, (int, float)):
        accelerations = [accelerations]
    if mask_type_str not in MASKER_REGISTRY:
        raise NotImplementedError(f"{mask_type_str} not supported")
    return MASKER_REGISTRY[mask_type_str](center_fractions, accelerations)

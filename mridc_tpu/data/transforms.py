"""Host-side (numpy) MRI preprocessing pipeline.

Functional parity with reference: mridc/collections/common/parts/transforms.py
(``NoisePreWhitening`` :32, ``GeometricDecompositionCoilCompression`` :214,
``ZeroFilling`` :478, ``Cropper`` :591, ``Masker`` :717, ``SSDU`` :953,
``N2R`` :1264, ``Normalizer`` :1409, ``Composer`` :1547,
``MRIDataTransforms`` :1597) — same op set and order, one clean implementation.

Design deviations (TPU-first):
  - Everything here runs on the **host** in numpy over native complex64 arrays
    ``[coils, h, w]`` (2D) or ``[slices, coils, h, w]`` (3D); the jitted device
    step receives plain static-shape arrays only. The reference interleaves
    torch GPU ops with python control flow inside the data path.
  - The canonical sample is the same 10-tuple the reference returns
    (reference transforms.py:1964):
    ``(kspace, masked_kspace, sensitivity_map, mask, prediction, target,
    fname, slice_idx, acc, attrs)`` with lists over acceleration choices.
  - Random acceleration selection happens *here* (per sample, seeded), not
    inside the training step, keeping the jitted step pure.
"""

from __future__ import annotations

import numpy as np
from pathlib import Path
from typing import Dict, List, Optional, Sequence, Tuple, Union

__all__ = [
    "NoisePreWhitening",
    "GeometricDecompositionCoilCompression",
    "ZeroFilling",
    "Cropper",
    "Masker",
    "SSDU",
    "N2R",
    "Normalizer",
    "Composer",
    "MRIDataTransforms",
]


# ---------------------------------------------------------------------------
# host FFT helpers with the reference's centered/normalization semantics.
# scipy.fft (pocketfft) computes complex64 in single precision — the same
# precision class as the reference's torch.fft — and is ~2x faster than
# np.fft, which always upcasts to complex128 (the 1-vCPU host is FFT-bound).
# ---------------------------------------------------------------------------

try:  # scipy is in the baked image; fall back to numpy if absent
    from scipy import fft as _sp_fft
except Exception:  # pragma: no cover
    _sp_fft = np.fft


def _np_fft2(data, centered=False, normalization="backward", axes=(-2, -1)):
    norm = None if normalization in (None, "none") else normalization
    if centered:
        data = np.fft.ifftshift(data, axes=axes)
    data = _sp_fft.fftn(data, axes=axes, norm=norm)
    if centered:
        data = np.fft.fftshift(data, axes=axes)
    return data.astype(np.complex64, copy=False)


def _np_ifft2(data, centered=False, normalization="backward", axes=(-2, -1)):
    norm = None if normalization in (None, "none") else normalization
    if centered:
        data = np.fft.ifftshift(data, axes=axes)
    data = _sp_fft.ifftn(data, axes=axes, norm=norm)
    if centered:
        data = np.fft.fftshift(data, axes=axes)
    return data.astype(np.complex64, copy=False)


def _center_crop(data: np.ndarray, shape: Tuple[int, int]) -> np.ndarray:
    h, w = int(shape[0]), int(shape[1])
    h = min(h, data.shape[-2])
    w = min(w, data.shape[-1])
    top = (data.shape[-2] - h) // 2
    left = (data.shape[-1] - w) // 2
    return data[..., top : top + h, left : left + w]


def is_none(x) -> bool:
    # str(ndarray) renders the whole array — never stringify array-likes
    # (this was ~12% of per-slice transform time on the 1-vCPU host).
    if x is None:
        return True
    if isinstance(x, (np.ndarray, list, tuple, dict)):
        return False
    return str(x).lower() == "none"


class _Transform:
    """Base: optional domain hop around the op (reference transforms use
    apply_backward/forward_transform flags to run image-domain ops on k-space
    data and vice versa)."""

    fft_centered: bool = False
    fft_normalization: str = "backward"
    spatial_dims: Sequence[int] = (-2, -1)

    def _maybe_to_image(self, data, backward):
        if backward:
            return _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        return data

    def _maybe_to_kspace(self, data, backward):
        if backward:
            return _np_fft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        return data


class NoisePreWhitening(_Transform):
    """Coil decorrelation from a noise-only patch (reference :32-213).

    Estimates the coil noise covariance from a k-space corner patch, Cholesky
    factorizes, and applies ``psi = sqrt(2 * scale) * L^-1`` across coils.
    """

    def __init__(
        self,
        find_patch_size: bool = True,
        patch_size: Optional[List[int]] = None,
        scale_factor: float = 1.0,
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        spatial_dims: Sequence[int] = (-2, -1),
    ):
        self.find_patch_size = find_patch_size
        self.patch_size = patch_size
        self.scale_factor = scale_factor
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.spatial_dims = spatial_dims

    def __call__(self, data, apply_backward_transform=False, apply_forward_transform=False):
        if is_none(data):
            return data
        if apply_forward_transform:
            data = _np_fft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))

        if self.find_patch_size:
            patch = self._find_optimal_patch(data)
        elif not is_none(self.patch_size):
            patch = self.patch_size
        else:
            raise ValueError("No patch size defined and find_patch_size is False for noise prewhitening.")

        # the reference works on the real view ([C, H, W, 2], reference :134-157):
        # covariance and psi are REAL matrices applied to re/im jointly, not a
        # complex covariance — match that exactly
        rv = np.stack([data.real, data.imag], -1).astype(np.float32, copy=False)
        noise = rv[:, patch[0] : patch[1], patch[2] : patch[3]]
        noise_int = noise.reshape(noise.shape[0], -1)
        cov = (1.0 / (noise_int.shape[1] - 1)) * (noise_int @ noise_int.T)
        cov = cov + np.eye(cov.shape[0]) * 1e-6
        psi = np.linalg.inv(np.linalg.cholesky(cov)) * np.sqrt(2.0) * np.sqrt(self.scale_factor)
        rv = (psi @ rv.reshape(rv.shape[0], -1)).reshape(rv.shape)
        data = (rv[..., 0] + 1j * rv[..., 1]).astype(np.complex64, copy=False)

        if apply_forward_transform:
            data = _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        return data

    @staticmethod
    def _find_optimal_patch(data: np.ndarray, min_noise: float = 1e10) -> List[int]:
        """Scan 10/20/.../50-pixel patches for the lowest-std RSS region
        (reference :168-213)."""
        best = [0, 10, 0, 10]
        mag = np.sqrt((np.abs(data) ** 2).sum(axis=0))
        for patch_length in [10, 20, 30, 40, 50]:
            for x0 in range(0, data.shape[-2] - patch_length, 10):
                for y0 in range(0, data.shape[-1] - patch_length, 10):
                    patch = mag[x0 : x0 + patch_length, y0 : y0 + patch_length]
                    noise = patch.std(ddof=1)
                    if noise < min_noise:
                        min_noise = noise
                        best = [x0, x0 + patch_length, y0, y0 + patch_length]
        return best


class GeometricDecompositionCoilCompression(_Transform):
    """GCC coil compression (Zhang et al. 2013; reference :214-477).

    1D-ifft along the readout axis, per-readout-position SVD over a sliding
    window of ``virtual_coils``-ish width, optional Procrustes alignment of the
    compression matrices along readout, projection to virtual coils.
    """

    def __init__(
        self,
        virtual_coils: Optional[int] = None,
        calib_lines: Optional[int] = None,
        align_data: bool = True,
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        spatial_dims: Sequence[int] = (-2, -1),
    ):
        self.virtual_coils = virtual_coils
        self.calib_lines = calib_lines
        self.align_data = align_data
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.spatial_dims = spatial_dims

    def __call__(self, data, apply_backward_transform=False, apply_forward_transform=False):
        if is_none(data) or np.ndim(data) <= 1:
            return data
        return self.forward(data)

    @staticmethod
    def _crop_slices(shape, wanted):
        """The reference's centered-crop index arithmetic (reference :336-345):
        per-dim slice [|d//2 + ceil(-s/2)| : |d//2 + ceil(s/2)| + 1 - 1)."""
        out = []
        for dim, s in zip(shape, wanted):
            a = abs(int(dim // 2 + np.ceil(-s / 2)))
            b = abs(int(dim // 2 + np.ceil(s / 2)) + 1)
            out.append(slice(a, b - 1))
        return tuple(out)

    def _fft1(self, x, axis=0, inverse=False):
        fn = np.fft.ifft if inverse else np.fft.fft
        norm = None if self.fft_normalization in (None, "none") else self.fft_normalization
        if self.fft_centered:
            x = np.fft.ifftshift(x, axes=axis)
        x = fn(x, axis=axis, norm=norm)
        if self.fft_centered:
            x = np.fft.fftshift(x, axes=axis)
        return x.astype(np.complex64, copy=False)

    def forward(self, data: np.ndarray) -> np.ndarray:
        """Mirrors the reference's MATLAB-derived sequence exactly
        (reference :295-477): decomposition runs along the LAST spatial axis
        (width) with the center ``calib_lines`` rows as calibration; one
        compression matrix per width position (sliding-window SVD, Procrustes
        alignment outward from the center); compress in hybrid space; then
        per-coil ifft2 -> flip along width -> fft2 back to k-space."""
        if not self.virtual_coils:
            raise ValueError("Number of virtual coils must be defined for GCC.")
        vc = self.virtual_coils
        nc = data.shape[0]
        if nc < vc:
            raise ValueError(f"Tried to compress from {nc} to {vc} coils.")

        x = np.transpose(np.asarray(data, np.complex64), (1, 2, 0))  # [H, W, C]
        hh, ww, _ = x.shape
        calib_lines = nc if vc == 1 else (self.calib_lines or hh)

        # calibration crop: center calib_lines along H, then axis order
        # [W, calib, 1, C] so the width is the decomposition axis (reference
        # crop() :330-346 permutes the same way)
        cal = x[self._crop_slices((hh, ww, nc), (calib_lines, ww, nc))]
        cal = cal[:, :, None, :].transpose(1, 0, 2, 3)
        nx, ny, nz, _ = cal.shape

        im = self._fft1(cal, axis=0, inverse=True)
        ws = (vc // 2) * 2 + 1
        zp = np.zeros((nx + ws - 1, ny, nz, nc), np.complex64)
        zp[self._crop_slices((nx, ny, nz, nc), (nx + ws - 1, ny, nz, nc))[0]] = im

        mats = np.zeros((nx, nc, vc), np.complex64)
        for n in range(nx):
            block = zp[n : n + ws].reshape(-1, nc)
            _, _, vh = np.linalg.svd(block, full_matrices=True)
            mats[n] = vh.conj().T[:, :vc]  # right singular vectors

        if self.align_data:
            # Procrustes alignment outward from the center matrix
            # (reference align_compressed_coils :348-398, n0 = W//2)
            n0 = nx // 2
            a0 = mats[n0 - 1].copy()
            ref = a0
            for n in range(n0, 0, -1):
                a1 = mats[n - 1]
                u, _, vh = np.linalg.svd(a1.conj().T @ ref, full_matrices=False)
                mats[n - 1] = a1 @ (u @ vh)
                ref = mats[n - 1]
            ref = a0
            for n in range(n0, nx):
                a1 = mats[n]
                u, _, vh = np.linalg.svd(a1.conj().T @ ref, full_matrices=False)
                mats[n] = a1 @ (u @ vh)
                ref = mats[n]

        # compress the FULL data: hybrid space along width, one matrix per
        # width position (reference rotate_and_compress :400-477)
        full = x.transpose(1, 0, 2)[:, :, None, :]  # [W, H, 1, C]
        imf = self._fft1(full, axis=0, inverse=True)
        cc = np.empty((nx, hh, 1, vc), np.complex64)
        for n in range(nx):
            cc[n] = (imf[n].reshape(hh * 1, nc) @ mats[n]).reshape(hh, 1, vc)
        cck = self._fft1(cc, axis=0).transpose(1, 0, 2, 3)[:, :, 0, :]  # [H, W, vc]

        dims = tuple(self.spatial_dims)
        img = np.stack(
            [_np_ifft2(cck[:, :, n], self.fft_centered, self.fft_normalization, dims) for n in range(vc)],
            axis=-1,
        )
        img = np.flip(img, axis=1)  # reference flips along width (:135)
        out = img.transpose(2, 0, 1)  # [vc, H, W]
        return _np_fft2(out, self.fft_centered, self.fft_normalization, dims).astype(np.complex64, copy=False)


class ZeroFilling(_Transform):
    """Symmetric zero-padding to a target spatial size (reference :478-590)."""

    def __init__(
        self,
        zero_filling_size: Tuple[int, int],
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        spatial_dims: Sequence[int] = (-2, -1),
    ):
        self.zero_filling_size = zero_filling_size
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.spatial_dims = spatial_dims

    def __call__(self, data, apply_backward_transform=False, apply_forward_transform=False):
        if is_none(data) or np.ndim(data) <= 1:
            return data
        data = self._maybe_to_image(data, apply_backward_transform)
        if apply_forward_transform:
            data = _np_fft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))

        pad_h = abs(int(self.zero_filling_size[0]) - data.shape[-2]) // 2
        pad_w = abs(int(self.zero_filling_size[1]) - data.shape[-1]) // 2
        pads = [(0, 0)] * (data.ndim - 2) + [(pad_h, pad_h), (pad_w, pad_w)]
        data = np.pad(data, pads, mode="constant")

        data = self._maybe_to_kspace(data, apply_backward_transform)
        if apply_forward_transform:
            data = _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        return data


class Cropper(_Transform):
    """Center crop, optionally hopping to image domain first (reference :591-716)."""

    def __init__(
        self,
        cropping_size: Tuple[int, int],
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        spatial_dims: Sequence[int] = (-2, -1),
    ):
        self.cropping_size = tuple(int(x) for x in cropping_size)
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.spatial_dims = spatial_dims

    def __call__(self, data, apply_backward_transform=False, apply_forward_transform=False):
        if is_none(data):
            return data
        if isinstance(data, list):
            return [self(d, apply_backward_transform, apply_forward_transform) for d in data]
        if np.ndim(data) <= 1:
            return data
        data = self._maybe_to_image(data, apply_backward_transform)
        if apply_forward_transform:
            data = _np_fft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))

        data = _center_crop(data, self.cropping_size)

        data = self._maybe_to_kspace(data, apply_backward_transform)
        if apply_forward_transform:
            data = _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        return data


class Masker:
    """Applies (or generates) the undersampling mask(s) (reference :717-952).

    Returns ``(masked_data, masks, accelerations)`` as lists over acceleration
    choices. Masks are ``[1, h, w]`` (2D masks) or ``[1, 1, w]`` (1D masks)
    float32 arrays broadcastable against ``[coils, h, w]`` k-space.
    """

    def __init__(
        self,
        mask_func=None,
        spatial_dims: Sequence[int] = (-2, -1),
        shift_mask: bool = False,
        half_scan_percentage: float = 0.0,
        center_scale: float = 0.02,
        dimensionality: int = 2,
        remask: bool = True,
    ):
        self.mask_func = mask_func
        self.spatial_dims = spatial_dims
        self.shift_mask = shift_mask
        self.half_scan_percentage = half_scan_percentage
        self.center_scale = center_scale
        self.dimensionality = dimensionality
        self.remask = remask

    def _finish_mask(self, m: np.ndarray, padding) -> np.ndarray:
        m = np.asarray(m, dtype=np.float32)
        # generator layout [1, (h), w, 1] -> drop trailing complex axis
        if m.ndim >= 3 and m.shape[-1] == 1:
            m = m[..., 0]
        while m.ndim < 3:
            m = m[None]
        if padding is not None and not is_none(padding[0]) and padding[0] != 0:
            m[..., : int(padding[0])] = 0
            m[..., int(padding[1]) :] = 0
        if self.shift_mask:
            m = np.fft.fftshift(m, axes=(-2, -1))
        return m

    def __call__(self, data: np.ndarray, mask=None, padding=None, seed=None):
        # precomputed mask(s)?
        if mask is not None and isinstance(mask, list) and len(mask) == 0:
            mask = None
        if mask is not None and not isinstance(mask, list) and np.ndim(mask) == 0:
            mask = None

        if mask is not None:
            masks_in = mask if isinstance(mask, list) else [mask]
            masked_data, masks, accs = [], [], []
            for m in masks_in:
                m = self._finish_mask(m, padding)
                masked_data.append((data * m).astype(np.complex64, copy=False))
                masks.append(m)
                accs.append(float(m.sum() / m.size))  # reference convention (:860)
            return masked_data, masks, accs

        if self.mask_func is None:
            return [data], [np.ones((1,) + data.shape[-2:], np.float32)], [1.0]

        mask_funcs = self.mask_func if isinstance(self.mask_func, list) else [self.mask_func]
        masked_data, masks, accs = [], [], []
        for mf in mask_funcs:
            if self.dimensionality == 3 and data.ndim >= 4:
                # per-slice masks over the leading slice axis; remask=False
                # reuses the first slice's mask (reference Masker :889-933)
                slice_masks, slice_masked, slice_accs = [], [], []
                m = None
                for j in range(data.shape[0]):
                    if m is None or self.remask:
                        shape = np.array(data[j].shape + (2,))
                        shape[:-3] = 1
                        m_raw, acc = mf(
                            shape, seed, half_scan_percentage=self.half_scan_percentage, scale=self.center_scale
                        )
                        m = self._finish_mask(np.asarray(m_raw), padding)
                    slice_masked.append((data[j] * m).astype(np.complex64, copy=False))
                    slice_masks.append(m)
                    slice_accs.append(acc)
                masked_data.append(np.stack(slice_masked, 0))
                masks.append(np.stack(slice_masks, 0))
                accs.append(float(np.mean(slice_accs)))
                continue
            shape = np.array(data.shape + (2,))
            shape[:-3] = 1
            m, acc = mf(
                shape, seed, half_scan_percentage=self.half_scan_percentage, scale=self.center_scale
            )
            m = self._finish_mask(np.asarray(m), padding)
            masked_data.append((data * m).astype(np.complex64, copy=False))
            masks.append(m)
            accs.append(acc)
        return masked_data, masks, accs


class SSDU:
    """Self-supervised data undersampling mask split (reference :953-1263).

    Splits the sampling mask into disjoint train/loss masks by gaussian or
    uniform selection of sampled points (keeping a small ACS block in the train
    mask).
    """

    def __init__(
        self,
        mask_type: str = "Gaussian",
        rho: float = 0.4,
        acs_block_size: Sequence[int] = (4, 4),
        gaussian_std_scaling_factor: float = 4.0,
        outer_kspace_fraction: float = 0.0,
        export_and_reuse_masks: bool = False,
        rng: Optional[np.random.RandomState] = None,
    ):
        if mask_type not in ("Gaussian", "Uniform"):
            raise ValueError(f"SSDU mask type {mask_type} is not supported.")
        self.mask_type = mask_type
        self.rho = rho
        self.acs_block_size = acs_block_size
        self.gaussian_std_scaling_factor = gaussian_std_scaling_factor
        self.outer_kspace_fraction = outer_kspace_fraction
        self.export_and_reuse_masks = export_and_reuse_masks
        self.rng = rng or np.random.RandomState()

    def _mask_path(self, fname: str):
        import os

        base = fname.replace(".h5", ".npy") if ".h5" in fname else fname + ".npy"
        root = os.environ.get("MRIDC_SSDU_MASK_DIR") or os.path.join(os.path.expanduser("~"), "tmp")
        return Path(root) / base

    def __call__(self, mask2d: np.ndarray, fname: str = "") -> Tuple[np.ndarray, np.ndarray]:
        mask2d = np.asarray(mask2d, np.float32)
        if self.export_and_reuse_masks and fname:
            # reference :1020-1045: first draw is exported, later epochs reuse
            # the identical (train, loss) split for the same file
            path = self._mask_path(fname)
            if path.exists():
                masks = np.load(path)
                if masks.shape[-2:] == mask2d.shape[-2:]:
                    return masks[0].astype(np.float32, copy=False), masks[1].astype(np.float32, copy=False)
        sel = self._gaussian(mask2d) if self.mask_type == "Gaussian" else self._uniform(mask2d)
        train_mask = np.where(mask2d == 1, 1 - sel, mask2d)
        loss_mask = np.where(mask2d == 1, sel, mask2d)
        if self.outer_kspace_fraction > 0:
            for m in (train_mask, loss_mask):
                k = int(m.shape[1] * self.outer_kspace_fraction)
                m[:, :k] = 1
                m[:, m.shape[1] - k :] = 1
        train_mask = train_mask.astype(np.float32, copy=False)
        loss_mask = loss_mask.astype(np.float32, copy=False)
        if self.export_and_reuse_masks and fname:
            path = self._mask_path(fname)
            path.parent.mkdir(parents=True, exist_ok=True)
            np.save(path, np.stack([train_mask, loss_mask], 0))
        return train_mask, loss_mask

    def _acs_zeroed(self, mask2d):
        nrow, ncol = mask2d.shape
        cx, cy = nrow // 2, ncol // 2
        tmp = mask2d.copy()
        tmp[
            cx - self.acs_block_size[0] // 2 : cx + self.acs_block_size[0] // 2,
            cy - self.acs_block_size[1] // 2 : cy + self.acs_block_size[1] // 2,
        ] = 0
        return tmp

    def _gaussian(self, mask2d):
        nrow, ncol = mask2d.shape
        cx, cy = nrow // 2, ncol // 2
        tmp = self._acs_zeroed(mask2d)
        sel = np.zeros_like(mask2d)
        total = int(np.ceil(mask2d.sum() * self.rho))
        count = 0
        # rejection sampling of gaussian-located sampled points (reference :1129)
        max_iters = 100 * total + 1000
        it = 0
        while count <= total and it < max_iters:
            it += 1
            ix = int(round(self.rng.normal(loc=cx, scale=(nrow - 1) / self.gaussian_std_scaling_factor)))
            iy = int(round(self.rng.normal(loc=cy, scale=(ncol - 1) / self.gaussian_std_scaling_factor)))
            if 0 <= ix < nrow and 0 <= iy < ncol and tmp[ix, iy] == 1 and sel[ix, iy] != 1:
                sel[ix, iy] = 1
                count += 1
        return sel

    def _uniform(self, mask2d):
        # NOTE reference inconsistency preserved (transforms.py:1155-1173 +
        # forward :1027-1035): the uniform branch returns the COMPLEMENT of the
        # drawn points, so here loss ends up with the (1-rho) remainder and
        # train with the rho draw + ACS — inverted relative to the Gaussian
        # branch. We mirror the behavior for parity.
        tmp = self._acs_zeroed(mask2d).ravel()
        num_valid = int(tmp.sum())
        n_drop = int(self.rho * num_valid)
        sel = tmp.copy()
        if num_valid > 0 and n_drop > 0:
            candidates = np.flatnonzero(tmp)
            chosen = self.rng.choice(candidates, size=min(n_drop, len(candidates)), replace=False)
            sel[chosen] = 0
        return sel.reshape(mask2d.shape)


class N2R:
    """Noise-to-Reconstruction noise mask generation (reference :1264-1408)."""

    def __init__(
        self,
        probability: float = 0.0,
        std_devs: Tuple[float, float] = (0.0, 0.0),
        rhos: Tuple[float, float] = (0.0, 0.0),
        use_mask: bool = True,
        rng: Optional[np.random.RandomState] = None,
    ):
        self.probability = probability
        self.std_devs = std_devs
        self.rhos = rhos
        self.use_mask = use_mask
        self.rng = rng or np.random.RandomState()

    def __call__(self, data: np.ndarray, mask: np.ndarray) -> np.ndarray:
        mask2d = np.asarray(mask, np.float32)
        mask2d = np.squeeze(mask2d)
        if mask2d.ndim == 1:
            mask2d = np.tile(mask2d[None, :], (data.shape[-2], 1))
        elif mask2d.shape[0] == 1:
            mask2d = np.tile(mask2d, (data.shape[-2], 1))

        _rand = float(self.rng.rand())
        if _rand >= self.probability:
            return np.ones((1,) + mask2d.shape, np.float32)

        rho = self._rand_range(*self.rhos) if (self.rhos and self.rhos[0] != 0 and self.rhos[1] != 0) else None
        m = np.ones_like(mask2d) if not self.use_mask else mask2d.copy()

        std = self._rand_range(*self.std_devs)
        noise = std * (self.rng.randn(*mask2d.shape) + 1j * self.rng.randn(*mask2d.shape))

        if rho is not None and rho != 1:
            flat = m.ravel()
            valid = np.flatnonzero(flat)
            n_zero = int((1 - rho) * len(valid))
            if n_zero > 0:
                flat[self.rng.choice(valid, size=n_zero, replace=False)] = 0
            m = flat.reshape(m.shape)

        return np.abs(noise * m).astype(np.float32, copy=False)[None]

    def _rand_range(self, low, high):
        if low > high:
            low, high = high, low
        if high - low == 0:
            return low
        return float(low + (high - low) * self.rng.rand())


class Normalizer(_Transform):
    """max / mean-std / minmax normalization with attrs capture (reference :1409-1546)."""

    def __init__(
        self,
        normalization_type: Optional[str] = None,
        kspace_normalization: bool = False,
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        spatial_dims: Sequence[int] = (-2, -1),
    ):
        self.normalization_type = normalization_type
        self.kspace_normalization = kspace_normalization
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.spatial_dims = spatial_dims

    @property
    def enabled(self) -> bool:
        return not is_none(self.normalization_type)

    def __call__(self, data, apply_backward_transform=False, apply_forward_transform=False):
        if is_none(data):
            return data, None
        if isinstance(data, list):
            out = [self(d, apply_backward_transform, apply_forward_transform) for d in data]
            return [o[0] for o in out], [o[1] for o in out]
        if np.ndim(data) <= 1:
            return data, None
        if np.mean(data) == 1:  # all-ones (auto-init sens maps): reference skips
            return data, None
        return self.forward(data, apply_backward_transform, apply_forward_transform)

    def forward(self, data, apply_backward_transform=False, apply_forward_transform=False):
        if self.kspace_normalization and apply_backward_transform:
            apply_backward_transform = False

        if apply_backward_transform:
            data = _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        elif apply_forward_transform:
            data = _np_fft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))

        mag = np.abs(data)
        attrs = {
            "max": float(mag.max()),
            "mean": float(mag.mean()),
            "std": float(mag.std()),
            "min": float(mag.min()),
        }

        if self.normalization_type == "max":
            data = data / max(attrs["max"], 1e-12)
        elif self.normalization_type == "mean":
            data = (data - attrs["mean"]) / max(attrs["std"], 1e-12)
        elif self.normalization_type == "minmax":
            data = (data - attrs["min"]) / max(attrs["max"] - attrs["min"], 1e-12)
        elif not is_none(self.normalization_type):
            raise ValueError(f"Unknown normalization type {self.normalization_type!r}")

        if apply_backward_transform:
            data = _np_fft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        elif apply_forward_transform:
            data = _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))

        return data.astype(np.complex64, copy=False) if np.iscomplexobj(data) else data.astype(np.float32, copy=False), attrs

    def backward_with_image(self, data):
        """K-space normalization via image-domain stats that also RETURNS the
        normalized zero-filled coil image when one is computed anyway.

        Returns ``(k_norm, attrs, img_norm | None)``. Host-FFT saver for the
        per-sample pipeline (the 1-core axon host is loader-bound): for the
        scaling-only type (``max``) the k-space result is ``data * scale``
        directly — scaling commutes with the linear FFT, so skipping the
        ifft/scale/fft roundtrip is mathematically exact (and strictly closer
        to the true value than the old roundtrip; fp diff ~1e-7). Shift types
        (mean/minmax) keep the roundtrip but still hand the image out so
        ``_initialize_prediction`` can skip its own ifft2."""
        if not self.enabled or is_none(data):
            return data, None, None
        if isinstance(data, list):
            outs = [self.backward_with_image(d) for d in data]
            return [o[0] for o in outs], [o[1] for o in outs], [o[2] for o in outs]
        if np.ndim(data) <= 1 or np.mean(data) == 1:
            return data, None, None
        if self.kspace_normalization:
            d, v = self.forward(data)  # stats computed in k-space, no image
            return d, v, None
        img = _np_ifft2(data, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        mag = np.abs(img)
        attrs = {
            "max": float(mag.max()),
            "mean": float(mag.mean()),
            "std": float(mag.std()),
            "min": float(mag.min()),
        }
        if self.normalization_type == "max":
            scale = 1.0 / max(attrs["max"], 1e-12)
            return (data * scale).astype(np.complex64, copy=False), attrs, (img * scale).astype(np.complex64, copy=False)
        if self.normalization_type == "mean":
            img_n = (img - attrs["mean"]) / max(attrs["std"], 1e-12)
        elif self.normalization_type == "minmax":
            img_n = (img - attrs["min"]) / max(attrs["max"] - attrs["min"], 1e-12)
        else:
            raise ValueError(f"Unknown normalization type {self.normalization_type!r}")
        img_n = img_n.astype(np.complex64, copy=False)
        k = _np_fft2(img_n, self.fft_centered, self.fft_normalization, tuple(self.spatial_dims))
        return k.astype(np.complex64, copy=False), attrs, img_n


class Composer:
    """Chains transforms, skipping Nones (reference :1547-1596)."""

    def __init__(self, transforms):
        self.transforms = [t for t in (transforms or []) if t is not None]

    def __call__(self, data, apply_backward_transform=False, apply_forward_transform=False):
        for t in self.transforms:
            data = t(data, apply_backward_transform, apply_forward_transform)
        return data


class MRIDataTransforms:
    """The canonical preprocessing orchestrator (reference :1597-2506).

    ``__call__(kspace, sensitivity_map, mask, prediction, target, attrs,
    fname, slice_idx)`` returns the 10-tuple
    ``(kspace, masked_kspace, sensitivity_map, mask, prediction, target,
    fname, slice_idx, acc, attrs)``.

    All arrays native complex64, coil axis 0 (2D) / 1 (3D).
    """

    def __init__(
        self,
        # prewhitening
        apply_prewhitening: bool = False,
        find_patch_size: bool = True,
        prewhitening_scale_factor: float = 1.0,
        prewhitening_patch_start: int = 10,
        prewhitening_patch_length: int = 30,
        # coil compression
        apply_gcc: bool = False,
        gcc_virtual_coils: int = 10,
        gcc_calib_lines: int = 24,
        gcc_align_data: bool = True,
        # zero filling / cropping
        kspace_zero_filling_size: Optional[Tuple[int, int]] = None,
        crop_size: Optional[Tuple[int, int]] = None,
        kspace_crop: bool = False,
        crop_before_masking: bool = True,
        # masking
        mask_func=None,
        shift_mask: bool = False,
        mask_center_scale: float = 0.02,
        half_scan_percentage: float = 0.0,
        remask: bool = False,
        # ssdu
        ssdu: bool = False,
        ssdu_mask_type: str = "Gaussian",
        ssdu_rho: float = 0.4,
        ssdu_acs_block_size: Sequence[int] = (4, 4),
        ssdu_gaussian_std_scaling_factor: float = 4.0,
        ssdu_outer_kspace_fraction: float = 0.0,
        ssdu_export_and_reuse_masks: bool = False,
        # n2r
        n2r: bool = False,
        n2r_supervised_rate: float = 0.0,
        n2r_probability: float = 0.0,
        n2r_std_devs: Tuple[float, float] = (0.0, 0.0),
        n2r_rhos: Tuple[float, float] = (0.0, 0.0),
        n2r_use_mask: bool = False,
        # normalization
        normalize_inputs: bool = True,
        normalization_type: str = "max",
        kspace_normalization: bool = False,
        # fft / layout
        fft_centered: bool = False,
        fft_normalization: str = "backward",
        spatial_dims: Sequence[int] = (-2, -1),
        coil_dim: int = 0,
        coil_combination_method: str = "SENSE",
        dimensionality: int = 2,
        consecutive_slices: int = 1,
        use_seed: bool = True,
    ):
        self.fft_centered = fft_centered
        self.fft_normalization = fft_normalization
        self.spatial_dims = tuple(spatial_dims)
        self.coil_dim = coil_dim
        self.coil_combination_method = coil_combination_method.upper()
        self.dimensionality = dimensionality
        self.consecutive_slices = consecutive_slices
        self.use_seed = use_seed
        self.kspace_crop = kspace_crop
        self.crop_before_masking = crop_before_masking
        self.shift_mask = shift_mask
        # per-THREAD ZF-image cache: one MRIDataTransforms instance is shared
        # by OrderedWorkerMap worker threads (loaders.py num_workers>0); an
        # instance-level list would race resets/appends across threads and
        # silently miss under exactly the threaded config the bench uses
        import threading

        self._tls = threading.local()

        common = dict(
            fft_centered=fft_centered, fft_normalization=fft_normalization, spatial_dims=spatial_dims
        )
        self.prewhitening = (
            NoisePreWhitening(
                find_patch_size=find_patch_size,
                patch_size=[
                    prewhitening_patch_start,
                    prewhitening_patch_length + prewhitening_patch_start,
                    prewhitening_patch_start,
                    prewhitening_patch_length + prewhitening_patch_start,
                ],
                scale_factor=prewhitening_scale_factor,
                **common,
            )
            if apply_prewhitening
            else None
        )
        self.gcc = (
            GeometricDecompositionCoilCompression(
                virtual_coils=gcc_virtual_coils,
                calib_lines=gcc_calib_lines,
                align_data=gcc_align_data,
                **common,
            )
            if apply_gcc
            else None
        )
        self.kspace_zero_filling = (
            ZeroFilling(zero_filling_size=kspace_zero_filling_size, **common)
            if kspace_zero_filling_size is not None and not is_none(kspace_zero_filling_size)
            else None
        )
        self.coils_shape_transforms = Composer([self.gcc, self.kspace_zero_filling])

        self.masking = Masker(
            mask_func=mask_func,
            spatial_dims=spatial_dims,
            shift_mask=shift_mask,
            half_scan_percentage=half_scan_percentage,
            center_scale=mask_center_scale,
            dimensionality=dimensionality,
            remask=remask,
        )

        self.ssdu = ssdu
        self.ssdu_masking = (
            SSDU(
                mask_type=ssdu_mask_type,
                rho=ssdu_rho,
                acs_block_size=ssdu_acs_block_size,
                gaussian_std_scaling_factor=ssdu_gaussian_std_scaling_factor,
                outer_kspace_fraction=ssdu_outer_kspace_fraction,
                export_and_reuse_masks=ssdu_export_and_reuse_masks,
            )
            if ssdu
            else None
        )

        self.n2r = n2r
        self.n2r_supervised_rate = n2r_supervised_rate
        self.n2r_masking = (
            N2R(probability=n2r_probability, std_devs=n2r_std_devs, rhos=n2r_rhos, use_mask=n2r_use_mask)
            if n2r
            else None
        )

        self.cropping = (
            Cropper(cropping_size=crop_size, **common)
            if crop_size is not None and not is_none(crop_size)
            else None
        )
        self.normalization = Normalizer(
            normalization_type=normalization_type if normalize_inputs else None,
            kspace_normalization=kspace_normalization,
            **common,
        )

    # -- helpers -----------------------------------------------------------

    def _zf_recon(self, kspace: np.ndarray) -> np.ndarray:
        """Zero-filled coil image (reference init_reconstructor = ZF).

        Checks the per-sample cache populated by ``_normalize_kspace`` first:
        the normalizer's backward pass already computed ifft2 of this exact
        array object, so matching by identity reuses it (the 1-vCPU axon host
        is FFT-bound; this halves the per-slice host FFT count). Identity
        matching is self-invalidating — every transform stage replaces arrays
        rather than mutating them, so a stale entry simply never matches."""
        for ref, img in getattr(self._tls, "zf_cache", ()):
            if kspace is ref:
                return img
        img = _np_ifft2(kspace, self.fft_centered, self.fft_normalization, self.spatial_dims)
        return img  # combination applied by caller with sensitivity maps

    def _normalize_kspace(self, data):
        """Backward-normalize k-space, caching the ZF coil image it computes."""
        out, vars_, img = self.normalization.backward_with_image(data)
        cache = getattr(self._tls, "zf_cache", None)
        if cache is None:
            cache = self._tls.zf_cache = []
        if isinstance(out, list):
            for o, im in zip(out, img):
                if im is not None:
                    cache.append((o, im))
        elif img is not None:
            cache.append((out, img))
        return out, vars_

    def _coil_combine(self, img: np.ndarray, sens: np.ndarray) -> np.ndarray:
        if self.coil_combination_method == "SENSE" and sens is not None and sens.size:
            return (img * np.conj(sens)).sum(axis=self.coil_dim)
        return np.sqrt((np.abs(img) ** 2).sum(axis=self.coil_dim)).astype(np.complex64, copy=False)

    def _crop(self, x, forward=None):
        if self.cropping is None or x is None:
            return x
        return self.cropping(x, apply_forward_transform=self.kspace_crop)

    def _initialize_prediction(self, prediction, kspace, sensitivity_map):
        """ZF-initialise a coil-combined image per k-space entry (reference :2328-2393)."""
        if prediction is not None and np.ndim(prediction) >= 2:
            pred = np.asarray(prediction).astype(np.complex64, copy=False)
            pred = self._crop(pred)
            pred, vars_ = self.normalization(pred, apply_forward_transform=self.kspace_crop)
            return pred, vars_
        if isinstance(kspace, list):
            preds, vars_ = [], []
            for y in kspace:
                p = self._coil_combine(self._zf_recon(y), sensitivity_map)
                p = self._crop(p)
                p, v = self.normalization(p, apply_forward_transform=self.kspace_crop)
                preds.append(p)
                vars_.append(v)
            return preds, vars_
        p = self._coil_combine(self._zf_recon(kspace), sensitivity_map)
        p = self._crop(p)
        p, v = self.normalization(p, apply_forward_transform=self.kspace_crop)
        return p, v

    # -- main --------------------------------------------------------------

    def __call__(
        self,
        kspace: np.ndarray,
        sensitivity_map: Optional[np.ndarray],
        mask,
        prediction: Optional[np.ndarray],
        target: Optional[np.ndarray],
        attrs: Dict,
        fname: str,
        slice_idx: int,
    ):
        attrs = dict(attrs or {})
        self._tls.zf_cache = []
        kspace, masked_kspace, mask, kvars, acc = self._process_kspace(kspace, mask, attrs, fname)
        sensitivity_map, svars = self._process_sens(sensitivity_map, kspace)

        if self.n2r and isinstance(masked_kspace, list) and len(masked_kspace) > 1 and isinstance(masked_kspace[1], (list, np.ndarray)):
            prediction, pvars = self._initialize_prediction(prediction, masked_kspace[0], sensitivity_map)
            noise_prediction, nvars = self._initialize_prediction(None, masked_kspace[1], sensitivity_map)
            prediction = [prediction, noise_prediction]
        else:
            prediction, pvars = self._initialize_prediction(prediction, masked_kspace, sensitivity_map)
            nvars = None

        target, tvars = self._initialize_prediction(None if self.ssdu else target, kspace, sensitivity_map)
        # per-acceleration targets stay a list — the loader selects target[r]
        # together with the input (reference nn/base.py:337-340)

        attrs.update(self._parse_norm_vars(kvars, svars, pvars, nvars, tvars))
        attrs.setdefault("n2r_supervised", False)

        return (kspace, masked_kspace, sensitivity_map, mask, prediction, target, fname, slice_idx, acc, attrs)

    def _process_kspace(self, kspace, mask, attrs, fname):
        kspace = np.asarray(kspace).astype(np.complex64, copy=False)
        if kspace.ndim == 2:  # singlecoil -> add coil axis
            kspace = kspace[None]

        kspace = self.coils_shape_transforms(kspace, apply_backward_transform=True)
        if self.prewhitening is not None:
            kspace = self.prewhitening(kspace)

        if self.cropping is not None and self.crop_before_masking:
            kspace = self.cropping(kspace, apply_backward_transform=not self.kspace_crop)

        padding = (attrs.get("padding_left", 0), attrs.get("padding_right", 0))
        seed = getattr(self, "_seed_override", None)
        if seed is None:
            seed = tuple(map(ord, fname)) if self.use_seed else None
        masked_kspace, mask, acc = self.masking(kspace, mask, padding, seed)

        if self.cropping is not None and not self.crop_before_masking:
            masked_kspace = self.cropping(masked_kspace, apply_backward_transform=not self.kspace_crop)
            mask = [_center_crop(np.asarray(m), self.cropping.cropping_size) if np.asarray(m).shape[-1] >= self.cropping.cropping_size[-1] else m for m in mask]
            kspace = self.cropping(kspace, apply_backward_transform=not self.kspace_crop)

        init_masked_kspace = list(masked_kspace)
        init_mask = list(mask)

        if self.normalization.enabled:
            kspace, kvars = self._normalize_kspace(kspace)
            masked_kspace, mkvars = self._normalize_kspace(masked_kspace)
        else:
            kvars, mkvars = None, None

        if self.ssdu:
            kspace, masked_kspace, mask = self._apply_ssdu(kspace, masked_kspace, mask, fname)

        n2rvars = None
        if self.n2r and (not attrs.get("n2r_supervised", False) or self.ssdu):
            n2r_masked, n2r_mask = self._apply_n2r(init_masked_kspace, init_mask)
            if self.normalization.enabled:
                n2r_masked, n2rvars = self._normalize_kspace(n2r_masked)
            if self.ssdu:
                # reference transforms.py:2076-2104: with ssdu+n2r the model
                # input reverts to the ORIGINAL undersampled kspace and
                # sampling mask; the ssdu split remains only as the loss mask
                restored = init_masked_kspace
                if self.normalization.enabled:
                    restored, mkvars = self._normalize_kspace(restored)
                masked_kspace = restored
                new_mask = []
                for i, m in enumerate(mask):
                    im = np.asarray(init_mask[i], np.float32)
                    if im.ndim != np.asarray(m[0]).ndim:
                        im = im.reshape(np.asarray(m[0]).shape)
                    new_mask.append([im, m[1]])
                mask = new_mask
            masked_kspace = [masked_kspace, n2r_masked]
            mask = [mask, n2r_mask]

        pre_norm = {
            "kspace_pre_normalization_vars": kvars,
            "masked_kspace_pre_normalization_vars": mkvars,
            "noise_masked_kspace_pre_normalization_vars": n2rvars,
        }
        return kspace, masked_kspace, mask, pre_norm, acc

    def _apply_ssdu(self, kspace, masked_kspace, mask, fname):
        """Split each mask into disjoint (train, loss) masks; train mask gates the
        input, loss mask gates the target k-space (reference :2156-2292)."""
        kspaces, masked_out, masks_out = [], [], []
        for i, m in enumerate(mask):
            m2d = np.squeeze(np.asarray(m))
            is_1d = m2d.ndim == 1
            if is_1d:
                m2d = np.tile(m2d[None, :], (kspace.shape[-2], 1))
            if self.shift_mask:
                m2d = np.fft.fftshift(m2d, axes=(-2, -1))
            train_mask, loss_mask = self.ssdu_masking(m2d, fname)
            if self.shift_mask:
                train_mask = np.fft.fftshift(train_mask, axes=(0, 1))
                loss_mask = np.fft.fftshift(loss_mask, axes=(0, 1))
            train_mask = train_mask[None]
            loss_mask = loss_mask[None]
            kspaces.append((kspace * loss_mask).astype(np.complex64, copy=False))
            masked_out.append((masked_kspace[i] * train_mask).astype(np.complex64, copy=False))
            masks_out.append([train_mask, loss_mask])
        kspace = kspaces if len(kspaces) > 1 else kspaces[0]
        return kspace, masked_out, masks_out

    def _apply_n2r(self, masked_kspace_list, mask_list):
        n2r_masked, n2r_masks = [], []
        for mk, m in zip(masked_kspace_list, mask_list):
            nm = self.n2r_masking(mk, m)
            n2r_masks.append(nm)
            n2r_masked.append((mk * nm).astype(np.complex64, copy=False))
        return n2r_masked, n2r_masks

    def _process_sens(self, sensitivity_map, kspace):
        ref = kspace[0] if isinstance(kspace, list) else kspace
        if sensitivity_map is not None and np.size(sensitivity_map):
            s = np.asarray(sensitivity_map).astype(np.complex64, copy=False)
        else:
            s = np.ones_like(ref)
        s = self.coils_shape_transforms(s, apply_forward_transform=True)
        if self.cropping is not None:
            s = self.cropping(s, apply_forward_transform=self.kspace_crop)
        svars = None
        if self.normalization.enabled:
            s, svars = self.normalization(s, apply_forward_transform=self.kspace_crop)
        return s, svars

    @staticmethod
    def _flatten_vars(prefix: str, vars_) -> Dict:
        out = {}
        if vars_ is None:
            return out
        if isinstance(vars_, list):
            for i, v in enumerate(vars_):
                if v is not None:
                    for k in ("min", "max", "mean", "std"):
                        out[f"{prefix}_{k}_{i}"] = v[k]
        else:
            for k in ("min", "max", "mean", "std"):
                out[f"{prefix}_{k}"] = vars_[k]
        return out

    def _parse_norm_vars(self, kvars, svars, pvars, nvars, tvars) -> Dict:
        out = {}
        out.update(self._flatten_vars("kspace", kvars.get("kspace_pre_normalization_vars")))
        out.update(self._flatten_vars("masked_kspace", kvars.get("masked_kspace_pre_normalization_vars")))
        out.update(
            self._flatten_vars("noise_masked_kspace", kvars.get("noise_masked_kspace_pre_normalization_vars"))
        )
        out.update(self._flatten_vars("sensitivity_maps", svars))
        out.update(self._flatten_vars("prediction", pvars))
        out.update(self._flatten_vars("noise_prediction", nvars))
        out.update(self._flatten_vars("target", tvars))
        return out

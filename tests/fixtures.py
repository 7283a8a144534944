"""Synthetic fastMRI-style dataset fixture.

Plays the role of the reference's mock-data generator
(reference: tests/collections/reconstruction/fastmri/create_temp_data.py:10-104):
writes real h5 volumes with random complex kspace, RSS targets and smooth coil
sensitivities, so the full loader->transform->model path runs without real data.
"""

from pathlib import Path

import h5py
import numpy as np


def make_phantom_volume(rng, slices=3, coils=4, h=64, w=64):
    """Smooth phantom + synthetic coil sensitivities -> (kspace, sens, rss)."""
    yy, xx = np.mgrid[:h, :w]
    img = np.zeros((slices, h, w), np.complex64)
    for s in range(slices):
        cx, cy = h / 2 + 3 * s, w / 2 - 2 * s
        img[s] = (
            np.exp(-(((yy - cx) ** 2 + (xx - cy) ** 2) / (0.08 * h * w)))
            + 0.5 * np.exp(-(((yy - cx / 2) ** 2 + (xx - cy / 2) ** 2) / (0.02 * h * w)))
        ).astype(np.complex64)
    phases = [np.exp(1j * 2 * np.pi * (c * xx / w + c * yy / (2 * h))) for c in range(coils)]
    mags = [np.exp(-(((yy - h * (c + 1) / (coils + 1)) ** 2) / (h * w))) + 0.5 for c in range(coils)]
    sens = np.stack([m * p for m, p in zip(mags, phases)]).astype(np.complex64)
    sens = sens / np.sqrt((np.abs(sens) ** 2).sum(0, keepdims=True))
    coil_imgs = img[:, None] * sens[None]
    coil_imgs = coil_imgs + 0.01 * (
        rng.standard_normal(coil_imgs.shape) + 1j * rng.standard_normal(coil_imgs.shape)
    ).astype(np.complex64)
    kspace = np.fft.fftshift(
        np.fft.fftn(np.fft.ifftshift(coil_imgs, axes=(-2, -1)), axes=(-2, -1), norm="ortho"),
        axes=(-2, -1),
    ).astype(np.complex64)
    rss = np.sqrt((np.abs(coil_imgs) ** 2).sum(1)).astype(np.float32)
    return kspace, np.tile(sens[None], (slices, 1, 1, 1)), rss


def create_dataset(
    root: Path, n_files=2, slices=3, coils=4, h=64, w=64, with_sens=True, seed=0, with_segmentation=False, classes=2
):
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    files = []
    for i in range(n_files):
        kspace, sens, rss = make_phantom_volume(rng, slices, coils, h, w)
        fname = root / f"file_{i}.h5"
        with h5py.File(fname, "w") as hf:
            hf.create_dataset("kspace", data=kspace)
            if with_sens:
                hf.create_dataset("sensitivity_map", data=sens)
            hf.create_dataset("reconstruction_rss", data=rss)
            if with_segmentation:
                # classes from thresholding the phantom magnitude
                labels = (rss > 0.5 * rss.max()).astype(np.int64)
                if classes > 2:
                    labels += (rss > 0.8 * rss.max()).astype(np.int64)
                seg = np.eye(max(classes, 2), dtype=np.float32)[labels]  # [S, H, W, C]
                hf.create_dataset("segmentation", data=np.moveaxis(seg, -1, 1))  # [S, C, H, W]
            hf.attrs["max"] = float(rss.max())
            hf.attrs["norm"] = float(np.linalg.norm(rss))
        files.append(fname)
    return files


def create_qmri_dataset(root, n_files=1, slices=2, echoes=4, coils=2, h=32, w=32, seed=0):
    """AHEAD-like multi-echo fixture: kspace [S, E, C, H, W], brain mask, map targets."""
    root = Path(root)
    root.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    tes = np.array([3.0, 11.5, 20.0, 28.5][:echoes])
    files = []
    for i in range(n_files):
        yy, xx = np.mgrid[:h, :w]
        r2s = 20 + 15 * np.exp(-((yy - h / 2) ** 2 + (xx - w / 2) ** 2) / (0.1 * h * w))
        s0 = 1.0 + 0.5 * np.exp(-((yy - h / 3) ** 2 + (xx - w / 3) ** 2) / (0.1 * h * w))
        b0 = 10.0 * np.ones((h, w))
        sens = np.stack([np.exp(1j * 2 * np.pi * c * xx / w) for c in range(coils)]).astype(np.complex64)
        sens /= np.sqrt((np.abs(sens) ** 2).sum(0, keepdims=True))
        kspace = np.zeros((slices, echoes, coils, h, w), np.complex64)
        for s in range(slices):
            for e, te in enumerate(tes):
                img = s0 * np.exp(-te * 1e-3 * r2s) * np.exp(-1j * te * 1e-3 * b0)
                coil_imgs = img[None] * sens
                kspace[s, e] = np.fft.fftshift(
                    np.fft.fftn(np.fft.ifftshift(coil_imgs, axes=(-2, -1)), axes=(-2, -1), norm="ortho"),
                    axes=(-2, -1),
                )
        fname = root / f"qfile_{i}.h5"
        with h5py.File(fname, "w") as hf:
            hf.create_dataset("kspace", data=kspace)
            hf.create_dataset("sensitivity_map", data=np.tile(sens[None], (slices, 1, 1, 1)))
            hf.create_dataset("mask_brain", data=np.ones((slices, h, w), np.float32))
            hf.create_dataset("R2star_map_target", data=np.tile(r2s[None], (slices, 1, 1)).astype(np.float32))
            hf.create_dataset("S0_map_target", data=np.tile(s0[None], (slices, 1, 1)).astype(np.float32))
            hf.create_dataset("B0_map_target", data=np.tile(b0[None], (slices, 1, 1)).astype(np.float32))
            hf.create_dataset("phi_map_target", data=np.zeros((slices, h, w), np.float32))
            hf.attrs["TEs"] = tes
        files.append(fname)
    return files

"""Dataloader factory from reference-style ``train_ds``/``validation_ds``/``test_ds``
config blocks (reference: mridc/collections/reconstruction/nn/base.py:985-1090
``_setup_dataloader_from_config``: create_masker -> Dataset(transform=...) ->
DataLoader)."""

from __future__ import annotations

from typing import Dict, Optional

from mridc_tpu.data.loaders import BatchLoader, ReconstructionMRIDataset
from mridc_tpu.data.subsample import create_masker
from mridc_tpu.data.transforms import MRIDataTransforms


def is_none(x) -> bool:
    return x is None or str(x).lower() == "none"


def transform_kwargs(ds_cfg: Dict, model_cfg: Optional[Dict] = None) -> Dict:
    """The full MRIDataTransforms kwargs a dataset config implies — shared by
    the reconstruction loader and the task pipelines (multitask wraps these
    in RSMRIDataTransforms) so every ds_cfg knob applies identically."""
    model_cfg = model_cfg or {}
    mask_args = ds_cfg.get("mask_args") or {}
    mask_func = None
    if not is_none(mask_args.get("type")):
        accelerations = mask_args.get("accelerations", [4])
        center_fractions = mask_args.get("center_fractions", [0.08])
        # one masker per acceleration when lists are given (reference base.py:1013-1024)
        if isinstance(accelerations, (list, tuple)) and len(accelerations) > 1:
            mask_func = [
                create_masker(mask_args["type"], [cf], [acc])
                for cf, acc in zip(center_fractions, accelerations)
            ]
        else:
            mask_func = [create_masker(mask_args["type"], center_fractions, accelerations)]

    crop_size = ds_cfg.get("crop_size")
    if is_none(crop_size):
        crop_size = None
    zf_size = ds_cfg.get("kspace_zero_filling_size")
    if is_none(zf_size):
        zf_size = None

    return dict(
        apply_prewhitening=ds_cfg.get("apply_prewhitening", False),
        apply_gcc=ds_cfg.get("apply_gcc", False),
        gcc_virtual_coils=ds_cfg.get("gcc_virtual_coils", 10),
        gcc_calib_lines=ds_cfg.get("gcc_calib_lines", 24),
        gcc_align_data=ds_cfg.get("gcc_align_data", True),
        kspace_zero_filling_size=zf_size,
        crop_size=crop_size,
        kspace_crop=ds_cfg.get("kspace_crop", False),
        crop_before_masking=ds_cfg.get("crop_before_masking", True),
        mask_func=mask_func,
        shift_mask=mask_args.get("shift_mask", ds_cfg.get("shift_mask", False)),
        mask_center_scale=mask_args.get("scale", 0.02),
        half_scan_percentage=ds_cfg.get("half_scan_percentage", 0.0),
        remask=ds_cfg.get("remask", False),
        ssdu=ds_cfg.get("ssdu", False),
        ssdu_mask_type=ds_cfg.get("ssdu_mask_type", "Gaussian"),
        ssdu_rho=ds_cfg.get("ssdu_rho", 0.4),
        ssdu_acs_block_size=tuple(ds_cfg.get("ssdu_acs_block_size", (4, 4))),
        ssdu_gaussian_std_scaling_factor=ds_cfg.get("ssdu_gaussian_std_scaling_factor", 4.0),
        ssdu_outer_kspace_fraction=ds_cfg.get("ssdu_outer_kspace_fraction", 0.0),
        n2r=ds_cfg.get("n2r", False),
        n2r_supervised_rate=ds_cfg.get("n2r_supervised_rate", 0.0),
        n2r_probability=ds_cfg.get("n2r_probability", 0.0),
        n2r_std_devs=tuple(ds_cfg.get("n2r_std_devs", (0.0, 0.0))),
        n2r_rhos=tuple(ds_cfg.get("n2r_rhos", (0.0, 0.0))),
        n2r_use_mask=ds_cfg.get("n2r_use_mask", False),
        normalize_inputs=ds_cfg.get("normalize_inputs", True),
        normalization_type="max" if ds_cfg.get("max_norm", True) else ds_cfg.get("normalization_type", "max"),
        kspace_normalization=ds_cfg.get("kspace_normalization", False),
        fft_centered=ds_cfg.get("fft_centered", model_cfg.get("fft_centered", False)),
        fft_normalization=ds_cfg.get("fft_normalization", model_cfg.get("fft_normalization", "backward")),
        spatial_dims=tuple(ds_cfg.get("spatial_dims", (-2, -1))),
        coil_combination_method=str(
            ds_cfg.get("coil_combination_method", model_cfg.get("coil_combination_method", "SENSE"))
        ),
        dimensionality=ds_cfg.get("dimensionality", 2),
        # per-sample arrays have no batch axis: the reference shifts the
        # configured (batch-level) coil_dim down for 2D (transforms.py:1757)
        coil_dim=(
            ds_cfg.get("coil_dim", model_cfg.get("coil_dim", 1)) - 1
            if ds_cfg.get("dimensionality", 2) == 2
            else ds_cfg.get("coil_dim", model_cfg.get("coil_dim", 1))
        ),
        consecutive_slices=ds_cfg.get("consecutive_slices", 1),
        use_seed=ds_cfg.get("use_seed", True),
    )


def build_transforms(ds_cfg: Dict, model_cfg: Optional[Dict] = None) -> MRIDataTransforms:
    return MRIDataTransforms(**transform_kwargs(ds_cfg, model_cfg))


def maybe_cache_dataset(dataset, ds_cfg: Dict):
    """Wrap ``dataset`` in a host-side transformed-sample cache when the
    config asks for one (``cache_dataset: memory|disk``) and the transform is
    per-sample deterministic (otherwise warn and skip — caching would freeze
    per-epoch randomness)."""
    mode = str(ds_cfg.get("cache_dataset", "none") or "none").lower()
    if mode in ("none", "false", "0"):
        return dataset
    from mridc_tpu.data.cache import CachedDataset, transform_is_epoch_deterministic

    if not transform_is_epoch_deterministic(getattr(dataset, "transform", None)):
        import logging

        logging.getLogger("mridc_tpu").warning(
            "cache_dataset=%s ignored: the transform is not epoch-deterministic "
            "(use_seed off, or unseeded SSDU/N2R randomness)", mode
        )
        return dataset
    return CachedDataset(dataset, mode=mode, cache_dir=ds_cfg.get("cache_dir"))


def maybe_device_cache(loader, ds_cfg: Dict, exclude=()):
    """Wrap ``loader`` in the HBM-resident dataset cache when configured
    (``device_cache_dataset: true``) and batches are epoch-static."""
    if not ds_cfg.get("device_cache_dataset", False):
        return loader
    from mridc_tpu.data.cache import DeviceDatasetCache, loader_is_epoch_static

    if not loader_is_epoch_static(loader):
        import logging

        logging.getLogger("mridc_tpu").warning(
            "device_cache_dataset ignored: batches are not epoch-static "
            "(non-deterministic transform or per-epoch acceleration selection)"
        )
        return loader
    if getattr(loader, "process_count", 1) > 1:
        import logging

        logging.getLogger("mridc_tpu").warning(
            "device_cache_dataset under multi-host: residents are sized for the "
            "FULL dataset on every host (only this host's shard is ever gathered); "
            "lower device_cache_bytes if per-host HBM is tight"
        )
    return DeviceDatasetCache(
        loader, exclude=exclude, max_bytes=ds_cfg.get("device_cache_bytes")
    )


def build_dataloader(ds_cfg: Dict, model_cfg: Optional[Dict] = None, shuffle: Optional[bool] = None) -> BatchLoader:
    tfm = build_transforms(ds_cfg, model_cfg)
    dataset = ReconstructionMRIDataset(
        root=ds_cfg["data_path"],
        coil_sensitivity_maps_root=None if is_none(ds_cfg.get("sense_path")) else ds_cfg.get("sense_path"),
        mask_root=None if is_none(ds_cfg.get("mask_path")) else ds_cfg.get("mask_path"),
        dataset_format=ds_cfg.get("dataset_format"),
        sample_rate=ds_cfg.get("sample_rate"),
        volume_sample_rate=ds_cfg.get("volume_sample_rate"),
        num_cols=None if is_none(ds_cfg.get("num_cols")) else tuple(ds_cfg.get("num_cols")),
        consecutive_slices=ds_cfg.get("consecutive_slices", 1),
        data_saved_per_slice=ds_cfg.get("data_saved_per_slice", False),
        n2r_supervised_rate=ds_cfg.get("n2r_supervised_rate", 0.0) if ds_cfg.get("n2r", False) else 0.0,
        transform=tfm,
    )
    dataset = maybe_cache_dataset(dataset, ds_cfg)
    pad_shape = ds_cfg.get("pad_shape")
    loader = BatchLoader(
        dataset,
        batch_size=ds_cfg.get("batch_size", 1),
        shuffle=ds_cfg.get("shuffle", False) if shuffle is None else shuffle,
        seed=ds_cfg.get("seed", 0),
        pad_shape=tuple(pad_shape) if pad_shape else None,
        drop_last=ds_cfg.get("drop_last", False),
        num_workers=int(ds_cfg.get("num_workers", 0) or 0),
        transfer_dtype=ds_cfg.get("transfer_dtype"),
    )
    # the recon Trainer never consumes batch['kspace'] on device (trainer.py
    # uses masked_kspace/sens/mask/target/init_pred only) — shipping it
    # through device_prefetch (or keeping it HBM-resident) would double
    # transferred/resident bytes for nothing (round-4 advisor finding)
    loader = maybe_prefetch(loader, ds_cfg, device_keys=RECON_DEVICE_PREFETCH_KEYS)
    return maybe_device_cache(loader, ds_cfg, exclude=("kspace",))


def async_loader(make, ds_cfg: Dict):
    """Single home for the async-loading policy: construct the loader with the
    ds_cfg worker-thread count and wrap it in the background prefetcher when
    configured (used by every task's loader builder in launch.py)."""
    loader = make(num_workers=int(ds_cfg.get("num_workers", 0) or 0))
    return maybe_prefetch(loader, ds_cfg)


# device-prefetch key set for the reconstruction task: everything the recon
# Trainer actually puts on device ('kspace' deliberately excluded, see
# build_dataloader)
RECON_DEVICE_PREFETCH_KEYS = (
    "masked_kspace",
    "sensitivity_maps",
    "target",
    "initial_prediction",
    "n2r_masked_kspace",
)


def maybe_prefetch(loader, ds_cfg: Dict, device_keys=None):
    """Wrap ``loader`` in the async stages the config asks for.

    ``prefetch_batches`` (host-side batch building ahead of the step) is the
    explicit knob; reference configs that set ``num_workers`` (torch
    DataLoader semantics, reconstruction/nn/base.py:1083-1090) imply async
    loading, so they get the default depth too. ``device_prefetch: true``
    additionally ships the heavy array leaves to the device ahead of the
    step (flax prefetch_to_device analogue — overlaps the host->device
    transfer with device compute). ``device_prefetch_keys`` in the ds config
    overrides which leaves are shipped (per-task trainers consume different
    subsets; shipping unused leaves wastes transfer-bound links).
    """
    depth = ds_cfg.get("prefetch_batches")
    if depth is None:
        depth = 2 if int(ds_cfg.get("num_workers", 0) or 0) > 0 else 0
    depth = int(depth)
    if depth > 0:
        from mridc_tpu.data.prefetch import Prefetcher

        loader = Prefetcher(loader, depth=depth)
    if ds_cfg.get("device_prefetch", False):
        from mridc_tpu.data.prefetch import DEVICE_PREFETCH_KEYS, DevicePrefetcher

        keys = ds_cfg.get("device_prefetch_keys", device_keys)
        if keys is None:
            keys = DEVICE_PREFETCH_KEYS
        loader = DevicePrefetcher(loader, depth=max(depth, 1) if depth else 2, keys=tuple(keys))
    return loader

"""TPU-native MRI physics primitives: FFTs, complex algebra, coil combination, masking."""

from mridc_tpu.ops.complex import (
    coil_combination,
    complex_abs,
    complex_abs_sq,
    from_real_view,
    rss,
    rss_complex,
    sense,
    to_numpy_complex,
    to_real_view,
)
from mridc_tpu.ops.fft import fft2, fft2c, fftshift, ifft2, ifft2c, ifftshift
from mridc_tpu.ops.masking import (
    apply_mask,
    batched_mask_center,
    center_crop,
    center_crop_to_smallest,
    mask_center,
)

__all__ = [
    "coil_combination",
    "complex_abs",
    "complex_abs_sq",
    "from_real_view",
    "rss",
    "rss_complex",
    "sense",
    "to_numpy_complex",
    "to_real_view",
    "fft2",
    "fft2c",
    "fftshift",
    "ifft2",
    "ifft2c",
    "ifftshift",
    "apply_mask",
    "batched_mask_center",
    "center_crop",
    "center_crop_to_smallest",
    "mask_center",
]

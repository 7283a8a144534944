"""mridc_tpu — a TPU-native (JAX/XLA/Pallas) framework for AI-based MRI analysis.

Re-implements the capabilities of wdika/mridc (accelerated reconstruction,
quantitative mapping, segmentation, multitask learning) with a TPU-first
architecture: native complex64 arrays, XLA FFTs, `lax.scan` unrolls, explicit
`jax.sharding.Mesh` data parallelism, optax optimizers and orbax checkpoints.

Layout conventions (differ from the reference by design):
  - complex data is stored as native ``complex64`` arrays ``[batch, coils, h, w]``
    instead of real-view ``[..., 2]`` tensors (reference:
    mridc/collections/common/parts/fft.py uses torch.view_as_complex round-trips).
  - convolutions run in NHWC with real/imag stacked into channels, feeding the
    TPU MXU directly.
"""

__version__ = "0.1.0"

'''DNNCancerAnnotator-TPU: a TPU-native (JAX/XLA/Pallas/pjit) prostate-MRI cancer
segmentation framework.

Re-implements the full capability surface of the reference pipeline
(yoshihikoueno/DNNCancerAnnotator) with a TPU-first architecture:

- Flax models (UNet / MulmoUNet / MultiResUNet families) in NHWC, bf16 compute.
- A jit-compiled data-parallel training engine over a ``jax.sharding.Mesh``
  (XLA collectives over ICI replace the reference's NCCL MirroredStrategy).
- Device-side jitted augmentation (crop / flip / contrast / thin-plate-spline warp).
- Region-based evaluation metrics built on a jit-compatible connected-components
  labeling and MXU-friendly matmul IoU.
- TFRecord-wire-compatible IO (pure Python codec + optional C++ fast path) and a
  dependency-free TensorBoard event writer.
'''

__version__ = '0.1.0'

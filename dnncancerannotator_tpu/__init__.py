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


def _enable_compilation_cache():
    '''Persistent XLA compilation cache: cold CLI invocations skip recompiles
    (cold compiles through the remote TPU toolchain run minutes).
    Opt out with DNNCA_NO_COMPILE_CACHE=1.'''
    import os
    if os.environ.get('DNNCA_NO_COMPILE_CACHE'):
        return
    try:
        import jax
        # key by platform selection: CPU and TPU processes must not share
        # AOT entries (cross-machine CPU features can SIGILL)
        platform = os.environ.get('JAX_PLATFORMS', 'default').replace(',', '-')
        cache_dir = os.environ.get(
            'JAX_COMPILATION_CACHE_DIR',
            os.path.join(os.path.expanduser('~'), '.cache',
                         f'dnnca_jax_{platform}'))
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update('jax_compilation_cache_dir', cache_dir)
        jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
    except Exception:  # never block import on cache setup
        pass


_enable_compilation_cache()

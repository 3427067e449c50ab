'''Model registry.

The engine resolves models by name from config (parity with reference
``getattr(tf_models, model_name)`` at annotator/engine.py:268).
'''

from .unet import UNet, UNetAnnotator, MulmoUNet, MulmoUNetAnnotator
from .multiresunet import MultiResUnet, MultiResBlock, ResPath
from . import blocks

_REGISTRY = {
    'UNetAnnotator': UNetAnnotator,
    'MulmoUNetAnnotator': MulmoUNetAnnotator,
    'MultiResUnet': MultiResUnet,
}


def get_model(name):
    '''Resolve a model class by its config name.'''
    if name not in _REGISTRY:
        raise KeyError(
            f'Unknown model {name!r}. Available: {sorted(_REGISTRY)}')
    return _REGISTRY[name]


def build_model(name, model_options, dtype=None):
    '''Instantiate a model module from config options.

    ``kernel_regularizer`` is popped and returned separately: in JAX the
    regularization term is added to the loss by the engine rather than being
    attached to layers.
    '''
    options = dict(model_options or {})
    regularizer = options.pop('kernel_regularizer', None)
    cls = get_model(name)
    if dtype is not None:
        options.setdefault('dtype', dtype)
    # accepted for config parity but handled engine-side / unused
    if cls is MultiResUnet:
        options.pop('kernel_regularizer', None)
    try:
        model = cls(**options)
    except TypeError:
        # models that do not declare kernel_regularizer as a field
        options.pop('kernel_regularizer', None)
        model = cls(**options)
    return model, regularizer

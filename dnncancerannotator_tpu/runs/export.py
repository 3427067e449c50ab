'''Serving export: package a trained model as a portable AOT artifact.

The reference has no deployment story beyond loading Keras checkpoints in
the same codebase (annotator/engine.py:358-377 ``load``); this driver
adds the TPU-native one: ``jax.export`` serializes the *jitted inference
computation* (StableHLO) with the trained weights baked in as constants,
so a serving process needs only ``jax`` — no Flax, no model zoo, no
config stack — and replays byte-identical math on any supported backend
(export targets both 'tpu' and 'cpu' by default).

The exported function maps raw feature slices (uint8, [B, H, W, C-1] —
the label channel excluded, same layout the predict driver feeds) to
sigmoid probability maps [B, H, W, 1], including the /255 normalization.
The batch dimension is symbolic by default, so one artifact serves any
batch size.

Artifact layout: ``<out>.shlo`` (serialized jax.export bytes) plus
``<out>.yaml`` (input spec + provenance: checkpoint step, model name).
'''

import logging
import os

import numpy as np

from .. import engine as engine_lib
from ..ops import gates
from ..utils import config as config_lib

logger = logging.getLogger(__name__)


def _build_infer_fn(model, state, has_bn):
    import jax
    import jax.numpy as jnp

    variables = {'params': state['params']}
    if has_bn:
        variables['batch_stats'] = state['batch_stats']
    # weights ride as closure constants -> baked into the artifact
    variables = jax.tree.map(np.asarray, variables)

    def infer(features):
        x = features.astype(jnp.float32) / 255.0
        logits = model.apply(variables, x, training=False, return_logits=True)
        return jax.nn.sigmoid(logits)

    return infer


def export_model(
    save_path,
    output_path,
    config=None,
    batch_size=None,
    platforms=('tpu', 'cpu'),
):
    '''
    Export the latest checkpoint as a self-contained serving artifact.

    Args:
        save_path: training run directory (options.yaml + checkpoints)
        output_path: artifact path; writes <output_path>.shlo and .yaml
        config (list[str]): extra configuration overlays
        batch_size (int): fix the batch dimension; default exports a
            symbolic batch (one artifact, any batch size)
        platforms (list[str]): lowering targets (default tpu+cpu)

    Returns:
        path of the written .shlo artifact.
    '''
    import jax
    from jax import export as jexport
    import yaml

    saved_config = os.path.join(save_path, 'options.yaml')
    saved_config = config_lib.load_config(saved_config)['config']
    if config:
        saved_config = config_lib.apply_config(
            saved_config, config_lib.load_config(config))

    eval_opts = saved_config['data_options']['eval']
    slice_types = tuple(eval_opts.get(
        'slice_types',
        ('TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label')))
    h, w = eval_opts.get('output_size', (512, 512))
    n_features = len(slice_types) - 1

    eng = engine_lib.Engine(saved_config)
    eng.build((batch_size or 1, int(h), int(w), n_features), abstract=True)
    ckpts = eng.get_ckpts(os.path.join(save_path, 'checkpoints'))
    assert ckpts, f'no checkpoints under {save_path}'
    step = max(ckpts)
    eng.load(ckpts[step])

    state = jax.tree.map(np.asarray, eng.state)
    infer = _build_infer_fn(eng.model, state, eng._has_bn)

    if batch_size:
        bdim = int(batch_size)
    else:
        bdim = jexport.symbolic_shape('b')[0]
    spec = jax.ShapeDtypeStruct((bdim, int(h), int(w), n_features),
                                np.uint8)
    # Force every Pallas kernel gate off for the export trace: the
    # artifact must lower for ALL requested platforms, and a captured
    # Mosaic (TPU) kernel makes the CPU lowering unloadable
    # ("Only interpret mode is supported on CPU backend").
    with gates.pure_xla():
        exported = jexport.export(
            jax.jit(infer), platforms=list(platforms))(spec)

    shlo_path = f'{output_path}.shlo'
    os.makedirs(os.path.dirname(os.path.abspath(shlo_path)), exist_ok=True)
    with open(shlo_path, 'wb') as f:
        f.write(exported.serialize())
    meta = dict(
        input=dict(shape=[-1 if not batch_size else int(batch_size),
                          int(h), int(w), n_features],
                   dtype='uint8',
                   slice_types=list(slice_types[:-1])),
        output=dict(shape=[-1 if not batch_size else int(batch_size),
                           int(h), int(w), 1],
                    dtype='float32', semantics='sigmoid probability'),
        model=saved_config['model'],
        checkpoint_step=int(step),
        platforms=list(platforms),
        jax_version=jax.__version__,
    )
    with open(f'{output_path}.yaml', 'w') as f:
        yaml.safe_dump(meta, f)
    logger.info('Exported step-%d %s to %s (%d bytes)', step,
                saved_config['model'], shlo_path,
                os.path.getsize(shlo_path))
    return shlo_path


def load_exported(path):
    '''Load a ``.shlo`` artifact as a callable ``fn(features_uint8) ->
    probs_f32`` (pure jax; no framework imports needed).'''
    from jax import export as jexport
    with open(path, 'rb') as f:
        exported = jexport.deserialize(f.read())
    return exported.call

'''One-batch gradient diagnostic: same weights, same batch, both
frameworks — compare loss and per-layer gradient norms to localize any
training-dynamics divergence.

TF side:  TF_USE_LEGACY_KERAS=1 PYTHONPATH=shims:/root/reference \
          python graddiag.py tf --npz weights.npz --size 256
JAX side: python graddiag.py jax --npz weights.npz --size 256
Each prints one JSON line {loss, grad_global_norm, grad_last_conv_norm}.
'''

import argparse
import json
import os
import sys

import numpy as np


def cmd_tf(args):
    os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from refside import _patch_keras2, _load_config  # noqa: E402
    import tensorflow as tf
    from annotator import engine

    npz = np.load(args.npz)
    cfg = _load_config(args.size)
    m = engine.TFKerasModel(cfg)
    x = npz['batch_x']
    m.model.build(tf.TensorShape([None, *x.shape[1:]]))

    # load the dumped weights back (inverse of refside.cmd_dump)
    n_down = cfg['model_options']['n_downsample']
    mm = m.model
    for lvl in range(n_down):
        convs = [l for l in mm.unet.encoder.downsamples[lvl].convchain.layers
                 if l.weights]
        for j, conv in enumerate(convs):
            conv.set_weights([npz[f'enc{lvl}_conv{j}_kernel'],
                              npz[f'enc{lvl}_conv{j}_bias']])
    for lvl in range(n_down):
        up = mm.unet.decoder.upsamples[lvl]
        k = npz[f'dec{lvl}_tconv_kernel']
        up.conv_transpose.set_weights(
            [k[::-1, ::-1].transpose(0, 1, 3, 2), npz[f'dec{lvl}_tconv_bias']])
        convs = [l for l in up.convchain.layers if l.weights]
        for j, conv in enumerate(convs):
            conv.set_weights([npz[f'dec{lvl}_conv{j}_kernel'],
                              npz[f'dec{lvl}_conv{j}_bias']])
    mm.last_conv.set_weights([npz['last_conv_kernel'], npz['last_conv_bias']])

    y = npz['batch_y']
    loss_obj = mm.loss if not isinstance(mm.loss, dict) else mm.loss
    with tf.GradientTape() as tape:
        pred = mm(tf.constant(x), training=True)
        loss = tf.reduce_mean(loss_obj(tf.constant(y), pred))
    grads = tape.gradient(loss, mm.trainable_variables)
    flat = [tf.reshape(g, [-1]) for g in grads if g is not None]
    gnorm = float(tf.norm(tf.concat(flat, 0)))
    lc = None
    for v, g in zip(mm.trainable_variables, grads):
        if 'last_conv' in v.name or v.shape.as_list() == list(
                npz['last_conv_kernel'].shape):
            lc = float(tf.norm(g)) if g is not None else -1.0
            break
    print(json.dumps({'side': 'tf', 'loss': float(loss),
                      'grad_global_norm': gnorm,
                      'grad_last_conv_norm': lc,
                      'n_grads': len(flat)}))


def cmd_jax(args):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
    import jax
    import jax.numpy as jnp
    from jaxside import _config_stack, _size_overlay, _params_from_npz
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.utils import config as config_lib
    import tempfile

    npz = np.load(args.npz)
    with tempfile.TemporaryDirectory() as td:
        cfg = config_lib.load_config(_config_stack(_size_overlay(td, args.size)))
    eng = engine_lib.Engine(cfg)
    x = jnp.asarray(npz['batch_x'])
    eng.build((1, *x.shape[1:]))
    params = jax.tree_util.tree_map(lambda v: v, eng.state['params'])
    params = _params_from_npz(npz, params)
    y = jnp.asarray(npz['batch_y'])
    loss_obj = eng.loss

    def loss_fn(p):
        logits = eng.model.apply({'params': p}, x, training=True,
                                 return_logits=True)
        return jnp.mean(loss_obj.per_sample(y, logits))

    loss, grads = jax.value_and_grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    gnorm = float(jnp.linalg.norm(
        jnp.concatenate([jnp.ravel(g) for g in leaves])))
    lc = float(jnp.linalg.norm(grads['last_conv']['kernel']))
    print(json.dumps({'side': 'jax', 'loss': float(loss),
                      'grad_global_norm': gnorm,
                      'grad_last_conv_norm': lc,
                      'n_grads': len(leaves)}))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='side', required=True)
    for name, fn in (('tf', cmd_tf), ('jax', cmd_jax)):
        sp = sub.add_parser(name)
        sp.add_argument('--npz', required=True)
        sp.add_argument('--size', type=int, default=256)
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == '__main__':
    main()

'''TF-reference side of the head-to-head parity run.

Runs the reference code at /root/reference verbatim (model, loss, data
pipeline, metric suite — reference annotator/engine.py:100-137 train,
139-210 eval) in this image, via the shims documented in shims/README.md.
Must be invoked with:

    TF_USE_LEGACY_KERAS=1 PYTHONPATH=tools/parity/shims:/root/reference

Phases (``python refside.py <phase> ...``):
    train  --data ... --save ... --steps N --freq K [--size S]
    eval   --data ... --save ... [--size S]   -> <save>/results.csv
    dump   --save ... --out weights.npz       -> final-ckpt weights + a
           fixed eval batch's inputs/probabilities for the cross-framework
           float check
'''

import argparse
import json
import os
import sys

os.environ.setdefault('TF_USE_LEGACY_KERAS', '1')

import numpy as np


def _patch_keras2():
    '''Coerce non-bool ``trainable`` in Layer.__init__ (see shims/README).'''
    import tensorflow as tf

    layer_cls = tf.keras.layers.Layer
    orig = layer_cls.__init__

    def patched(self, trainable=True, *args, **kwargs):
        if not isinstance(trainable, bool):
            trainable = True
        orig(self, trainable, *args, **kwargs)

    layer_cls.__init__ = patched


_patch_keras2()

CONFIG_DIR = '/root/reference/configs'


def _config_stack(size, metrics=False):
    stack = [
        f'{CONFIG_DIR}/unet.yaml',
        f'{CONFIG_DIR}/additionals/data_options.yaml',
        f'{CONFIG_DIR}/additionals/deploy_options.yaml',
        f'{CONFIG_DIR}/additionals/augment_options_nowarp.yaml',
    ]
    if metrics:
        stack.append(f'{CONFIG_DIR}/additionals/metrics.yaml')
    return stack


def _load_config(size, metrics=False):
    from annotator.utils import load
    cfg = load.load_config(_config_stack(size, metrics))
    for split in ('train', 'eval'):
        cfg['data_options'][split]['output_size'] = [size, size]
    return cfg


def load_npz_weights(model, npz, n_down):
    '''Load a flax-layout weights npz (refside.cmd_dump / jaxside.initdump
    key schema) into the built reference Keras model.'''
    for lvl in range(n_down):
        convs = [l for l in model.unet.encoder.downsamples[lvl]
                 .convchain.layers if l.weights]
        for j, conv in enumerate(convs):
            conv.set_weights([npz[f'enc{lvl}_conv{j}_kernel'],
                              npz[f'enc{lvl}_conv{j}_bias']])
    for lvl in range(n_down):
        up = model.unet.decoder.upsamples[lvl]
        k = npz[f'dec{lvl}_tconv_kernel']
        up.conv_transpose.set_weights(
            [k[::-1, ::-1].transpose(0, 1, 3, 2),
             npz[f'dec{lvl}_tconv_bias']])
        convs = [l for l in up.convchain.layers if l.weights]
        for j, conv in enumerate(convs):
            conv.set_weights([npz[f'dec{lvl}_conv{j}_kernel'],
                              npz[f'dec{lvl}_conv{j}_bias']])
    model.last_conv.set_weights([npz['last_conv_kernel'],
                                 npz['last_conv_bias']])


def cmd_train(args):
    from annotator import data, engine
    from annotator.utils import dump

    cfg = _load_config(args.size)
    tf_seed(args.seed)
    dump.dump_options(
        os.path.join(args.save, 'options.yaml'), avoid_overwrite=True,
        config=cfg, save_path=args.save, data_path=list(args.data))
    ds = data.train_ds(list(args.data), **cfg['data_options']['train'])
    model = engine.TFKerasModel(cfg)
    if getattr(args, 'init_npz', None):
        # shared-init mode: start from the exact same weights the JAX side
        # initializes with, eliminating init path-dependence from the
        # head-to-head (both frameworks' dynamics were verified equal by
        # tools/parity/graddiag.py)
        model.model.build(ds.element_spec[0].shape)
        load_npz_weights(model.model, np.load(args.init_npz),
                         cfg['model_options']['n_downsample'])
        # the reference's Decoder.build appends to self.upsamples each
        # call and TFKerasModel.train build()s unconditionally — a second
        # build would duplicate the decoder; neutralize it (model is built)
        model.model.build = lambda *a, **k: None
    model.train(ds, save_path=args.save, max_steps=args.steps,
                save_freq=args.freq)
    print(json.dumps({'phase': 'tf-train', 'steps': args.steps}))


def tf_seed(seed):
    import tensorflow as tf
    tf.random.set_seed(seed)
    np.random.seed(seed)


def cmd_eval(args):
    '''Per-checkpoint evaluation with the metrics.yaml suite.

    The numerics are the reference's (compiled metric objects, reference
    utils/metrics.py via model.evaluate); only the CSV assembly is local —
    the reference's own eval loop uses the pandas<2 ``DataFrame.append``
    API (engine.py:203) which no longer exists in this image.
    '''
    import pandas as pd
    from annotator import data, engine
    from annotator.utils import metrics as ref_metrics

    # Dormant reference bug, fatal under tf_keras 2.21 (which str()s
    # metrics via get_config): FBetaScore.get_config reads a
    # ``resize_factor`` attribute that only the region metrics define
    # (reference utils/metrics.py:75). Class default keeps get_config
    # total without changing any metric math.
    ref_metrics.FBetaScore.resize_factor = None

    cfg = _load_config(args.size, metrics=True)
    model = engine.TFKerasModel(cfg)
    ds = data.eval_ds(list(args.data), **cfg['data_options']['eval'])
    model.model.build(ds.element_spec[0].shape)
    ckpts = model.get_ckpts(os.path.join(args.save, 'checkpoints'))
    rows = {}
    for step, ckpt_path in ckpts.items():
        model.model.load_weights(ckpt_path)
        rows[step] = model.model.evaluate(ds, verbose=0, return_dict=True)
        print('ckpt', step, {k: round(float(v), 4)
                             for k, v in rows[step].items()})
    frame = pd.DataFrame.from_dict(rows, orient='index')
    frame.index.rename('step', inplace=True)
    out = os.path.join(args.save, 'results.csv')
    frame.to_csv(out)
    print(json.dumps({'phase': 'tf-eval', 'results': out}))


def cmd_dump(args):
    '''Dump final-checkpoint weights (flax-layout) + one eval batch.'''
    from annotator import data, engine

    cfg = _load_config(args.size)
    model = engine.TFKerasModel(cfg)
    ds = data.eval_ds(list(args.data), **cfg['data_options']['eval'])
    model.model.build(ds.element_spec[0].shape)
    ckpts = model.get_ckpts(os.path.join(args.save, 'checkpoints'))
    step = max(ckpts.keys())
    model.model.load_weights(ckpts[step])

    n_down = cfg['model_options']['n_downsample']
    out = {'step': np.asarray(step)}
    m = model.model
    for lvl in range(n_down):
        convs = [l for l in m.unet.encoder.downsamples[lvl].convchain.layers
                 if l.weights]
        for j, conv in enumerate(convs):
            k, b = conv.get_weights()
            out[f'enc{lvl}_conv{j}_kernel'] = k
            out[f'enc{lvl}_conv{j}_bias'] = b
    for lvl in range(n_down):
        up = m.unet.decoder.upsamples[lvl]
        k, b = up.conv_transpose.get_weights()
        # keras tconv kernels are [kh, kw, out, in] and spatially flipped
        # relative to lax.conv_transpose (tests/test_tf_parity.py:83-86);
        # store in our HWIO convention
        out[f'dec{lvl}_tconv_kernel'] = k[::-1, ::-1].transpose(0, 1, 3, 2)
        out[f'dec{lvl}_tconv_bias'] = b
        convs = [l for l in up.convchain.layers if l.weights]
        for j, conv in enumerate(convs):
            k, b = conv.get_weights()
            out[f'dec{lvl}_conv{j}_kernel'] = k
            out[f'dec{lvl}_conv{j}_bias'] = b
    k, b = m.last_conv.get_weights()
    out['last_conv_kernel'] = k
    out['last_conv_bias'] = b

    # one deterministic eval batch: features, labels, reference probs
    feats, labels = next(iter(ds))
    probs = m(feats, training=False)
    out['batch_x'] = feats.numpy()
    out['batch_y'] = labels.numpy()
    out['batch_probs'] = np.asarray(probs)
    np.savez(args.out, **out)
    print(json.dumps({'phase': 'tf-dump', 'step': int(step),
                      'out': args.out}))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='phase', required=True)
    for name, fn in (('train', cmd_train), ('eval', cmd_eval),
                     ('dump', cmd_dump)):
        sp = sub.add_parser(name)
        sp.add_argument('--data', nargs='+', required=name != 'dump')
        sp.add_argument('--save', required=True)
        sp.add_argument('--size', type=int, default=256)
        sp.add_argument('--seed', type=int, default=0)
        if name == 'train':
            sp.add_argument('--steps', type=int, required=True)
            sp.add_argument('--freq', type=int, required=True)
            sp.add_argument('--init-npz', dest='init_npz', default=None)
        if name == 'dump':
            sp.add_argument('--out', required=True)
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == '__main__':
    sys.exit(main())

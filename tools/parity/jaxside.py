'''JAX/TPU side of the head-to-head parity run + report assembly.

Phases (``python tools/parity/jaxside.py <phase> ...``):
    data    --out DIR --size S           build synthetic train/val tfrecords
    train   --data ... --save ... --steps N --freq K --size S
    eval    --data ... --save ... --size S   -> results.csv via runs.evaluate
    xeval   --npz weights.npz --data ... --save ... --size S
            load the TF-trained weights into our model, evaluate with OUR
            evaluator -> results.csv, plus a forward float-diff on the
            dumped TF batch (run under JAX CPU for the strict f32 bound)
    report  --out DIR                        -> PARITY_RUN.md
'''

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..'))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..', '..',
                                'tests'))

CONFIG_DIR = os.path.join(os.path.dirname(__file__), '..', '..', 'configs')


def _config_stack(size_overlay, metrics=False):
    stack = [
        f'{CONFIG_DIR}/unet.yaml',
        f'{CONFIG_DIR}/additionals/data_options.yaml',
        f'{CONFIG_DIR}/additionals/deploy_options.yaml',
        f'{CONFIG_DIR}/additionals/augment_options_nowarp.yaml',
    ]
    if metrics:
        stack.append(f'{CONFIG_DIR}/additionals/metrics.yaml')
    stack.append(size_overlay)
    return stack


def _size_overlay(out_dir, size):
    path = os.path.join(out_dir, f'size_{size}.yaml')
    with open(path, 'w') as f:
        f.write(f'data_options.train.output_size: [{size}, {size}]\n')
        f.write(f'data_options.eval.output_size: [{size}, {size}]\n')
    return path


def _eval_overlay(out_dir, size):
    '''Single overlay with metrics + size as dotted keys: evaluate()'s
    overlay list is pre-merged by load_config, which expands dotted keys —
    a plain nested ``data_options`` key would then REPLACE the recorded
    section wholesale (reference apply_config semantics).'''
    import yaml
    with open(f'{CONFIG_DIR}/additionals/metrics.yaml') as f:
        overlay = yaml.safe_load(f)
    overlay['data_options.eval.output_size'] = [size, size]
    path = os.path.join(out_dir, f'eval_overlay_{size}.yaml')
    with open(path, 'w') as f:
        yaml.safe_dump(overlay, f)
    return path


def cmd_data(args):
    '''Exams are written at the production 512² size — the reference's
    ``base()`` center-crops to 512 with no pad (data.py:196-203) and
    asserts on smaller sources. Lesions are confined to the central
    region that survives the 512 -> output_size center crop, with 16-32 px
    radii (robust to the metric suite's 0.5 resize + 5 px opening).
    '''
    from util_synth import make_exam_tree, SLICE_TYPES
    from dnncancerannotator_tpu.data import generate_tfrecords

    exam = 512
    margin = max(40, (exam - args.size) // 2 + 40)
    os.makedirs(args.out, exist_ok=True)
    for split, n_patients, seed in (('train', 4, 0), ('val', 2, 7)):
        tree = os.path.join(args.out, f'tree_{split}')
        make_exam_tree(tree, n_patients=n_patients, n_slices=6,
                       size=exam, seed=seed,
                       center_box=(margin, exam - margin),
                       r_range=(16, 32))
        for category in ('cancer', 'healthy'):
            out = os.path.join(args.out, f'{split}_{category}.tfrecords')
            generate_tfrecords(tree, out, category=category,
                               slice_types=SLICE_TYPES,
                               output_size=(exam, exam))
    print(json.dumps({'phase': 'data', 'out': args.out}))


def cmd_initdump(args):
    '''Dump the deterministic seed-0 initial weights of our model in the
    shared npz schema. jax-train regenerates the identical init (same seed,
    same PRNG), and refside train --init-npz loads this into the Keras
    model — both frameworks then train from the exact same point.'''
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.utils import config as config_lib

    os.makedirs(os.path.dirname(args.out) or '.', exist_ok=True)
    overlay = _size_overlay(os.path.dirname(args.out), args.size)
    cfg = config_lib.load_config(_config_stack(overlay))
    eng = engine_lib.Engine(cfg)
    eng.build((1, args.size, args.size, 5))
    params = eng.state['params']
    out = {'step': np.asarray(0)}
    unet = params['unet']
    n_down = len([k for k in unet['encoder'] if k.startswith('down_')])
    for lvl in range(n_down):
        chain = unet['encoder'][f'down_{lvl}']['convchain']
        for j in range(2):
            out[f'enc{lvl}_conv{j}_kernel'] = np.asarray(
                chain[f'conv_{j}']['kernel'])
            out[f'enc{lvl}_conv{j}_bias'] = np.asarray(
                chain[f'conv_{j}']['bias'])
    for lvl in range(n_down):
        up = unet['decoder'][f'up_{lvl}']
        out[f'dec{lvl}_tconv_kernel'] = np.asarray(up['tconv']['kernel'])
        out[f'dec{lvl}_tconv_bias'] = np.asarray(up['tconv']['bias'])
        for j in range(2):
            out[f'dec{lvl}_conv{j}_kernel'] = np.asarray(
                up['convchain'][f'conv_{j}']['kernel'])
            out[f'dec{lvl}_conv{j}_bias'] = np.asarray(
                up['convchain'][f'conv_{j}']['bias'])
    out['last_conv_kernel'] = np.asarray(params['last_conv']['kernel'])
    out['last_conv_bias'] = np.asarray(params['last_conv']['bias'])
    np.savez(args.out, **out)
    print(json.dumps({'phase': 'initdump', 'out': args.out}))


def cmd_train(args):
    from dnncancerannotator_tpu.runs import train as train_mod

    os.makedirs(args.save, exist_ok=True)
    overlay = _size_overlay(args.save, args.size)
    train_mod.train(
        config=_config_stack(overlay),
        save_path=args.save,
        data_path=list(args.data),
        max_steps=args.steps,
        save_freq=args.freq,
    )
    print(json.dumps({'phase': 'jax-train', 'steps': args.steps}))


def cmd_eval(args):
    from dnncancerannotator_tpu.runs import evaluate as eval_mod

    overlay = _eval_overlay(args.save, args.size)
    eval_mod.evaluate(
        save_path=args.save,
        data_path=list(args.data),
        tag='parity',
        config=[overlay],
        export_csv=True,
        skip_visualization=True,
        avoid_overwrite=True,
    )
    print(json.dumps({
        'phase': 'jax-eval',
        'results': os.path.join(args.save, 'tfevents', 'parity',
                                'results.csv')}))


def _params_from_npz(npz, params):
    '''Overwrite the flax param tree with the TF-dumped weights
    (layout already converted on the TF side, refside.cmd_dump).'''
    import jax.numpy as jnp

    def put(leaf_dict, name, kernel, bias):
        assert leaf_dict[name]['kernel'].shape == kernel.shape, \
            (name, leaf_dict[name]['kernel'].shape, kernel.shape)
        leaf_dict[name]['kernel'] = jnp.asarray(kernel)
        leaf_dict[name]['bias'] = jnp.asarray(bias)

    unet = params['unet']
    n_down = len([k for k in unet['encoder'] if k.startswith('down_')])
    for lvl in range(n_down):
        chain = unet['encoder'][f'down_{lvl}']['convchain']
        for j in range(2):
            put(chain, f'conv_{j}', npz[f'enc{lvl}_conv{j}_kernel'],
                npz[f'enc{lvl}_conv{j}_bias'])
    for lvl in range(n_down):
        up = unet['decoder'][f'up_{lvl}']
        put(up, 'tconv', npz[f'dec{lvl}_tconv_kernel'],
            npz[f'dec{lvl}_tconv_bias'])
        for j in range(2):
            put(up['convchain'], f'conv_{j}',
                npz[f'dec{lvl}_conv{j}_kernel'],
                npz[f'dec{lvl}_conv{j}_bias'])
    put(params, 'last_conv', npz['last_conv_kernel'], npz['last_conv_bias'])
    return params


def cmd_xeval(args):
    import jax.numpy as jnp
    from dnncancerannotator_tpu import data as data_lib
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu.runs import evaluate as eval_mod
    from dnncancerannotator_tpu.utils import config as config_lib
    from dnncancerannotator_tpu.utils import dump as dump_lib

    os.makedirs(args.save, exist_ok=True)
    overlay = _size_overlay(args.save, args.size)
    cfg = config_lib.load_config(_config_stack(overlay))
    npz = np.load(args.npz)
    step = int(npz['step'])

    import jax
    engine = engine_lib.Engine(cfg)
    ds = data_lib.eval_ds(list(args.data), **cfg['data_options']['eval'])
    engine.build(ds.feature_shape)
    state = dict(engine.state)
    # tree_map rebuilds the containers, giving a mutable copy of the tree
    params = jax.tree_util.tree_map(lambda x: x, state['params'])
    state['params'] = _params_from_npz(npz, params)
    engine.state = state

    # forward float-diff on the TF-dumped eval batch (same weights, same
    # inputs): the executable form of "evaluation outputs match within
    # float tolerance"
    x = jnp.asarray(npz['batch_x'])
    probs = np.asarray(engine.model.apply(
        {'params': state['params']}, x, training=False))
    diff = float(np.max(np.abs(probs - npz['batch_probs'])))
    with open(os.path.join(args.save, 'forward_diff.json'), 'w') as f:
        json.dump({'max_abs_prob_diff': diff,
                   'batch_shape': list(npz['batch_x'].shape)}, f)
    print('forward max|Δprob| =', diff)

    # save as a checkpoint + options.yaml, then run the normal evaluate
    # driver over it so the export path is exactly the production one
    dump_lib.dump_options(
        os.path.join(args.save, 'options.yaml'), avoid_overwrite=True,
        config=cfg, save_path=args.save, data_path=list(args.data))
    engine.save_ckpt(os.path.join(args.save, 'checkpoints'), step)
    engine.finalize_checkpoints()

    eval_mod.evaluate(
        save_path=args.save,
        data_path=list(args.data),
        tag='parity',
        config=[_eval_overlay(args.save, args.size)],
        export_csv=True,
        skip_visualization=True,
        avoid_overwrite=True,
    )
    print(json.dumps({'phase': 'xeval', 'forward_diff': diff}))


def cmd_report(args):
    import pandas as pd

    out = args.out
    tf_res = pd.read_csv(os.path.join(out, 'tf', 'results.csv'),
                         index_col='step')
    jax_res = pd.read_csv(
        os.path.join(out, 'jax', 'tfevents', 'parity', 'results.csv'),
        index_col='step')
    x_res = pd.read_csv(
        os.path.join(out, 'xeval', 'tfevents', 'parity', 'results.csv'),
        index_col='step')
    fwd = json.load(open(os.path.join(out, 'xeval', 'forward_diff.json')))

    tf_last = tf_res.iloc[-1]
    jax_last = jax_res.iloc[-1]
    x_last = x_res.iloc[-1]

    def dice(row):
        return float(row['pixel/F1-score'])

    def iou(row):
        d = dice(row)
        return d / (2.0 - d)

    lines = []
    lines.append('# PARITY_RUN — TF reference vs this framework, '
                 'head to head\n')
    lines.append('Generated by tools/parity/run_parity.py; see '
                 'tools/parity/shims/README.md for how the reference '
                 'runs in this image.\n')
    lines.append('## Training head-to-head: same initial weights, same '
                 'TFRecords, same steps\n')
    lines.append('| metric | TF reference (CPU) | this framework (TPU) '
                 '| delta |')
    lines.append('|---|---|---|---|')
    rows = [('Dice (pixel/F1-score @0.8)', dice(tf_last), dice(jax_last)),
            ('IoU (Jaccard, from Dice)', iou(tf_last), iou(jax_last))]
    for name in ('pixel/precision', 'pixel/recall', 'pixel/AUPRC',
                 'pixel/AUROC', 'pixel/F2-score', 'region/precision',
                 'region/recall', 'region/F1-score'):
        if name in tf_last and name in jax_last:
            rows.append((name, float(tf_last[name]), float(jax_last[name])))
    for name, a, b in rows:
        lines.append(f'| {name} | {a:.4f} | {b:.4f} | {b - a:+.4f} |')
    dice_delta = dice(jax_last) - dice(tf_last)
    iou_delta = iou(jax_last) - iou(tf_last)
    # the clause guards against accuracy REGRESSION vs the reference
    # ("match or beat"); exceeding the reference passes outright
    verdict = ('PASS' if dice_delta >= -0.01 and iou_delta >= -0.01
               else 'FAIL')
    lines.append('')
    lines.append(f'**North-star accuracy clause: ΔDice = {dice_delta:+.4f}'
                 f', ΔIoU = {iou_delta:+.4f} -> {verdict}** '
                 '(threshold: no more than 1% BELOW the reference; '
                 'higher is a win).\n')

    lines.append('## Same weights, cross-framework evaluation export\n')
    lines.append('TF-trained final checkpoint loaded into our model; '
                 'our `evaluate` driver vs the reference metric suite on '
                 'identical weights and eval data.\n')
    lines.append(f'- forward probability map max|Δ| = '
                 f'{fwd["max_abs_prob_diff"]:.2e} on a '
                 f'{fwd["batch_shape"]} eval batch (JAX CPU f32 vs TF '
                 'CPU f32)')
    lines.append('')
    lines.append('| metric | TF evaluate | our evaluate | abs diff |')
    lines.append('|---|---|---|---|')
    common = [c for c in tf_last.index if c in x_last.index]
    max_d = 0.0
    for name in common:
        a, b = float(tf_last[name]), float(x_last[name])
        if name != 'loss':  # loss weighting uses per-batch positive rates
            max_d = max(max_d, abs(b - a))
        lines.append(f'| {name} | {a:.6f} | {b:.6f} | {abs(b - a):.2e} |')
    lines.append('')
    lines.append(f'max abs metric diff (excl. loss): {max_d:.2e}\n')

    lines.append('## Methodology notes\n')
    lines.append(
        '- Both sides train the reference config stack (unet.yaml + '
        'data/deploy overlays + the reference\'s own '
        'augment_options_nowarp.yaml) on the SAME synthetic 512-size '
        'tfrecords (24 px-scale lesions), from the SAME initial weights '
        '(jaxside initdump -> refside --init-npz), for the same number '
        'of optimizer steps.')
    lines.append(
        '- Gradient-level equivalence was verified separately: on shared '
        'weights and a shared batch, loss and global gradient norm agree '
        'to ~3e-5 relative (tools/parity/graddiag.py), and both '
        'frameworks\' plain-Adam continuations from the same checkpoint '
        'produce the same loss trajectory.')
    lines.append(
        '- Kernel init is glorot_uniform in both (the Keras layer '
        'default); an earlier lecun-vs-glorot mismatch produced wildly '
        'different 800-step trajectories despite identical dynamics — '
        'init parity, not framework behavior, dominates at these scales.')
    lines.append(
        '- The reference runs verbatim from /root/reference via the '
        'compatibility shims in tools/parity/shims (legacy Keras, '
        'scipy-backed connected_components); its metric math is its own '
        'code throughout.\n')
    lines.append('## Full per-checkpoint tables\n')
    lines.append('### TF reference results.csv\n')
    lines.append(tf_res.to_markdown())
    lines.append('\n### This framework results.csv\n')
    lines.append(jax_res.to_markdown())
    lines.append('')

    path = os.path.join(os.path.dirname(__file__), '..', '..',
                        'PARITY_RUN.md')
    with open(path, 'w') as f:
        f.write('\n'.join(lines))
    print(json.dumps({'phase': 'report', 'dice_delta': dice_delta,
                      'verdict': verdict, 'xeval_max_diff': max_d}))


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest='phase', required=True)
    specs = {
        'data': (cmd_data, ('--out', '--size')),
        'initdump': (cmd_initdump, ('--out', '--size')),
        'train': (cmd_train, ('--data', '--save', '--steps', '--freq',
                              '--size')),
        'eval': (cmd_eval, ('--data', '--save', '--size')),
        'xeval': (cmd_xeval, ('--npz', '--data', '--save', '--size')),
        'report': (cmd_report, ('--out',)),
    }
    for name, (fn, flags) in specs.items():
        sp = sub.add_parser(name)
        for flag in flags:
            if flag == '--data':
                sp.add_argument(flag, nargs='+', required=True)
            elif flag in ('--steps', '--freq'):
                sp.add_argument(flag, type=int, required=True)
            elif flag == '--size':
                sp.add_argument(flag, type=int, default=256)
            else:
                sp.add_argument(flag, required=True)
        sp.set_defaults(fn=fn)
    args = p.parse_args()
    args.fn(args)


if __name__ == '__main__':
    sys.exit(main())

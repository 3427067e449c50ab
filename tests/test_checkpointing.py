'''Async checkpointing and pruning tests.'''

import os

import numpy as np
import yaml

from tests import util_synth

CONFIG = {
    'model': 'UNetAnnotator',
    'model_options': dict(n_filters_first=2, n_downsample=2, rate=2,
                          kernel_size=3, conv_stride=1, bn=False,
                          padding='same'),
    'deploy_options': {
        'optimizer': 'adam',
        'loss': {'class_name': 'WeightedCrossentropy',
                 'config': {'weight_mul': 3.0}},
        'enable_multigpu': False,
        'max_checkpoints_to_keep': 2,
    },
    'data_options': {
        'train': {
            'batch_size': 4, 'buffer_size': 16, 'output_size': [32, 32],
            'base_size': 64,
            'slice_types': ['TRA', 'ADC', 'DWI', 'DCEE', 'DCEL', 'label'],
            'augment_options': {'random_crop': None},
        },
    },
}


def test_async_save_prune_resume(tmp_path):
    from dnncancerannotator_tpu import engine as engine_lib
    from dnncancerannotator_tpu import data as data_lib

    cancer, healthy = util_synth.make_tfrecords(str(tmp_path), size=64)
    cfg = yaml.safe_load(yaml.safe_dump(CONFIG))
    ds = data_lib.train_ds([cancer, healthy],
                           **cfg['data_options']['train'])
    save_path = str(tmp_path / 'run')

    eng = engine_lib.Engine(cfg, seed=5)
    eng.train(ds, save_path=save_path, max_steps=8, save_freq=2)
    ckpt_dir = os.path.join(save_path, 'checkpoints')
    kept = sorted(os.listdir(ckpt_dir))
    # saves at 2,4,6,8; max_to_keep=2 -> only the 2 newest survive
    assert kept == ['ckpt-6', 'ckpt-8'], kept

    # resume must find ckpt-8 and continue
    eng2 = engine_lib.Engine(cfg, seed=5)
    results = eng2.train(ds, save_path=save_path, max_steps=10, save_freq=2)
    assert results.epoch == [9, 10]
    kept = sorted(os.listdir(ckpt_dir))
    assert kept == ['ckpt-10', 'ckpt-8'], kept

    # loading a pruned step's checkpoint raises cleanly
    assert eng2.get_ckpts(ckpt_dir).keys() == {8, 10}


def test_ckpt_opt_state_is_param_tree_and_interim_flat_loads(tmp_path):
    '''The on-disk opt_state keeps the param-tree layout (independent of
    the runtime optax.flatten optimization), and checkpoints written by
    the interim window that saved the flat runtime layout still load.'''
    import jax
    import orbax.checkpoint as ocp
    from dnncancerannotator_tpu import engine as engine_lib

    cfg = yaml.safe_load(yaml.safe_dump(CONFIG))
    eng = engine_lib.Engine(cfg, seed=7)
    eng.build((1, 32, 32, 5))

    # runtime layout: flattened (few 1-D moment vectors), disk layout: tree
    n_param_leaves = len(jax.tree.leaves(eng.state['params']))
    assert len(jax.tree.leaves(eng.state['opt_state'])) < n_param_leaves
    view = eng._ckpt_view()
    assert len(jax.tree.leaves(view['opt_state'])) >= 2 * n_param_leaves

    # tree-form roundtrip
    path = str(tmp_path / 'tree-ckpt')
    eng.save(path)
    eng2 = engine_lib.Engine(cfg, seed=11)
    eng2.build((1, 32, 32, 5))
    eng2.load(path)
    for a, b in zip(jax.tree.leaves(eng.state), jax.tree.leaves(eng2.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # interim flat-layout checkpoint still restores via the fallback
    flat_path = str(tmp_path / 'flat-ckpt')
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(os.path.abspath(flat_path), eng.state, force=True)
    eng3 = engine_lib.Engine(cfg, seed=13)
    eng3.build((1, 32, 32, 5))
    eng3.load(flat_path)
    for a, b in zip(jax.tree.leaves(eng.state), jax.tree.leaves(eng3.state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

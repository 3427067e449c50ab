'''Training run driver (parity with reference annotator/runs/train.py).'''

import os

from .. import data as data_lib
from .. import engine as engine_lib
from ..utils import config as config_lib
from ..utils import dump as dump_lib


def train(
    config,
    save_path,
    data_path,
    max_steps,
    early_stop_steps=None,
    save_freq=500,
    validate=False,
    val_data_path=None,
    visualize=False,
    profile=False,
    seed=0,
):
    '''
    Run a training job: record the resolved options under save_path,
    fit the model, and write the final results pickle.

    Args:
        config (list[str]): one or more YAML/JSON config files; the first
            is the base and each later file is overlaid onto it
            (dotted keys merge into nested sections)
        save_path: output directory for checkpoints, options and results
        data_path (list[str]): training data (.tfrecords files or exam
            directory trees)
        max_steps (int): stop after this many optimizer steps
        early_stop_steps (int): abort when validation loss has not improved
            for this many steps; disabled when None (default)
        save_freq (int): checkpoint every N steps (default 500)
        validate (bool): evaluate on val_data_path at every checkpoint
        val_data_path (list[str]): validation data location
        visualize (bool): write image/PR-curve summaries during training
        profile (bool): capture a profiler trace window
        seed (int): PRNG seed for weight init, data order and augmentation
            (additive over the reference, which trains unseeded)
    '''
    config = config_lib.load_config(config)
    dump_lib.dump_options(
        os.path.join(save_path, 'options.yaml'),
        avoid_overwrite=True,
        config=config,
        save_path=save_path,
        data_path=data_path,
    )

    ds = data_lib.train_ds(data_path, **config['data_options']['train'])
    if validate:
        assert val_data_path is not None
        val_ds = data_lib.eval_ds(
            val_data_path, **config['data_options']['eval'])
    else:
        val_ds = None

    if visualize:
        visualization = {
            'train': data_lib.eval_ds(
                data_path, **config['data_options']['eval'],
                include_meta=True),
            'validation': data_lib.eval_ds(
                val_data_path, **config['data_options']['eval'],
                include_meta=True),
        }
    else:
        visualization = {}

    model = engine_lib.Engine(config, seed=seed)
    results = model.train(
        ds,
        save_path=save_path,
        max_steps=max_steps,
        early_stop_steps=early_stop_steps,
        save_freq=save_freq,
        val_data=val_ds,
        visualization=visualization,
        profile=profile,
    )

    dump_lib.dump_train_results(
        os.path.join(save_path, 'results.pkl'), results, format_='pickle')
    return results

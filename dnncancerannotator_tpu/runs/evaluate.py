'''Evaluation run driver (parity with reference annotator/runs/evaluate.py).'''

import os

from .. import data as data_lib
from .. import engine as engine_lib
from ..utils import config as config_lib


def evaluate(
    save_path,
    data_path,
    tag,
    config=None,
    avoid_overwrite=False,
    export_path=None,
    export_images=False,
    export_csv=False,
    visualize_sensitivity=False,
    min_interval=1,
    step_range=None,
    overlay=False,
    skip_visualization=False,
    export_casewise_metrics=False,
):
    '''
    Evaluate a model with specified configs
    for every checkpoint available.

    Args:
        save_path: where to find weights/configs/results
        data_path (list[str]): path to the data root dir
        tag: save tag
        config (list[str]): configuration file path
            This option accepts arbitrary number of configs.
        avoid_overwrite (bool): rename tag when it already exists
        export_path (str): path to export results
        export_images (bool): export images
        export_csv (bool): export results csv
        visualize_sensitivity (bool): visualize input sensitivity
        min_interval (int): minimum interval in steps between evaluations
        step_range (list[int]): range of steps to evaluate ("start end")
        overlay (bool): overlay segmentation on the input image
        skip_visualization (bool): skip the visualization pass
        export_casewise_metrics (bool): export per-case evaluation results
            (needs export_csv)
    '''
    saved_config = os.path.join(save_path, 'options.yaml')
    saved_config = config_lib.load_config(saved_config)['config']
    if config:
        add_config = config_lib.load_config(config)
        config = config_lib.apply_config(saved_config, add_config)
    else:
        config = saved_config

    ds = data_lib.eval_ds(data_path, **config['data_options']['eval'])
    if skip_visualization:
        viz_ds = None
    else:
        viz_ds = data_lib.eval_ds(
            data_path, **config['data_options']['eval'], include_meta=True)

    if step_range is not None:
        step_range = tuple(map(int, step_range))

    model = engine_lib.Engine(config)
    return model.eval(
        ds, viz_ds=viz_ds,
        tag=tag,
        save_path=save_path,
        avoid_overwrite=avoid_overwrite,
        export_path=export_path,
        export_images=export_images,
        export_csv=export_csv,
        visualize_sensitivity=visualize_sensitivity,
        min_interval=min_interval,
        step_range=step_range,
        overlay=overlay,
        export_casewise_metrics=export_casewise_metrics,
    )

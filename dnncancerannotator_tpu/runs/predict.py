'''Prediction run driver.

The reference leaves this a 0-byte stub (reference: annotator/runs/predict.py)
with supporting pieces in data/engine; here the path is wired end-to-end:
load the latest checkpoint and write predicted segmentation PNGs.
'''

import logging
import os

import jax.numpy as jnp
import numpy as np

from .. import data as data_lib
from .. import engine as engine_lib
from ..utils import config as config_lib
from ..utils import tboard

logger = logging.getLogger(__name__)


def predict(
    save_path,
    data_path,
    output_path,
    config=None,
    threshold=None,
    batch_size=1,
    output_format='png',
):
    '''
    Predict segmentation maps with the latest checkpoint.

    Args:
        save_path: where to find weights/configs
        data_path (list[str]): path to the data root dir
        output_path: directory for predicted segmentation PNGs
        config (list[str]): extra configuration overlays
        threshold (float): optional binarization threshold for the output
        batch_size (int): slices per forward pass
        output_format (str): 'png' (8-bit grayscale probability map),
            'npy' (raw float32 probabilities), or 'png16' (16-bit PNG,
            probability scaled to [0, 65535])
    '''
    assert output_format in ('png', 'npy', 'png16'), output_format
    saved_config = os.path.join(save_path, 'options.yaml')
    saved_config = config_lib.load_config(saved_config)['config']
    if config:
        add_config = config_lib.load_config(config)
        saved_config = config_lib.apply_config(saved_config, add_config)

    ds = data_lib.predict_ds(
        data_path,
        slice_types=saved_config['data_options']['eval'].get(
            'slice_types', data_lib.records.DEFAULT_SLICE_TYPES),
        output_size=saved_config['data_options']['eval'].get(
            'output_size', (512, 512)),
        batch_size=batch_size)

    model = engine_lib.Engine(saved_config)
    model.build(ds.feature_shape, abstract=True)
    ckpts = model.get_ckpts(os.path.join(save_path, 'checkpoints'))
    assert ckpts, f'no checkpoints under {save_path}'
    latest = max(ckpts)
    model.load(ckpts[latest])
    logger.info('Predicting with checkpoint step %d', latest)

    os.makedirs(output_path, exist_ok=True)
    count = 0
    eval_step = model._make_eval_step(ds.slice_types)
    for batch in ds.batches():
        from ..parallel import mesh as mesh_lib
        raw_dev, n = mesh_lib.shard_batch(
            model.mesh, batch['slices'], pad_to=batch_size)
        _, probs, _ = eval_step(model.state, raw_dev, jnp.int32(n))
        probs = np.asarray(probs)[:n]
        ext = 'npy' if output_format == 'npy' else 'png'
        for i, meta in enumerate(batch['meta']):
            pred = probs[i, :, :, 0]
            if threshold is not None:
                pred = (pred > threshold).astype(np.float32)
            parts = meta['path'].split('/')[-3:]
            out = os.path.join(
                output_path, *parts, f"{meta['sliceID']:02d}.{ext}")
            os.makedirs(os.path.dirname(out), exist_ok=True)
            if output_format == 'npy':
                np.save(out, pred.astype(np.float32))
            elif output_format == 'png16':
                with open(out, 'wb') as f:
                    f.write(tboard.encode_png(
                        np.clip(pred, 0, 1) * 65535, bitdepth=16))
            else:
                with open(out, 'wb') as f:
                    f.write(tboard.encode_png(pred))
            count += 1
    logger.info('Wrote %d predictions to %s', count, output_path)
    return count

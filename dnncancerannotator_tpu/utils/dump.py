'''Dump run options and training results to disk.

Behavioral parity with reference annotator/utils/dump.py:
- ``dump_options`` renames the target (``x.yaml`` -> ``x_.yaml``) while a file
  already exists at the path (reference: dump.py:30-33).
- ``dump_train_results`` writes {epoch, history, params, model} as pickle/yaml
  (reference: dump.py:52-82).
'''

import json
import os
import pickle

import yaml


def dump_options(path, avoid_overwrite=False, **options):
    '''Dump options to file, renaming on collision.

    Args:
        path: path to the output file; format chosen by extension.
        avoid_overwrite: kept for API parity; collisions are always renamed
            (matching the reference behavior).
        options: options to dump.
    '''
    while os.path.exists(path):
        base = os.path.basename(path)
        new_base = '{}_{}'.format(*os.path.splitext(base))
        path = os.path.join(os.path.dirname(path), new_base)

    format_ = os.path.splitext(path)[1][1:]
    dir_ = os.path.dirname(path)
    if dir_:
        os.makedirs(dir_, exist_ok=True)

    if format_ == 'json':
        with open(path, 'w') as f:
            json.dump(options, f)
    elif format_ == 'yaml':
        with open(path, 'w') as f:
            yaml.safe_dump(options, f)
    elif format_ == 'pickle':
        with open(path, 'wb') as f:
            pickle.dump(options, f)
    else:
        raise NotImplementedError(f'Unimplemented format {format_}')
    return path


def dump_train_results(path, train_results, format_='pickle'):
    '''Dump training results ({epoch, history, params, model}) to a file.'''
    format_ = format_.lower()
    dir_ = os.path.dirname(path)
    if dir_:
        os.makedirs(dir_, exist_ok=True)

    dump_content = {
        'epoch': list(train_results.epoch),
        'history': {k: [float(x) for x in v] for k, v in train_results.history.items()},
        'params': train_results.params,
        'model': train_results.model_name,
    }

    if format_ == 'pickle':
        with open(path, 'wb') as f:
            pickle.dump(dump_content, f)
    elif format_ == 'yaml':
        with open(path, 'w') as f:
            yaml.safe_dump(dump_content, f)
    else:
        raise NotImplementedError(f'Unimplemented format {format_}')
    return

'''Config loading / stacking.

Semantics match the reference config system (reference: annotator/utils/load.py):
- ``load_config`` accepts a single path or a list; the first file is the main
  config and later files overlay it.
- Overlay files may use dotted keys (``a.b.c: v``) which create/update nested
  dicts (reference: annotator/utils/load.py:44-57).
- Formats are selected by extension: yaml / json / pickle.
'''

import json
import os
import pickle

import yaml


def load_config(path):
    '''Load one or more config files, overlaying later files onto the first.

    Args:
        path: path to the config file. Can be a single path (str) or a list of
            paths. If a list is given, the first one is the "main" config and
            the rest overwrite its content (dotted keys supported).

    Returns:
        config (whatever was dumped in the file, typically a dict)
    '''
    if isinstance(path, str):
        return load_config([path])
    assert isinstance(path, (tuple, list))
    assert path

    configs = list(map(_load_config_single, path))
    config = configs[0]
    for additional in configs[1:]:
        config = apply_config(config, additional)
    return config


def apply_config(base_config, add_config):
    '''Update ``base_config`` with ``add_config``, expanding dotted keys.'''
    def _apply(target, dest, value):
        if '.' not in dest:
            target[dest] = value
        else:
            keys = dest.split('.')
            if keys[0] not in target:
                target[keys[0]] = dict()
            _apply(target[keys[0]], '.'.join(keys[1:]), value)
        return target

    for key, val in add_config.items():
        base_config = _apply(base_config, key, val)
    return base_config


def _load_config_single(path):
    extension = os.path.splitext(path)[1][1:]
    if extension == 'json':
        with open(path) as f:
            return json.load(f)
    elif extension == 'yaml':
        with open(path) as f:
            return yaml.safe_load(f)
    elif extension == 'pickle':
        with open(path, 'rb') as f:
            return pickle.load(f)
    raise NotImplementedError(f'Unexpected extension {extension}')

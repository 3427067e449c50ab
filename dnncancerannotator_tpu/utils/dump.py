'''Dump run options and training results to disk.

Behavioral parity with reference annotator/utils/dump.py:
- ``dump_options`` never overwrites: while the target exists, an underscore
  is appended to the filename stem (``x.yaml`` -> ``x_.yaml`` -> ``x__.yaml``,
  reference: dump.py:30-33).
- ``dump_train_results`` writes {epoch, history, params, model} as
  pickle/yaml (reference: dump.py:52-82).
'''

import json
import pathlib
import pickle
from functools import partial

import yaml

_WRITERS = {
    'json': ('w', json.dump),
    'yaml': ('w', partial(yaml.safe_dump, default_flow_style=False)),
    'pickle': ('wb', pickle.dump),
}


def _free_path(path):
    '''First non-existing variant of ``path``, growing the stem by "_".'''
    p = pathlib.Path(path)
    stem = p.stem
    while p.exists():
        stem += '_'
        p = p.with_name(stem + p.suffix)
    return p


def _serialize(obj, path):
    '''Write ``obj`` to ``path`` in the format its extension names.'''
    fmt = path.suffix.lstrip('.')
    if fmt not in _WRITERS:
        raise NotImplementedError(f'Unimplemented format {fmt}')
    mode, writer = _WRITERS[fmt]
    path.parent.mkdir(parents=True, exist_ok=True)
    with open(path, mode) as fh:
        writer(obj, fh)


def dump_options(path, avoid_overwrite=False, **options):
    '''Dump run options, renaming on collision; returns the path written.

    Args:
        path: output file; format chosen by extension (yaml/json/pickle).
        avoid_overwrite: kept for API parity; collisions are always renamed
            (matching the reference behavior).
        options: the option mapping to dump.
    '''
    target = _free_path(path)
    _serialize(options, target)
    return str(target)


def dump_train_results(path, train_results, format_='pickle'):
    '''Dump training results ({epoch, history, params, model}) to a file.

    Unlike ``dump_options``, the format comes from ``format_`` (not the
    extension) and only pickle/yaml are supported — reference dump.py:52-82.
    '''
    fmt = format_.lower()
    if fmt not in ('pickle', 'yaml'):
        raise NotImplementedError(f'Unimplemented format {fmt}')
    content = dict(
        epoch=list(train_results.epoch),
        history={name: list(map(float, series))
                 for name, series in train_results.history.items()},
        params=train_results.params,
        model=train_results.model_name,
    )
    target = pathlib.Path(path)
    mode, writer = _WRITERS[fmt]
    target.parent.mkdir(parents=True, exist_ok=True)
    with open(target, mode) as fh:
        writer(content, fh)

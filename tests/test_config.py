'''Config stacking, options dumping, and CLI construction tests.'''

import argparse
import os

import pytest
import yaml

from dnncancerannotator_tpu.utils import config as config_lib
from dnncancerannotator_tpu.utils import dscli, dump as dump_lib


def _write(path, data):
    with open(path, 'w') as f:
        yaml.safe_dump(data, f)
    return str(path)


def test_single_config(tmp_path):
    p = _write(tmp_path / 'a.yaml', {'model': 'UNetAnnotator', 'x': 1})
    assert config_lib.load_config(p) == {'model': 'UNetAnnotator', 'x': 1}


def test_stacked_dotted_merge(tmp_path):
    base = _write(tmp_path / 'base.yaml', {
        'model': 'UNetAnnotator',
        'deploy_options': {'optimizer': 'adam', 'loss': {
            'class_name': 'WeightedCrossentropy', 'config': {'weight_mul': 3.0}}},
    })
    overlay = _write(tmp_path / 'overlay.yaml', {
        'deploy_options.loss.config.label_smoothing': True,
        'deploy_options.enable_multigpu': True,
        'data_options.train.batch_size': 28,
    })
    cfg = config_lib.load_config([base, overlay])
    assert cfg['deploy_options']['loss']['config'] == {
        'weight_mul': 3.0, 'label_smoothing': True}
    assert cfg['deploy_options']['enable_multigpu'] is True
    assert cfg['data_options']['train']['batch_size'] == 28
    assert cfg['deploy_options']['optimizer'] == 'adam'  # untouched


def test_reference_configs_stack():
    '''The shipped configs must stack exactly like the reference's.'''
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = config_lib.load_config([
        os.path.join(repo, 'configs', 'unet.yaml'),
        os.path.join(repo, 'configs', 'additionals', 'deploy_options.yaml'),
        os.path.join(repo, 'configs', 'additionals', 'data_options.yaml'),
        os.path.join(repo, 'configs', 'additionals', 'metrics.yaml'),
        os.path.join(repo, 'configs', 'additionals', 'slice_type_tra.yaml'),
    ])
    assert cfg['model'] == 'UNetAnnotator'
    assert cfg['deploy_options']['enable_multigpu'] is False
    assert len(cfg['deploy_options']['metrics']) == 13
    assert cfg['data_options']['train']['slice_types'] == ['TRA', 'label']
    assert cfg['data_options']['train']['batch_size'] == 8


def test_dump_options_collision_rename(tmp_path):
    p = str(tmp_path / 'options.yaml')
    dump_lib.dump_options(p, config={'a': 1})
    dump_lib.dump_options(p, config={'a': 2})
    assert os.path.exists(str(tmp_path / 'options.yaml'))
    assert os.path.exists(str(tmp_path / 'options_.yaml'))
    with open(p) as f:
        assert yaml.safe_load(f)['config'] == {'a': 1}


def test_cli_parser_from_docstring():
    def demo(config, save_path, max_steps, save_freq=500, validate=False):
        '''
        Do a demo thing.

        Args:
            config (list[str]): config files
            save_path: where to save
            max_steps (int): max steps
            save_freq (int): save frequency
            validate (bool): validate too
        '''
        return dict(config=config, save_path=save_path, max_steps=max_steps,
                    save_freq=save_freq, validate=validate)

    parser = argparse.ArgumentParser()
    sub = parser.add_subparsers()
    dscli.add_command(sub, demo)
    result = dscli.run(parser, [
        'demo', '--config', 'a.yaml', 'b.yaml', '--save_path', '/tmp/x',
        '--max_steps', '100', '--validate'])
    assert result == dict(config=['a.yaml', 'b.yaml'], save_path='/tmp/x',
                          max_steps=100, save_freq=500, validate=True)

    # missing required arg errors
    with pytest.raises(SystemExit):
        dscli.run(parser, ['demo', '--save_path', 'x', '--max_steps', '1'])


def test_cli_main_builds():
    from dnncancerannotator_tpu.runs.__main__ import main
    with pytest.raises(SystemExit):  # --help exits 0
        main(argv=['--help'])

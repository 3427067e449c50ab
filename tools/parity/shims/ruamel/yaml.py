'''Shim: pyyaml-backed stand-in for ruamel.yaml.YAML(typ='safe').dump.'''
import yaml as _pyyaml

class YAML:
    def __init__(self, typ='safe'):
        pass
    def dump(self, data, stream):
        _pyyaml.safe_dump(data, stream)

'''Shim so reference modules import; CLI features unused.'''
class ArgumentParser:
    def __init__(self, *a, **k): pass
    def add_parser(self, *a, **k): return self
    def parse_args(self, *a, **k): raise NotImplementedError
def main(*a, **k): raise NotImplementedError

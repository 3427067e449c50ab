'''Minimal tfa shim: scipy-backed connected_components oracle; other ops
raise (the nowarp/no-smoothing configs never reach them).'''
from . import image

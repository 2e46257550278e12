from . import loam

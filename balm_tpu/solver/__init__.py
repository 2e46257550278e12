from . import lm

from . import dada, lowcbf  # noqa: F401
from .dada import DADAFile, load, save  # noqa: F401

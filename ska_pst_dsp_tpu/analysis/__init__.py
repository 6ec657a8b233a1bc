"""Analysis and plotting layer (reference L7 equivalents)."""
from . import plots, param_opt, compare_dump_files  # noqa: F401

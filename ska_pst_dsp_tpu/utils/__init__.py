from . import rational, geometry, windows, config  # noqa: F401

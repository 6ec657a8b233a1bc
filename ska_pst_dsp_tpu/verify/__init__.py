"""Verification harness (reference python/verify equivalent)."""

from . import comparator, common, util  # noqa: F401

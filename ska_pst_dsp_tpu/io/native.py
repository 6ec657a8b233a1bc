"""ctypes bindings for the native DADA engine (native/dada_engine.cpp).

The C++ engine does the mmap'd read + dtype conversion + TFP↔PFT corner
turn + int quantization with a thread pool. Loading is lazy with an
automatic build attempt; callers fall back to the NumPy paths in
:mod:`.dada` when the library is unavailable (``available()``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

module_logger = logging.getLogger(__name__)

_NATIVE_DIR = os.path.abspath(
    os.path.join(os.path.dirname(__file__), "..", "..", "native")
)
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdada_engine.so")

_lib = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                           capture_output=True)
        except Exception as exc:  # no toolchain — numpy fallback
            module_logger.debug("native build failed: %s", exc)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as exc:
        module_logger.debug("native load failed: %s", exc)
        return None

    i64, i32 = ctypes.c_int64, ctypes.c_int
    fp = np.ctypeslib.ndpointer(dtype=np.float32, flags="C_CONTIGUOUS")
    lib.dada_header_size.restype = i64
    lib.dada_header_size.argtypes = [ctypes.c_char_p]
    lib.dada_read_split.restype = i32
    lib.dada_read_split.argtypes = [
        ctypes.c_char_p, i64, i64, i64, i32, i64, i64, fp, fp,
    ]
    lib.dada_write_split.restype = i32
    lib.dada_write_split.argtypes = [
        ctypes.c_char_p, i64, i64, i32, i64, fp, fp, ctypes.c_float,
    ]
    lib.lowcbf_read_split.restype = i32
    lib.lowcbf_read_split.argtypes = [
        ctypes.c_char_p, i64, i64, i64, i32, i64, i64, fp, fp,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def header_size(path: str) -> int:
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    size = lib.dada_header_size(path.encode())
    if size <= 0:
        raise ValueError(f"{path}: no parseable HDR_SIZE")
    return int(size)


def read_split(
    path: str, hdr_size: int, n_pol: int, n_chan: int, nbit: int,
    start: int, count: int,
) -> Tuple[np.ndarray, np.ndarray]:
    """Read a time window as split (re, im) float32 planes of shape
    (n_pol, n_chan, count)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    out_re = np.empty(n_pol * n_chan * count, dtype=np.float32)
    out_im = np.empty_like(out_re)
    rc = lib.dada_read_split(
        path.encode(), hdr_size, n_pol, n_chan, nbit, start, count,
        out_re, out_im,
    )
    if rc != 0:
        raise IOError(f"dada_read_split({path}) failed with code {rc}")
    shape = (n_pol, n_chan, count)
    return out_re.reshape(shape), out_im.reshape(shape)


def append_split(path: str, re: np.ndarray, im: np.ndarray, nbit: int = 32,
                 scale: float = 1.0) -> None:
    """Append (n_pol, n_chan, count) split planes as TFP records (the header
    must already exist in the file)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    n_pol, n_chan, count = re.shape
    rc = lib.dada_write_split(
        path.encode(), n_pol, n_chan, nbit, count,
        np.ascontiguousarray(re, dtype=np.float32),
        np.ascontiguousarray(im, dtype=np.float32),
        ctypes.c_float(scale),
    )
    if rc != 0:
        raise IOError(f"dada_write_split({path}) failed with code {rc}")


def read_lowcbf_split(
    path: str, hdr_size: int, n_pol: int, n_chan: int, nbit: int,
    start_heap: int, n_heaps: int,
) -> Tuple[np.ndarray, np.ndarray]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native engine unavailable")
    count = n_heaps * 32
    out_re = np.empty(n_pol * n_chan * count, dtype=np.float32)
    out_im = np.empty_like(out_re)
    rc = lib.lowcbf_read_split(
        path.encode(), hdr_size, n_pol, n_chan, nbit, start_heap, n_heaps,
        out_re, out_im,
    )
    if rc != 0:
        raise IOError(f"lowcbf_read_split({path}) failed with code {rc}")
    shape = (n_pol, n_chan, count)
    return out_re.reshape(shape), out_im.reshape(shape)

"""File-level PFB inversion.

Equivalent of python/data_gen/synthesize.py:27-141 and the mcc
``build/synthesize`` executable (synthesize.m:61-113): read a channelized
DADA file, recover the FIR coefficients from its header (COEFF_0 — the
self-describing-file mechanism of add_fir_filter_to_header.m), run the
Golden inversion, write the single-channel DADA file.
"""

from __future__ import annotations

import argparse
import logging
import os
from typing import Optional

import numpy as np

from . import util
from .config import config
from .. import oracle
from ..io import dada
from ..ops import polyphase_synthesis
from ..utils import windows
from ..utils.rational import Rational

__all__ = ["synthesize", "fft_window_lookup"]

module_logger = logging.getLogger(__name__)

_BACKEND_ALIASES = {"matlab": "numpy", "python": "numpy", "numpy": "numpy", "jax": "jax"}


def fft_window_lookup(name: str, fft_length: int, overlap: int) -> np.ndarray:
    """Window factory lookup (synthesize.py:19-24 in the reference maps
    names onto pfb.fft_windows)."""
    return windows.build(name, fft_length, overlap)


@util.partialize
def synthesize(
    input_data_file_path: str,
    input_fft_length: Optional[int] = None,
    input_overlap: Optional[int] = None,
    fft_window_str: str = "tukey",
    apply_deripple: bool = True,
    os_factor_str: Optional[str] = None,
    output_file_name: Optional[str] = None,
    output_dir: str = "./",
    backend: str = "jax",
    spans_nyquist: bool = True,
    combine: int = 1,
) -> dada.DADAFile:
    """Invert a channelized DADA file; returns the loaded output DADAFile."""
    if input_fft_length is None:
        input_fft_length = config.input_fft_length
    if input_overlap is None:
        input_overlap = config.input_overlap
    backend = _BACKEND_ALIASES.get(backend, backend)

    data, header = dada.load(input_data_file_path)
    os_factor = Rational.from_str(
        str(os_factor_str) if os_factor_str else header.get("OS_FACTOR", str(config.os_factor))
    )
    stages = dada.get_fir_filters_from_header(header)
    filt = stages[0][0] if stages else config.load_fir_filter_coeff()

    output_base = f"synthesize.{input_fft_length}"
    output_base, log_file_name, output_file_name = util.create_output_file_names(
        output_file_name, output_base
    )
    module_logger.debug(
        "synthesize: %s %s backend=%s L=%d overlap=%d window=%s deripple=%s",
        input_data_file_path, data.shape, backend, input_fft_length,
        input_overlap, fft_window_str, apply_deripple,
    )

    if backend == "jax":
        out = np.asarray(
            polyphase_synthesis(
                data,
                input_fft_length,
                os_factor,
                spans_nyquist=spans_nyquist,
                input_overlap=input_overlap,
                deripple_coeff=filt if apply_deripple else None,
                temporal_taper=fft_window_str,
                combine=combine,
            )
        )
    else:
        taper = fft_window_lookup(fft_window_str, input_fft_length, input_overlap)
        out = oracle.polyphase_synthesis(
            data.astype(np.complex128),
            input_fft_length,
            os_factor,
            spans_nyquist=spans_nyquist,
            input_overlap=input_overlap,
            deripple_coeff=filt if apply_deripple else None,
            temporal_taper=taper.astype(np.float64),
            combine=combine,
        ).astype(np.complex64)

    header = dict(header)
    n_chan_in = data.shape[1]
    tsamp = float(header.get("TSAMP", 1.0))
    header["TSAMP"] = str(tsamp * os_factor.nu / (os_factor.de * n_chan_in))
    header["NSTAGE"] = "0"
    header.pop("OS_FACTOR", None)

    os.makedirs(output_dir, exist_ok=True)
    out_path = os.path.join(output_dir, output_file_name)
    dada.save(out_path, out, header)
    return dada.DADAFile(out_path).load_data()


def create_parser():
    parser = argparse.ArgumentParser(description="Synthesize (invert) file(s)")
    parser.add_argument("-i", "--input-files", dest="input_file_paths",
                        nargs="+", type=str, required=True)
    parser.add_argument("-f", "--input_fft_length", dest="input_fft_length",
                        type=int, required=True)
    parser.add_argument("-o", "--input_overlap", dest="input_overlap",
                        type=int, default=None)
    parser.add_argument("-w", "--fft_window", dest="fft_window", type=str,
                        default="tukey")
    parser.add_argument("-nd", "--no-deripple", dest="no_deripple",
                        action="store_true")
    parser.add_argument("-b", "--backend", dest="backend", type=str,
                        default="jax")
    parser.add_argument("-od", "--output_dir", dest="output_dir", type=str,
                        default="./")
    parser.add_argument("-v", "--verbose", dest="verbose", action="store_true")
    return parser


def main():
    parsed = create_parser().parse_args()
    logging.basicConfig(level=logging.DEBUG if parsed.verbose else logging.INFO)
    synthesizer = synthesize(backend=parsed.backend.lower())
    for file_path in parsed.input_file_paths:
        synthesizer(
            file_path,
            input_fft_length=parsed.input_fft_length,
            input_overlap=parsed.input_overlap,
            fft_window_str=parsed.fft_window,
            apply_deripple=not parsed.no_deripple,
            output_dir=parsed.output_dir,
            output_file_name="synthesized." + os.path.basename(file_path),
        )


if __name__ == "__main__":
    main()

"""On-chip dedispersion round trip through the fused Pallas path.

The spectral_filter slot (ops/synthesis.py; native analog of dspsr's
convolution-during-inversion, reference
python/verify/test_dedispersion.py:54-321) is verified elsewhere through
the composed-XLA path only. This tool drives the coherent-dedispersion
chirp through the COMPILED fused chain's elementwise hook — analysis_fused
→ synthesis_fused → ifft_fused's elem constant — on the real chip:

  path A: invert WITHOUT the filter on the chip, then dedisperse the
          whole inverted stream with the exact host chirp;
  path B: invert WITH spectral_filter = chirp on the chip (the chirp
          rides the fused IFFT epilogue's pre-roll elementwise constant).

Inversion must commute with dedispersion: A and B agree over the interior
window. Writes products/report.dedispersion.tpu.json and exits nonzero if
the mean difference exceeds -50 dB (the composed path and the reference
both achieve ~ -52..-57 dB).

    python tools/dedispersion_tpu.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from ska_pst_dsp_tpu.data_gen.config import products_dir  # noqa: E402
from ska_pst_dsp_tpu.data_gen.util import NumpyEncoder  # noqa: E402
from ska_pst_dsp_tpu.models.signals import SquareWave  # noqa: E402
from ska_pst_dsp_tpu.ops import dedispersion  # noqa: E402
from ska_pst_dsp_tpu.utils import geometry  # noqa: E402
from ska_pst_dsp_tpu.utils.config import load_config  # noqa: E402
from ska_pst_dsp_tpu.verify.util import dB  # noqa: E402


def main() -> int:
    import jax

    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )

    config = load_config("low")
    if jax.default_backend() == "cpu":
        raise SystemExit("dedispersion_tpu must run on the real chip")
    dm, f0, bw = (config.dm or 2.64476), 1405.0, 40.0
    filt = config.load_fir_filter_coeff()
    os_f = config.os_factor
    n_chan, L, ov = config.channels, config.input_fft_length, config.input_overlap
    geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
    n_bins = geom.fn_width * n_chan * config.blocks * 2

    sw = SquareWave(period=4096, duty_cycle=0.1, on_amp=4.0, off_amp=0.04,
                    seed=11)
    clean = np.asarray(sw.generate(0, n_bins))[0, 0]
    dispersed = dedispersion.dedisperse(
        clean[None], dm, f0, bw, inverse=True
    )[0].astype(np.complex64)
    xr = np.ascontiguousarray(dispersed.real, np.float32)[None]
    xi = np.ascontiguousarray(dispersed.imag, np.float32)[None]

    h = dedispersion.chirp_filter(n_chan * geom.fn_width, dm, f0, bw)

    def run(spectral_filter):
        (cr, ci), nb = polyphase_analysis_fused(
            (xr, xi), filt, n_chan, os_f, time_major=True, keep_padding=True
        )
        rr, ri = polyphase_synthesis_fused(
            (cr, ci), L, os_f, input_overlap=ov,
            deripple_coeff=filt if config.deripple else None,
            temporal_taper=config.temporal_taper, time_major_in=True,
            valid_len=nb, spectral_filter=spectral_filter,
        )
        return (
            np.asarray(rr).astype(np.float64)
            + 1j * np.asarray(ri).astype(np.float64)
        ).reshape(-1)

    plain = run(None)
    a = dedispersion.dedisperse(plain[None], dm, f0, bw)[0]
    b = run(h)

    m = min(a.size, b.size)
    guard = m // 8
    diff = np.abs(b[guard: m - guard] - a[guard: m - guard]) ** 2
    ref = np.abs(a[guard: m - guard]) ** 2
    report = {
        "config": "low",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "kernel_path": "analysis_fused+synthesis_fused+ifft_fused(elem)",
        "fft_precision": os.environ.get(
            "SKA_PST_FFT_PRECISION", "high"
        ).lower(),
        "dm": dm,
        "n_compared": int(diff.size),
        "mean_diff_db": float(dB(diff.mean() / ref.mean())),
        "max_diff_db": float(dB(diff.max() / ref.max())),
    }
    report["pass"] = bool(report["mean_diff_db"] < -50.0)
    os.makedirs(products_dir, exist_ok=True)
    out = os.path.join(products_dir, "report.dedispersion.tpu.json")
    with open(out, "w") as f:
        json.dump(report, f, cls=NumpyEncoder, indent=2)
    print(json.dumps(report), flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

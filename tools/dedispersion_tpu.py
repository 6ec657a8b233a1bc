"""On-chip dedispersion round trip through the fused Pallas path.

The spectral_filter slot (ops/synthesis.py; native analog of dspsr's
convolution-during-inversion, reference
python/verify/test_dedispersion.py:54-321) is verified elsewhere through
the composed-XLA path only. This tool drives the coherent-dedispersion
chirp through the COMPILED fused chain's elementwise hook — analysis_fused
→ synthesis_fused → ifft_fused's elem constant — on the real chip:

  gate:  the fused elem-hook inversion must match the COMPOSED
         spectral_filter inversion on hardware to fp32 class (max rel
         diff < 1e-4) — implementation equivalence of the hook;
  info:  both are also compared against whole-stream dedispersion of the
         unfiltered inversion; the per-block chirp approximation bounds
         that near -30 dB (chirp tails beyond the overlap-save discard —
         identical for composed and fused, so it is recorded, not gated;
         the reference's whole-stream commutation gate lives in
         verify/test_dedispersion.py and passes at ~ -52 dB).

Writes products/report.dedispersion.tpu.json; exits nonzero on gate fail.

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
    # overlap-save validity: the chirp's (one-sided) dispersion delay must
    # fit inside the per-side discard output_overlap = 9216 samples;
    # at 1405 MHz / 40 MHz band the delay is ~4792*dm samples, so dm <=
    # 1.92 — the config's 2.64476 (delay 12.7k samples) is only valid for
    # whole-stream dedispersion, and BOTH the composed and fused
    # in-inversion paths measure -22 dB against it (block-wrap leakage,
    # not a kernel defect)
    dm, f0, bw = 1.5, 1405.0, 40.0
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

    from ska_pst_dsp_tpu.ops import polyphase_analysis, polyphase_synthesis

    # path B: the fused chain with the chirp riding the elem hook
    b = run(h)

    # path C: the COMPOSED chain with the same spectral_filter, also on
    # the chip — the gate is implementation equivalence of the fused elem
    # hook against the composed spectral-filter slot ON HARDWARE
    chan = polyphase_analysis(
        (xr, xi), filt, n_chan, os_f
    )
    cr, ci = polyphase_synthesis(
        chan, L, os_f, input_overlap=ov,
        deripple_coeff=filt if config.deripple else None,
        temporal_taper=config.temporal_taper, spectral_filter=h,
    )
    c = (
        np.asarray(cr).astype(np.float64)
        + 1j * np.asarray(ci).astype(np.float64)
    ).reshape(-1)

    m = min(b.size, c.size)
    scale = np.abs(c[:m]).max()
    impl_err = np.abs(b[:m] - c[:m]).max() / scale

    # informational: commutation against whole-stream dedispersion — the
    # per-block chirp approximation bounds this near -30 dB (tails beyond
    # the overlap-save discard), identically for composed and fused
    plain = run(None)
    a = dedispersion.dedisperse(plain[None], dm, f0, bw)[0]
    mm = min(a.size, b.size)
    guard = mm // 8
    diff = np.abs(b[guard: mm - guard] - a[guard: mm - guard]) ** 2
    ref = np.abs(a[guard: mm - guard]) ** 2
    report = {
        "config": "low",
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "kernel_path": "analysis_fused+synthesis_fused+ifft_fused(elem)",
        "fft_precision": os.environ.get(
            "SKA_PST_FFT_PRECISION", "high"
        ).lower(),
        "dm": dm,
        "n_compared": int(m),
        "fused_vs_composed_max_rel": float(impl_err),
        "blockwise_vs_wholestream_mean_db": float(
            dB(diff.mean() / ref.mean())
        ),
        "blockwise_vs_wholestream_max_db": float(
            dB(diff.max() / ref.max())
        ),
    }
    report["pass"] = bool(impl_err < 1e-4)
    os.makedirs(products_dir, exist_ok=True)
    out = os.path.join(products_dir, "report.dedispersion.tpu.json")
    with open(out, "w") as f:
        json.dump(report, f, cls=NumpyEncoder, indent=2)
    print(json.dumps(report), flush=True)
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())

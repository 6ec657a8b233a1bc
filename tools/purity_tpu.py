"""On-chip purity sweep through the COMPILED fused Pallas path.

The −60 dB purity gates (TestPureTone.m:20, TestImpulse.m:26 in the
reference; CSP_Low_PST_REQ-627/697, CSP_Mid_PST_REQ-385/386) are verified
elsewhere in this repo through the composed-XLA/CPU kernels and
interpret-mode differentials. This tool closes the remaining hole: it runs
the temporal (impulse) and spectral (tone) sweeps — with the adversarial
block-boundary ± overlap placement of current_performance.m:60-96 —
through the Mosaic-compiled kernels that produce the headline bench
numbers, ON THE REAL TPU CHIP:

  low: analysis_fused → synthesis_fused (fused in-VMEM IFFT epilogue),
       time-major keep_padding/valid_len handoff — byte-for-byte the
       bench.py forward;
  mid: analysis_padded_fused (production 100353-tap filter) →
       synthesis_fused → ifft_big (out-of-core 1.8M-point IFFT).

Writes products/report.purity.tpu.<cfg>.json with per-point max/total
spurious dB, the worst in-window value, the FFT GEMM precision mode used,
and the gate verdict. Exits nonzero if any in-window point exceeds −60 dB.

    python tools/purity_tpu.py -c low -n 16
    python tools/purity_tpu.py -c mid -n 6

Run on the real chip (leave JAX_PLATFORMS alone); every sweep point shares
one compiled executable (shapes are constant across points), so the remote
compile cost is paid once per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

from ska_pst_dsp_tpu.cli.current_performance import (  # noqa: E402
    chop, freq_domain_offsets, time_domain_offsets,
)
from ska_pst_dsp_tpu.data_gen.config import products_dir  # noqa: E402
from ska_pst_dsp_tpu.data_gen.generate_test_vector import (  # noqa: E402
    complex_sinusoid, time_domain_impulse,
)
from ska_pst_dsp_tpu.data_gen.util import NumpyEncoder  # noqa: E402
from ska_pst_dsp_tpu.utils import geometry  # noqa: E402
from ska_pst_dsp_tpu.utils.config import load_config  # noqa: E402
from ska_pst_dsp_tpu.verify.util import DomainPerformance  # noqa: E402


def fused_pipeline(config, filt, interpret: bool = False):
    """The fused-kernel forward for a config — the same kernel chain and
    handoffs bench.py times (time-major, keep_padding/valid_len).
    ``interpret=True`` runs the kernels in Pallas interpret mode (CPU
    plumbing validation only — not a hardware product)."""
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )

    os_f = config.os_factor
    n_chan = config.channels
    use_padded = config.analysis_function == "polyphase_analysis_padded"
    deripple = filt if config.deripple else None

    if use_padded:
        from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
            polyphase_analysis_padded_fused,
        )

        def forward(xr, xi):
            cr, ci = polyphase_analysis_padded_fused(
                (xr, xi), filt, n_chan, os_f, time_major=True,
                interpret=interpret,
            )
            return polyphase_synthesis_fused(
                (cr, ci), config.input_fft_length, os_f,
                input_overlap=config.input_overlap, deripple_coeff=deripple,
                temporal_taper=config.temporal_taper, time_major_in=True,
                interpret=interpret,
            )
    else:
        from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
            polyphase_analysis_fused,
        )

        def forward(xr, xi):
            (cr, ci), nb = polyphase_analysis_fused(
                (xr, xi), filt, n_chan, os_f, time_major=True,
                keep_padding=True, interpret=interpret,
            )
            return polyphase_synthesis_fused(
                (cr, ci), config.input_fft_length, os_f,
                input_overlap=config.input_overlap, deripple_coeff=deripple,
                temporal_taper=config.temporal_taper, time_major_in=True,
                valid_len=nb, interpret=interpret,
            )

    def run(signal):
        xr = np.ascontiguousarray(signal.real, dtype=np.float32)[None]
        xi = np.ascontiguousarray(signal.imag, dtype=np.float32)[None]
        rr, ri = forward(xr, xi)
        return (
            np.asarray(rr).astype(np.float64)
            + 1j * np.asarray(ri).astype(np.float64)
        ).reshape(-1)

    return run


def subsample(arr, n):
    """Keep at most n points, evenly spread (always keep first/last)."""
    arr = np.asarray(arr)
    if arr.size <= n:
        return arr
    idx = np.unique(np.linspace(0, arr.size - 1, n).round().astype(int))
    return arr[idx]


def sweep(cfg_name: str, npoints: int, out_path: str,
          interpret: bool = False) -> int:
    import jax

    config = load_config(cfg_name)
    os_f = config.os_factor
    filt = config.load_fir_filter_coeff()
    block_size = os_f.normalize(config.input_fft_length) * config.channels
    output_overlap = os_f.normalize(config.input_overlap) * config.channels
    nblocks = config.blocks
    n_samples = block_size * nblocks
    filt_offset = (filt.size - 1) // 2 + output_overlap
    padded = config.analysis_function == "polyphase_analysis_padded"
    shift = geometry.total_sample_shift(
        config.channels, os_f, config.fir_filter_taps, config.input_overlap,
        padded=padded,
    )
    perf = DomainPerformance(guard=2)
    run = fused_pipeline(config, filt, interpret=interpret)

    report = {
        "config": cfg_name,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "fft_precision": os.environ.get(
            "SKA_PST_FFT_PRECISION", "high"
        ).lower(),
        "kernel_path": (
            "analysis_padded_fused+synthesis_fused+ifft_big" if padded
            else "analysis_fused+synthesis_fused+ifft_fused"
        ),
        "n_samples": int(n_samples),
        "requirement_dB": -60.0,
    }
    if report["backend"] == "cpu" and not interpret:
        raise SystemExit(
            "purity_tpu must run on the real chip (backend is cpu) — the "
            "point of this product is the Mosaic-compiled path"
        )
    if interpret:
        report["kernel_path"] += "+INTERPRET(plumbing check only)"

    # temporal: impulse at inversion block boundaries, boundaries +-
    # output_overlap, block strides, and a uniform sweep
    offsets = subsample(
        time_domain_offsets(
            npoints, block_size, nblocks, config.input_overlap,
            output_overlap, filt_offset, n_samples,
        ),
        2 * npoints,
    )
    temporal = []
    t0 = time.time()
    for off in offsets:
        sig = time_domain_impulse(
            n_samples, [int(off)], [1], dtype=np.complex64
        )
        inv = run(sig)
        ichop, vchop = chop(config, sig, inv, {})
        if vchop.size == 0:
            continue
        in_window = 0 <= off - shift < vchop.size
        r = perf.temporal_performance(vchop) if in_window else {}
        r.update(perf.temporal_difference(ichop, vchop))
        r["offset"] = int(off)
        r["in_window"] = bool(in_window)
        temporal.append(r)
        print(f"temporal offset={off}: {r}", flush=True)
    report["temporal"] = temporal
    report["temporal_seconds"] = round(time.time() - t0, 1)

    # spectral: tones at exact analysis bins stepping through the band
    freqs = subsample(
        freq_domain_offsets(npoints, block_size, nblocks), npoints
    )
    spectral = []
    t0 = time.time()
    for fq in freqs:
        sig = complex_sinusoid(
            n_samples, [int(fq)], [np.pi / 4], dtype=np.complex64
        )
        inv = run(sig)
        ichop, vchop = chop(config, sig, inv, {})
        if vchop.size == 0:
            continue
        nfft = (vchop.size // block_size) * block_size
        r = perf.spectral_performance(vchop, nfft)
        r.update(perf.temporal_difference(ichop, vchop))
        r["frequency"] = int(fq)
        spectral.append(r)
        print(f"spectral freq={fq}: {r}", flush=True)
    report["spectral"] = spectral
    report["spectral_seconds"] = round(time.time() - t0, 1)

    worst = max(
        (r["max_spurious"] for rs in (temporal, spectral) for r in rs
         if "max_spurious" in r and r.get("in_window", True)),
        default=float("-inf"),
    )
    report["worst_in_window_max_spurious_dB"] = worst
    report["pass"] = bool(worst <= -60.0)

    os.makedirs(products_dir, exist_ok=True)
    with open(out_path, "w") as f:
        json.dump(report, f, cls=NumpyEncoder, indent=2)
    print(f"worst in-window max_spurious: {worst:.1f} dB "
          f"({'PASS' if report['pass'] else 'FAIL'}) -> {out_path}",
          flush=True)
    return 0 if report["pass"] else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("-c", "--config", dest="cfg", default="low",
                   choices=["low", "mid"])
    p.add_argument("-n", "--npoints", type=int, default=None)
    p.add_argument("--interpret", action="store_true",
                   help="Pallas interpret mode on CPU (plumbing check; "
                        "writes to --out only)")
    p.add_argument("--out", default=None)
    a = p.parse_args(argv)
    if a.interpret:
        # interpret mode must run on REAL cpu: the JAX_PLATFORMS env var is
        # overridden by the TPU plugin here, and interpret-on-TPU silently
        # degrades in-kernel bf16x3 dots to bf16 accumulation (~1.7e-3) —
        # only the programmatic platform switch actually selects CPU
        import jax

        jax.config.update("jax_platforms", "cpu")
    npoints = a.npoints or (16 if a.cfg == "low" else 6)
    out = a.out or os.path.join(
        products_dir, f"report.purity.tpu.{a.cfg}.json"
    )
    return sweep(a.cfg, npoints, out, interpret=a.interpret)


if __name__ == "__main__":
    raise SystemExit(main())

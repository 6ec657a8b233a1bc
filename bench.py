"""Benchmark: flagship SKA-Low round trip (analysis + Golden inversion) on
one TPU chip. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
computed against the NumPy oracle executing the same math on this host's
CPU — the stand-in for the reference's single-threaded implementation.
"""

import json
import sys
import time

import numpy as np


def _build(n_dat):
    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.utils.rational import Rational

    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48
    filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
    rng = np.random.default_rng(0)
    x = (
        rng.standard_normal((2, 1, n_dat)) + 1j * rng.standard_normal((2, 1, n_dat))
    ).astype(np.complex64)
    return os_f, filt, n_chan, L, ov, x


def bench_tpu(n_dat=2**22, reps=10):
    import jax
    from ska_pst_dsp_tpu.ops import polyphase_analysis, polyphase_synthesis

    os_f, filt, n_chan, L, ov, x = _build(n_dat)

    def forward(xx):
        chan = polyphase_analysis(xx, filt, n_chan, os_f)
        return polyphase_synthesis(
            chan, L, os_f, input_overlap=ov, deripple_coeff=filt,
            temporal_taper="tukey",
        )

    fwd = jax.jit(forward)
    xd = jax.device_put(x)
    fwd(xd).block_until_ready()  # compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(xd)
    out.block_until_ready()
    dt = (time.perf_counter() - t0) / reps
    # complex input samples processed per second (both pols)
    return (x.shape[0] * n_dat) / dt


def bench_oracle_cpu(n_dat=2**19):
    """Single-threaded NumPy oracle running the same math — the proxy for
    the reference implementation's per-core throughput."""
    from ska_pst_dsp_tpu import oracle
    from ska_pst_dsp_tpu.utils import windows

    os_f, filt, n_chan, L, ov, x = _build(n_dat)
    t0 = time.perf_counter()
    chan = oracle.polyphase_analysis(x, filt, n_chan, os_f)
    oracle.polyphase_synthesis(
        chan, L, os_f, input_overlap=ov, deripple_coeff=filt,
        temporal_taper=windows.tukey_window(L, ov).astype(np.float64),
    )
    dt = time.perf_counter() - t0
    return (x.shape[0] * n_dat) / dt


def main():
    value = bench_tpu()
    try:
        baseline = bench_oracle_cpu()
    except Exception:
        baseline = None
    print(
        json.dumps(
            {
                "metric": "low_roundtrip_throughput",
                "value": round(value / 1e6, 3),
                "unit": "Msamples/s/chip",
                "vs_baseline": round(value / baseline, 2) if baseline else None,
            }
        )
    )


if __name__ == "__main__":
    main()

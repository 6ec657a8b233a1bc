"""Benchmark: flagship SKA-Low round trip (analysis + Golden inversion) on
one TPU chip. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The reference publishes no throughput numbers (BASELINE.md); vs_baseline is
computed against the NumPy oracle executing the same math on this host's
CPU — the stand-in for the reference's single-threaded implementation.

Measurement: the forward step is chained ``reps`` times inside one jitted
``lax.scan`` whose carry creates a data dependency between iterations (so
XLA cannot hoist or elide any of them), and only ONE scalar leaves the
device. This times pure device execution — full-array device→host transfers
over the tunnelled TPU carry seconds of latency and would otherwise swamp
the measurement by 100x.

The compute path is split-complex with matmul DFTs (ska_pst_dsp_tpu.ops.cfft)
— the TPU backend here has no complex dtype / FFT op. On TPU the analysis
stage runs the fused Pallas kernel (ops/pallas/analysis_fused).
"""

import json
import time

import numpy as np


def _build(n_dat):
    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.utils.rational import Rational

    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48
    filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
    rng = np.random.default_rng(0)
    xr = rng.standard_normal((2, n_dat)).astype(np.float32)
    xi = rng.standard_normal((2, n_dat)).astype(np.float32)
    return os_f, filt, n_chan, L, ov, xr, xi


def bench_tpu(n_dat=2**21, reps=50):
    import jax
    import jax.numpy as jnp
    from ska_pst_dsp_tpu.ops import polyphase_analysis, polyphase_synthesis
    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )

    os_f, filt, n_chan, L, ov, xr, xi = _build(n_dat)
    on_tpu = jax.default_backend() not in ("cpu",)
    analysis = polyphase_analysis_fused if on_tpu else polyphase_analysis

    def forward(a, b):
        cr, ci = analysis((a, b), filt, n_chan, os_f)
        return polyphase_synthesis(
            (cr, ci), L, os_f, input_overlap=ov, deripple_coeff=filt,
            temporal_taper="tukey",
        )

    def chained(a, b):
        def body(c, _):
            # c*0 keeps a data dependency on the carry; s*1e-30 folds each
            # iteration's result back into it — serializes all reps.
            o = forward(a + c * 0, b)
            s = sum(map(jnp.sum, o))
            return c + s * 1e-30, s
        c, ss = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return ss.sum()

    ch = jax.jit(chained)
    ar = jax.device_put(xr)
    ai = jax.device_put(xi)
    float(ch(ar, ai))  # compile + warm
    t0 = time.perf_counter()
    float(ch(ar, ai))  # one scalar crosses the tunnel
    dt = (time.perf_counter() - t0) / reps
    return (xr.shape[0] * n_dat) / dt


def bench_oracle_cpu(n_dat=2**19):
    """Single-threaded NumPy oracle running the same math — the proxy for
    the reference implementation's per-core throughput."""
    from ska_pst_dsp_tpu import oracle
    from ska_pst_dsp_tpu.utils import windows

    os_f, filt, n_chan, L, ov, xr, xi = _build(n_dat)
    x = (xr + 1j * xi)[:, None, :]
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

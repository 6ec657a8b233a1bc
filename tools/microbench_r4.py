"""Round-4 perf validation: numeric check + per-stage timings of the
rewritten low-config kernels (analysis fold respill fix, transpose-free
128x384 ifft epilogue) on the real chip.

Each experiment prints one JSON line. Uses bench.py's host-loop carry
timer (lax.scan multiplies Mosaic compile ~50x through the remote-compile
tunnel and de-optimizes the loop body — see PERF_NOTES.md).

    python tools/microbench_r4.py [numeric|timing|all]
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import bench  # noqa: E402  (repo-root bench.py: _chain_timer, cache setup)


def report(exp, **kw):
    print(json.dumps({"exp": exp, **kw}), flush=True)


def numeric_check():
    """Fused low round trip on-chip vs the fp64 NumPy oracle."""
    import jax

    from ska_pst_dsp_tpu import oracle
    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )
    from ska_pst_dsp_tpu.utils import windows
    from ska_pst_dsp_tpu.utils.rational import Rational

    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48
    n_dat = 2 ** 20
    filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
    rng = np.random.default_rng(7)
    x = (
        rng.standard_normal((1, 1, n_dat))
        + 1j * rng.standard_normal((1, 1, n_dat))
    ).astype(np.complex128)

    xr = np.ascontiguousarray(x.real[:, 0]).astype(np.float32)
    xi = np.ascontiguousarray(x.imag[:, 0]).astype(np.float32)
    (cr, ci), nb = polyphase_analysis_fused(
        (xr, xi), filt, n_chan, os_f, time_major=True, keep_padding=True
    )
    rr, ri = polyphase_synthesis_fused(
        (cr, ci), L, os_f, input_overlap=ov, deripple_coeff=filt,
        temporal_taper="tukey", time_major_in=True, valid_len=nb,
    )
    got = np.asarray(rr).ravel() + 1j * np.asarray(ri).ravel()

    chan = oracle.polyphase_analysis(x, filt, n_chan, os_f)
    ref = oracle.polyphase_synthesis(
        chan, L, os_f, input_overlap=ov, deripple_coeff=filt,
        temporal_taper=windows.tukey_window(L, ov).astype(np.float64),
    )[0, 0]
    m = min(got.size, ref.size)
    err = np.abs(got[:m] - ref[:m]).max()
    scale = np.abs(ref).max()
    report("numeric_low_roundtrip_vs_oracle", max_abs_err=float(err),
           scale=float(scale), rel=float(err / scale), n=m,
           ok=bool(err <= 5e-5 * scale))
    return err <= 5e-5 * scale


def timings(n_dat=2 ** 23, reps=30):
    import jax

    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.ifft_fused import (
        fused_big_ifft, plan_ifft,
    )
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )
    from ska_pst_dsp_tpu.utils import geometry
    from ska_pst_dsp_tpu.utils.rational import Rational

    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48
    filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))

    def ana(a, b):
        (cr, ci), _ = polyphase_analysis_fused(
            (a, b), filt, n_chan, os_f, time_major=True, keep_padding=True
        )
        return cr, ci

    dt = bench._chain_timer(ana, (xr, xi), reps)
    report("analysis_fused", ms=round(dt * 1e3, 3),
           msps=round(2 * n_dat / dt / 1e6, 1))

    (cr0, ci0), nb = polyphase_analysis_fused(
        (xr, xi), filt, n_chan, os_f, time_major=True, keep_padding=True
    )
    cr0, ci0 = jax.device_put(np.asarray(cr0)), jax.device_put(np.asarray(ci0))

    def syn(a, b):
        return polyphase_synthesis_fused(
            (a, b), L, os_f, input_overlap=ov, deripple_coeff=filt,
            temporal_taper="tukey", time_major_in=True, valid_len=nb,
        )

    dt = bench._chain_timer(syn, (cr0, ci0), reps)
    report("synthesis_plus_ifft", ms=round(dt * 1e3, 3))

    # ifft epilogue alone on synthetic spectra
    geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
    n_big = geom.output_fft_length
    n_blocks = geom.n_blocks(nb)
    n2, n1 = plan_ifft(n_big, geom.output_overlap)
    fr = jax.device_put(
        rng.standard_normal((2, n_blocks, n_big)).astype(np.float32))
    fi = jax.device_put(
        rng.standard_normal((2, n_blocks, n_big)).astype(np.float32))

    def ep(a, b):
        return fused_big_ifft(
            a, b, shape_key=(n_big, n2, n1, geom.output_overlap,
                             geom.fn_width // 2, 0.75),
        )

    dt = bench._chain_timer(ep, (fr, fi), reps)
    report("ifft_epilogue", ms=round(dt * 1e3, 3), n_blocks=int(n_blocks))

    def full(a, b):
        (cr, ci), v = polyphase_analysis_fused(
            (a, b), filt, n_chan, os_f, time_major=True, keep_padding=True
        )
        return polyphase_synthesis_fused(
            (cr, ci), L, os_f, input_overlap=ov, deripple_coeff=filt,
            temporal_taper="tukey", time_major_in=True, valid_len=v,
        )

    dt = bench._chain_timer(full, (xr, xi), reps)
    report("low_roundtrip", ms=round(dt * 1e3, 3),
           msps=round(2 * n_dat / dt / 1e6, 1))


def timing_ana_only(n_dat=2 ** 23, reps=30):
    import jax

    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )
    from ska_pst_dsp_tpu.utils.rational import Rational

    os_f = Rational(4, 3)
    filt = fir.design_pfb_fir_filter(256, os_f, 12)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))

    def ana(a, b):
        (cr, ci), _ = polyphase_analysis_fused(
            (a, b), filt, 256, os_f, time_major=True, keep_padding=True
        )
        return cr, ci

    dt = bench._chain_timer(ana, (xr, xi), reps)
    report("analysis_fused", ms=round(dt * 1e3, 3),
           tile_cap=os.environ.get("SKA_PST_ANALYSIS_TILE_CAP", "128"))


def timing_mid(reps=10):
    import jax

    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
        polyphase_analysis_padded_fused, _fold_call,
    )
    from ska_pst_dsp_tpu.ops import analysis as _ana
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )
    from ska_pst_dsp_tpu.utils import geometry
    from ska_pst_dsp_tpu.utils.rational import Rational

    os_f = Rational(8, 7)
    n_chan, L, ov = 4096, 512, 128
    filt = fir.design_pfb_fir_filter_two_stage(n_chan, os_f, 28)
    geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
    n_dat = (2 * ov + 4 * geom.input_keep) * geometry.analysis_step(
        n_chan, os_f)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))

    def ana(a, b):
        return polyphase_analysis_padded_fused(
            (a, b), filt, n_chan, os_f, time_major=True)

    dt = bench._chain_timer(ana, (xr, xi), reps)
    report("mid_analysis_full", ms=round(dt * 1e3, 3),
           msps=round(2 * n_dat / dt / 1e6, 1))

    # fold kernel alone
    f2d_rev = _ana._prep_filter(filt, n_chan, reverse=True)
    fl = f2d_rev.shape[0] * n_chan
    import jax.numpy as jnp
    xp = jnp.pad(xr, [(0, 0), (fl, 0)])
    step = geometry.analysis_step(n_chan, os_f)
    # replicate the wrapper's padding
    from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import _plan
    tile_k, sup_l, sup_a, nrows = _plan(n_chan, step, fl)
    nblocks = n_dat // step
    nbp = max(1, -(-nblocks // tile_k))
    n_pad = nbp * tile_k * step + (nrows * sup_l + n_chan - tile_k * step)
    xp = jnp.pad(xp, [(0, 0), (0, max(0, n_pad - xp.shape[1]))])[:, :n_pad]
    xp = jax.device_put(np.asarray(xp))
    f2dj = jax.device_put(np.asarray(f2d_rev))

    def fold_only(a, b):
        return _fold_call(a, b, f2dj, block=n_chan, step=step, fl=fl)

    dt = bench._chain_timer(fold_only, (xp, xp), reps)
    report("mid_fold_kernel", ms=round(dt * 1e3, 3))

    # synthesis + ifft_big on precomputed channels
    cr, ci = polyphase_analysis_padded_fused(
        (xr, xi), filt, n_chan, os_f, time_major=True)
    cr = jax.device_put(np.asarray(cr))
    ci = jax.device_put(np.asarray(ci))

    def syn(a, b):
        return polyphase_synthesis_fused(
            (a, b), L, os_f, input_overlap=ov, deripple_coeff=filt,
            temporal_taper="tukey", time_major_in=True)

    dt = bench._chain_timer(syn, (cr, ci), reps)
    report("mid_synthesis_ifft", ms=round(dt * 1e3, 3))


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    if what in ("numeric", "all"):
        numeric_check()
    if what in ("timing", "all"):
        timings()
    if what == "ana":
        timing_ana_only()
    if what == "mid":
        timing_mid()


if __name__ == "__main__":
    main()

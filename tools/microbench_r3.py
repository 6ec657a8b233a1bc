"""Round-3 perf diagnosis: time kernel variants on the real chip to locate
where the low-config round trip spends its 4.4 ms (vs ~0.5 ms roofline).

Each experiment prints one JSON line {"exp": ..., "ms": ...}. Run under
tmux on the TPU; compiles are ~minutes each through the tunnel.
"""
import functools
import json
import math
import sys
import time

import numpy as np


def timeit(fn, args, reps=30):
    import jax
    import jax.numpy as jnp

    def chained(*a):
        def body(c, _):
            o = fn(*(x + c * 0 if i == 0 else x for i, x in enumerate(a)))
            if not isinstance(o, (tuple, list)):
                o = (o,)
            s = sum(map(jnp.sum, o))
            return c + s * 1e-30, s

        c, ss = jax.lax.scan(body, jnp.float32(0), None, length=reps)
        return ss.sum()

    ch = jax.jit(chained)
    float(ch(*args))
    t0 = time.perf_counter()
    float(ch(*args))
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def report(exp, ms, extra=None):
    d = {"exp": exp, "ms": round(ms, 4)}
    if extra:
        d.update(extra)
    print(json.dumps(d), flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.ops import cfft
    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.ifft_fused import fused_big_ifft, plan_ifft
    from ska_pst_dsp_tpu.utils.rational import Rational
    from ska_pst_dsp_tpu.utils import geometry

    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48
    n_dat = 2**21
    filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
    rng = np.random.default_rng(0)
    xr = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))

    which = set(sys.argv[1:]) or None

    def want(name):
        return which is None or name in which

    # --- 1. full fused analysis (as benched) --------------------------------
    if want("analysis"):
        ms = timeit(
            lambda a, b: polyphase_analysis_fused(
                (a, b), filt, n_chan, os_f, time_major=True
            ),
            (xr, xi),
        )
        report("analysis_full", ms)

    # --- 2. analysis with short filters: fold-cost scaling ------------------
    if want("foldscale"):
        for nph in (1, 4, 8):
            f_short = np.asarray(filt)[: nph * n_chan]
            ms = timeit(
                lambda a, b, f=f_short: polyphase_analysis_fused(
                    (a, b), f, n_chan, os_f, time_major=True
                ),
                (xr, xi),
            )
            report(f"analysis_phases{nph}", ms)

    # --- 3. staging cost alone (the A pre-shifted copies) -------------------
    if want("staging"):
        step = geometry.analysis_step(n_chan, os_f)
        sup_a = math.lcm(step, n_chan) // step
        n_shift = n_dat - sup_a * step

        @jax.jit
        def stage(a, b):
            return (
                jnp.stack([
                    jax.lax.dynamic_slice_in_dim(a, k * step, n_shift, axis=1)
                    for k in range(sup_a)
                ]),
                jnp.stack([
                    jax.lax.dynamic_slice_in_dim(b, k * step, n_shift, axis=1)
                    for k in range(sup_a)
                ]),
            )

        report("staging_a4", timeit(stage, (xr, xi)))

    # --- 4. synthesis from time-major fine channels -------------------------
    step = geometry.analysis_step(n_chan, os_f)
    fl = geometry.padded_filter_length(np.asarray(filt).size, n_chan)
    nblocks = (n_dat - fl) // step
    cr = jax.device_put(
        rng.standard_normal((2, nblocks, n_chan)).astype(np.float32)
    )
    ci = jax.device_put(
        rng.standard_normal((2, nblocks, n_chan)).astype(np.float32)
    )
    if want("synthesis"):
        ms = timeit(
            lambda a, b: polyphase_synthesis_fused(
                (a, b), L, os_f, input_overlap=ov, deripple_coeff=filt,
                temporal_taper="tukey", time_major_in=True,
            ),
            (cr, ci),
        )
        report("synthesis_full", ms)

    # --- 5. the fused big IFFT alone ----------------------------------------
    if want("ifft"):
        geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
        nb = geom.n_blocks(nblocks)
        n_big = geom.output_fft_length
        n2, n1 = plan_ifft(n_big, geom.output_overlap)
        fr = jax.device_put(
            rng.standard_normal((2, nb, n_big)).astype(np.float32)
        )
        fi = jax.device_put(
            rng.standard_normal((2, nb, n_big)).astype(np.float32)
        )
        ms = timeit(
            lambda a, b: fused_big_ifft(
                a, b, None, None,
                shape_key=(n_big, n2, n1, geom.output_overlap, geom.fn_width // 2,
                           0.75),
                has_elem=False,
            ),
            (fr, fi),
        )
        report("ifft_full", ms, {"nb": nb, "n_big": n_big})

    # --- 6. precision=default (single-pass GEMMs) everywhere ----------------
    if want("prec"):
        jax.clear_caches()
        cfft._PRECISION = None
        cfft._KERNEL_PRECISION = None
        ms = timeit(
            lambda a, b: polyphase_analysis_fused(
                (a, b), filt, n_chan, os_f, time_major=True
            ),
            (xr, xi),
        )
        report("analysis_prec_default", ms)
        ms = timeit(
            lambda a, b: polyphase_synthesis_fused(
                (a, b), L, os_f, input_overlap=ov, deripple_coeff=filt,
                temporal_taper="tukey", time_major_in=True,
            ),
            (cr, ci),
        )
        report("synthesis_prec_default", ms)
        jax.clear_caches()
        cfft._PRECISION = jax.lax.Precision.HIGH
        cfft._KERNEL_PRECISION = jax.lax.Precision.HIGHEST


def extra_experiments():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from ska_pst_dsp_tpu.ops import cfft
    from ska_pst_dsp_tpu.ops.pallas import analysis_fused
    from ska_pst_dsp_tpu.ops.pallas.ifft_fused import fused_big_ifft, plan_ifft
    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.utils import geometry
    from ska_pst_dsp_tpu.utils.rational import Rational

    which = set(sys.argv[1:]) or None

    def want(name):
        return which is None or name in which

    rng = np.random.default_rng(0)
    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48

    # pipeline floor: same in/out block shapes as the fused IFFT, compute
    # replaced by one add — measures Pallas per-step + DMA floor
    if want("pipe_floor"):
        geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
        nb, n_big = 67, geom.output_fft_length
        n2, n1, kb, keep2 = 96, 512, 4, 640
        fr = jax.device_put(rng.standard_normal((2, 68, n2, n1)).astype(np.float32))
        fi = jax.device_put(rng.standard_normal((2, 68, n2, n1)).astype(np.float32))

        def kern(xr, xi, o_ref):
            for b in range(kb):
                o_ref[0, b] = jnp.concatenate(
                    [xr[0, b] + xi[0, b], xr[0, b, :, : keep2 - n1]], axis=1
                )

        @jax.jit
        def run(a, b):
            return pl.pallas_call(
                kern,
                grid=(2, 17),
                in_specs=[
                    pl.BlockSpec((1, kb, n2, n1), lambda p, t: (p, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, kb, n2, n1), lambda p, t: (p, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((1, kb, n2, keep2), lambda p, t: (p, t, 0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[jax.ShapeDtypeStruct((2, 68, n2, keep2), jnp.float32)],
            )(a, b)[0]

        report("pipe_floor_ifft_shape", timeit(run, (fr, fi)))

    if want("ifft_prec"):
        jax.clear_caches()
        cfft._PRECISION = None
        cfft._KERNEL_PRECISION = None
        geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
        nb, n_big = 67, geom.output_fft_length
        n2, n1 = plan_ifft(n_big, geom.output_overlap)
        fr = jax.device_put(rng.standard_normal((2, nb, n_big)).astype(np.float32))
        fi = jax.device_put(rng.standard_normal((2, nb, n_big)).astype(np.float32))
        ms = timeit(
            lambda a, b: fused_big_ifft(
                a, b, None, None,
                shape_key=(n_big, n2, n1, geom.output_overlap,
                           geom.fn_width // 2, 0.75),
                has_elem=False,
            ),
            (fr, fi),
        )
        report("ifft_prec_default", ms)
        jax.clear_caches()
        cfft._PRECISION = jax.lax.Precision.HIGH
        cfft._KERNEL_PRECISION = jax.lax.Precision.HIGHEST

    if want("analysis_big_tile"):
        analysis_fused._SPAN_BUDGET = 4 * 1024 * 1024
        filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
        xr = jax.device_put(rng.standard_normal((2, 2**21)).astype(np.float32))
        xi = jax.device_put(rng.standard_normal((2, 2**21)).astype(np.float32))
        ms = timeit(
            lambda a, b: analysis_fused.polyphase_analysis_fused(
                (a, b), filt, n_chan, os_f, time_major=True
            ),
            (xr, xi),
        )
        report("analysis_tile_big", ms,
               {"tile_k": analysis_fused._plan(256, 192, 3328, 4)[0]})




def r3_stages():
    """Round-3 session-2 stage timings (run with the persistent compile
    cache enabled via bench._enable_compile_cache)."""
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
    import jax
    import bench as _bench  # enables the compile cache on import
    from ska_pst_dsp_tpu.design import fir
    from ska_pst_dsp_tpu.utils import geometry
    from ska_pst_dsp_tpu.utils.rational import Rational
    from ska_pst_dsp_tpu.ops.pallas.analysis_fused import (
        polyphase_analysis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.analysis_padded_fused import (
        polyphase_analysis_padded_fused, _fold_call, _plan as _pplan,
    )
    from ska_pst_dsp_tpu.ops.pallas.synthesis_fused import (
        polyphase_synthesis_fused,
    )
    from ska_pst_dsp_tpu.ops.pallas.ifft_big import (
        fused_big_ifft_oc, plan_big_ifft,
    )
    from ska_pst_dsp_tpu.ops.pallas.ifft_fused import fused_big_ifft, plan_ifft
    from ska_pst_dsp_tpu.ops import cfft

    which = set(sys.argv[2:]) or None

    def want(name):
        return which is None or name in which

    rng = np.random.default_rng(0)

    def timeit2(fn, args, reps=20):
        import jax.numpy as jnp

        @jax.jit
        def step(c, *a):
            o = fn(*(x + c if i == 0 else x for i, x in enumerate(a)))
            if not isinstance(o, (tuple, list)):
                o = (o,)
            return c + sum(map(jnp.sum, o)) * 1e-30

        c = step(jnp.float32(0), *args)
        float(c)
        t0 = time.perf_counter()
        for _ in range(reps):
            c = step(c, *args)
        float(c)
        return (time.perf_counter() - t0) / reps * 1e3

    # ---------------- low stages ----------------
    os_f = Rational(4, 3)
    n_chan, L, ov = 256, 256, 48
    filt = fir.design_pfb_fir_filter(n_chan, os_f, 12)
    n_dat = 2**22
    xr = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))
    xi = jax.device_put(rng.standard_normal((2, n_dat)).astype(np.float32))

    if want("low_analysis"):
        ms = timeit2(
            lambda a, b: polyphase_analysis_fused(
                (a, b), filt, n_chan, os_f, time_major=True,
                keep_padding=True,
            )[0],
            (xr, xi),
        )
        report("low_analysis", ms, {"msps": round(2 * n_dat / ms / 1e3, 1)})

    step_lo = geometry.analysis_step(n_chan, os_f)
    nb_fine = (n_dat - 3328) // step_lo
    cr = jax.device_put(
        rng.standard_normal((2, nb_fine, n_chan)).astype(np.float32))
    ci = jax.device_put(
        rng.standard_normal((2, nb_fine, n_chan)).astype(np.float32))
    if want("low_synthesis"):
        ms = timeit2(
            lambda a, b: polyphase_synthesis_fused(
                (a, b), L, os_f, input_overlap=ov, deripple_coeff=filt,
                temporal_taper="tukey", time_major_in=True,
            ),
            (cr, ci),
        )
        report("low_synthesis", ms,
               {"msps_raw_equiv": round(2 * n_dat / ms / 1e3, 1)})

    if want("low_ifft"):
        geom = geometry.SynthesisGeometry(n_chan, L, ov, os_f)
        nb = geom.n_blocks(nb_fine)
        n_big = geom.output_fft_length
        n2, n1 = plan_ifft(n_big, geom.output_overlap)
        fr = jax.device_put(
            rng.standard_normal((2, nb, n_big)).astype(np.float32))
        fi = jax.device_put(
            rng.standard_normal((2, nb, n_big)).astype(np.float32))
        ms = timeit2(
            lambda a, b: fused_big_ifft(
                a, b, None, None,
                shape_key=(n_big, n2, n1, geom.output_overlap,
                           geom.fn_width // 2, 0.75),
                has_elem=False,
            ),
            (fr, fi),
        )
        report("low_ifft", ms, {"nb": nb})

    # ---------------- mid stages ----------------
    os_m = Rational(8, 7)
    n_chan_m, L_m, ov_m = 4096, 512, 128
    filt_m = fir.design_pfb_fir_filter_two_stage(n_chan_m, os_m, 28)
    geom_m = geometry.SynthesisGeometry(n_chan_m, L_m, ov_m, os_m)
    step_m = geometry.analysis_step(n_chan_m, os_m)
    n_dat_m = (2 * ov_m + 2 * geom_m.input_keep) * step_m
    mr = jax.device_put(rng.standard_normal((2, n_dat_m)).astype(np.float32))
    mi = jax.device_put(rng.standard_normal((2, n_dat_m)).astype(np.float32))

    if want("mid_fold"):
        from ska_pst_dsp_tpu.ops import analysis as _ana
        f2d_rev = jax.numpy.asarray(
            _ana._prep_filter(filt_m, n_chan_m, reverse=True))
        fl = f2d_rev.shape[0] * n_chan_m
        pad_r = jax.device_put(rng.standard_normal(
            (2, n_dat_m + fl + 200000)).astype(np.float32))
        pad_i = jax.device_put(rng.standard_normal(
            (2, n_dat_m + fl + 200000)).astype(np.float32))
        ms = timeit2(
            lambda a, b: _fold_call(
                a, b, f2d_rev, block=n_chan_m, step=step_m, fl=fl),
            (pad_r, pad_i), reps=10,
        )
        report("mid_fold", ms, {"msps": round(2 * n_dat_m / ms / 1e3, 1)})

    if want("mid_analysis"):
        ms = timeit2(
            lambda a, b: polyphase_analysis_padded_fused(
                (a, b), filt_m, n_chan_m, os_m, time_major=True),
            (mr, mi), reps=10,
        )
        report("mid_analysis", ms, {"msps": round(2 * n_dat_m / ms / 1e3, 1)})

    nbm = n_dat_m // step_m
    mcr = jax.device_put(
        rng.standard_normal((2, nbm, n_chan_m)).astype(np.float32))
    mci = jax.device_put(
        rng.standard_normal((2, nbm, n_chan_m)).astype(np.float32))
    if want("mid_synthesis"):
        ms = timeit2(
            lambda a, b: polyphase_synthesis_fused(
                (a, b), L_m, os_m, input_overlap=ov_m,
                deripple_coeff=filt_m, temporal_taper="tukey",
                time_major_in=True,
            ),
            (mcr, mci), reps=10,
        )
        report("mid_synthesis", ms,
               {"msps_raw_equiv": round(2 * n_dat_m / ms / 1e3, 1)})

    if want("mid_ifft"):
        nb2 = geom_m.n_blocks(nbm)
        n_big = geom_m.output_fft_length
        fp, fq, n1 = plan_big_ifft(n_big, geom_m.output_overlap)
        fr = jax.device_put(
            rng.standard_normal((2, nb2, n_big)).astype(np.float32))
        fi = jax.device_put(
            rng.standard_normal((2, nb2, n_big)).astype(np.float32))
        ms = timeit2(
            lambda a, b: fused_big_ifft_oc(
                a, b, None, None,
                shape_key=(n_big, fp, fq, n1, geom_m.output_overlap,
                           geom_m.fn_width // 2, 7 / 8),
                has_elem=False,
            ),
            (fr, fi), reps=10,
        )
        report("mid_ifft", ms, {"nb": nb2})

    if want("mid_fft4096"):
        g_r = jax.device_put(
            rng.standard_normal((2, nbm, n_chan_m)).astype(np.float32))
        g_i = jax.device_put(
            rng.standard_normal((2, nbm, n_chan_m)).astype(np.float32))
        ms = timeit2(lambda a, b: cfft.fft(a, b, axis=-1), (g_r, g_i),
                     reps=10)
        report("mid_fft4096_composed", ms)


if __name__ == "__main__":
    if "stages" in sys.argv:
        r3_stages()
    elif "extra" in sys.argv:
        extra_experiments()
    else:
        main()

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


if __name__ == "__main__":
    if "extra" in sys.argv:
        extra_experiments()
    else:
        main()

"""Fused Pallas fold for the zero-padded (SKA-Mid) analysis PFB.

The composed padded analysis (ops/analysis.py:_analysis_padded_core)
materializes the (nblocks, padded_taps) frame tensor — at the mid
production geometry that is a ~29x blow-up of the input (2.5 GB per bench
block) and its einsum re-reads it from HBM. This kernel fuses framing +
fold into ONE pallas_call that reads the input approximately once:

  * requires step % 128 == 0 (true for mid's 3584): every fold term
    x[k*step + m*block + j] then sits at a 128-aligned lane offset of a
    single (rows, lcm(step, block)) VMEM view of ONE contiguous DMA span
    per grid step — no pre-staged shifted copies at all (contrast
    analysis_fused.py, whose low-config step=192 needs 2);
  * scratch rows overlap by one block (row r covers
    [r*sup_l, (r+1)*sup_l + block)), so every fold term sits whole inside
    one row — no term ever crosses a row seam;
  * the reference's per-block reversal before the IFFT
    (polyphase_analysis_padded.m:138-142, oracle: g[..., ::-1] then ifft)
    NEVER happens: reverse-then-IFFT equals a forward FFT with a per-bin
    phase e^{-2pi i q/N}/N (index identity), so the fold output goes
    straight to the four-step matmul FFT (ops/cfft) and the phase rides
    the same elementwise pass as the derotation ramp.

Differential-tested against ops.polyphase_analysis_padded and the NumPy
oracle in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import geometry
from ...utils.rational import Rational
from .. import analysis as _analysis
from .. import cfft

#: VMEM budget for the double-buffered DMA spans (bytes).
_SPAN_BUDGET = 7 * 1024 * 1024


def _plan(block: int, step: int, fl: int):
    """Choose (TILE_K, SUP_L, SUP_A, NROWS): outputs per grid step, view
    row length, outputs per superblock, and span rows. Scratch rows are
    SUP_L + block wide — consecutive rows OVERLAP by one block, so every
    fold term x[k*step + m*block + j] sits whole inside one row (no
    row-crossing concat, which Mosaic cannot lower for offset-mismatched
    ref slices)."""
    sup_l = math.lcm(step, block)
    sup_a = sup_l // step

    def nrows(t):
        return -(-((t - 1) * step + fl) // sup_l)

    tile = sup_a
    while True:
        cand = tile * 2
        if (cand > 512
                or 2 * 2 * 2 * nrows(cand) * (sup_l + block) * 4
                > _SPAN_BUDGET):
            break
        tile = cand
    return tile, sup_l, sup_a, nrows(tile)


def _kernel(
    x_r, x_i,                # (P, n_pad) ANY/HBM, P even, front fl zeros
    f2d_ref,                 # (phases, block) VMEM — REVERSED filter
    or_ref, oi_ref,          # out (2, TILE_K, block) VMEM
    bufr, bufi,              # scratch (2 slots, NROWS, 2, SUP_L+block) VMEM
    sems,                    # DMA semaphores (2 slots, 2, NROWS)
    *,
    block: int, step: int, phases: int,
    tile_k: int, sup_l: int, sup_a: int, nrows: int,
):
    t = pl.program_id(1)
    pg = pl.program_id(0)
    n_t = pl.num_programs(1)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    # one DMA per span row into 4D scratch — rows overlap by one block so
    # no fold term ever crosses a row (see _plan). The fold below reads
    # each term as a *ref slice* of a row, never materializing the whole
    # span as a value (a single (2, NROWS*SUP_L) read blows Mosaic's
    # scoped-vmem stack at mid geometry: 52 MB measured vs the 16 MB limit)
    def dma(step_idx, slot_idx, c, r):
        hbm, buf = ((x_r, bufr), (x_i, bufi))[c]
        base = step_idx * tile_k * step  # multiple of sup_l (tile_k % sup_a == 0)
        # row index leads the (pol, lane) tile dims: slicing one row must
        # not cut the sublane tiling
        return pltpu.make_async_copy(
            hbm.at[pl.ds(2 * pg, 2), pl.ds(base + r * sup_l, sup_l + block)],
            buf.at[slot_idx, r],
            sems.at[slot_idx, c, r],
        )

    def start(step_idx, slot_idx):
        for c in range(2):
            for r in range(nrows):
                dma(step_idx, slot_idx, c, r).start()

    @pl.when(t == 0)
    def _():
        start(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start(t + 1, nxt)

    for c in range(2):
        for r in range(nrows):
            dma(t, slot, c, r).wait()

    ksup = tile_k // sup_a

    def fold(buf, out):
        for a in range(sup_a):
            acc = jnp.zeros((ksup, 2, block), jnp.float32)
            for m in range(phases):
                off = a * step + m * block
                r, l = divmod(off, sup_l)  # l is a multiple of 128
                # rows overlap by one block: l + block <= sup_l + block
                acc = acc + f2d_ref[m] * buf[
                    slot, r: r + ksup, :, l: l + block
                ]
            # out rows for this a are k = K*sup_a + a — unrolled row writes
            for K in range(ksup):
                out[:, K * sup_a + a] = acc[K]

    fold(bufr, or_ref)
    fold(bufi, oi_ref)


@functools.partial(
    jax.jit, static_argnames=("block", "step", "fl", "interpret")
)
def _fold_call(xr, xi, f2d, *, block, step, fl, interpret=False):
    n_pol, n_pad = xr.shape
    phases = fl // block
    tile_k, sup_l, sup_a, nrows = _plan(block, step, fl)
    # every fold row slice [r, r + ksup) must stay inside the span: the
    # largest row index touched is max_off // sup_l + ksup - 1 < nrows
    # (provably true for nrows() as defined in _plan — defensive only)
    max_off = (sup_a - 1) * step + (phases - 1) * block
    if max_off // sup_l >= nrows - tile_k // sup_a + 1:
        raise ValueError(
            f"padded-fold span too short: max fold offset {max_off} needs "
            f"row {max_off // sup_l} + {tile_k // sup_a} rows but the span "
            f"has {nrows}"
        )
    nblocks_pad = (
        n_pad - (nrows * sup_l + block - tile_k * step)
    ) // (tile_k * step)

    kern = functools.partial(
        _kernel, block=block, step=step, phases=phases,
        tile_k=tile_k, sup_l=sup_l, sup_a=sup_a, nrows=nrows,
    )
    grid = (n_pol // 2, nblocks_pad)
    out_shape = [
        jax.ShapeDtypeStruct((n_pol, nblocks_pad * tile_k, block), jnp.float32),
        jax.ShapeDtypeStruct((n_pol, nblocks_pad * tile_k, block), jnp.float32),
    ]
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((phases, block), lambda p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((2, tile_k, block), lambda p, t: (p, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_k, block), lambda p, t: (p, t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nrows, 2, sup_l + block), jnp.float32),
            pltpu.VMEM((2, nrows, 2, sup_l + block), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, nrows)),
        ],
        interpret=interpret,
    )(xr, xi, f2d)


@functools.partial(
    jax.jit,
    static_argnames=("block", "step", "k0", "delay", "nblocks", "time_major",
                     "interpret"),
)
def _padded_fused_core(xr, xi, f2d_rev, *, block, step, k0, delay, nblocks,
                       time_major, interpret):
    from .chan_dft_fused import KB, chan_dft_ramp, plan_chan_dft

    fl = f2d_rev.shape[0] * block
    gr, gi = _fold_call(xr, xi, f2d_rev, block=block, step=step, fl=fl,
                        interpret=interpret)
    # reverse+ifft+block^2 == block * e^{-2pi i q/block} * fft (see module
    # docstring); the phase merges with the derotation ramp into ONE
    # elementwise constant over (k mod nu, q)
    nu = block // math.gcd(block, step)
    rr, ri = _analysis._phase_ramp(block, step, nu, k0)  # (nu, block)
    q = np.arange(block)
    pr = (block * np.cos(-2.0 * np.pi * q / block)).astype(np.float64)
    pi_ = (block * np.sin(-2.0 * np.pi * q / block)).astype(np.float64)
    cr = (rr.astype(np.float64) * pr - ri.astype(np.float64) * pi_)
    ci = (rr.astype(np.float64) * pi_ + ri.astype(np.float64) * pr)
    if plan_chan_dft(block) is not None and KB % nu == 0:
        # fused DFT+ramp kernel: consumes the fold's tail-padded stream
        # directly (its own tiles are KB spectra; the ramp constant
        # repeats every nu | KB rows, so one (KB, block) constant serves
        # every tile) and emits channel-ordered ramped spectra with no
        # full-stream transposes
        ckr = np.tile(cr, (KB // nu, 1)).astype(np.float32)
        cki = np.tile(ci, (KB // nu, 1)).astype(np.float32)
        outr, outi = chan_dft_ramp(
            gr, gi, ckr, cki, block=block, interpret=interpret
        )
        outr = outr[:, :nblocks]
        outi = outi[:, :nblocks]
    else:
        sr, si = cfft.fft(gr[:, :nblocks], gi[:, :nblocks], axis=-1)
        reps = -(-nblocks // nu)
        crt = np.tile(cr, (reps, 1))[:nblocks].astype(np.float32)
        cit = np.tile(ci, (reps, 1))[:nblocks].astype(np.float32)
        outr = sr * crt - si * cit
        outi = sr * cit + si * crt
    if delay:
        outr = jnp.roll(outr, -delay, axis=1)
        outi = jnp.roll(outi, -delay, axis=1)
    if not time_major:
        outr = jnp.swapaxes(outr, -1, -2)
        outi = jnp.swapaxes(outi, -1, -2)
    return outr, outi


def polyphase_analysis_padded_fused(
    x,
    filt,
    block: int,
    os_factor,
    *,
    block0: int = 0,
    apply_delay: bool = True,
    time_major: bool = False,
    interpret: bool = False,
):
    """Drop-in for :func:`ska_pst_dsp_tpu.ops.polyphase_analysis_padded`
    with framing+fold fused into one Pallas kernel. Same in/out typing;
    ``time_major=True`` returns (n_pol, nblocks, block) — the fused
    synthesis frontend's native input layout."""
    os_factor = Rational.coerce(os_factor)
    step = geometry.analysis_step(block, os_factor)
    if block % 128:
        raise ValueError("fused padded kernel requires block % 128 == 0")
    if step % 128:
        raise ValueError(
            f"fused padded kernel requires step % 128 == 0, got {step} "
            "(use the composed path)"
        )
    pair_in = isinstance(x, tuple)
    if pair_in:
        xr, xi = x
    else:
        if hasattr(x, "ndim") and x.ndim == 3:
            x = x[:, 0, :]
        xr, xi = cfft.split(x)
    if xr.ndim == 3:
        xr, xi = xr[:, 0, :], xi[:, 0, :]

    f2d_rev = _analysis._prep_filter(filt, block, reverse=True)
    fl = f2d_rev.shape[0] * block
    n_taps = int(np.asarray(filt).size)
    delay = (
        geometry.padded_sample_delay_shift(n_taps, block, os_factor)
        if apply_delay
        else 0
    )

    n_pol, n_dat = xr.shape
    nblocks = n_dat // step
    tile_k, sup_l, sup_a, nrows = _plan(block, step, fl)
    nblocks_pad = max(1, -(-nblocks // tile_k))
    n_pad = nblocks_pad * tile_k * step + (
        nrows * sup_l + block - tile_k * step
    )
    pol_pad = n_pol % 2
    # front-pad fl zeros (the "padded" in padded analysis: block k reads
    # x[k*step - fl : k*step]) and tail-pad to the kernel's span geometry
    xr = jnp.pad(jnp.asarray(xr), [(0, pol_pad), (fl, 0)])
    xi = jnp.pad(jnp.asarray(xi), [(0, pol_pad), (fl, 0)])
    pad = n_pad - xr.shape[1]
    if pad > 0:
        xr = jnp.pad(xr, [(0, 0), (0, pad)])
        xi = jnp.pad(xi, [(0, 0), (0, pad)])
    else:
        xr, xi = xr[:, :n_pad], xi[:, :n_pad]

    outr, outi = _padded_fused_core(
        xr, xi, jnp.asarray(f2d_rev),
        block=block, step=step, k0=block0, delay=delay, nblocks=nblocks,
        time_major=True, interpret=interpret,
    )
    outr = outr[:n_pol]
    outi = outi[:n_pol]
    if not time_major:
        outr = jnp.swapaxes(outr, -1, -2)
        outi = jnp.swapaxes(outi, -1, -2)
    return (outr, outi) if pair_in else cfft.combine(outr, outi)

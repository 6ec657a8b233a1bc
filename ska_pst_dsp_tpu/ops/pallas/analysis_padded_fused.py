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
_SPAN_BUDGET = 7 * 1024 * 1024 + 512 * 1024


def _geom(block: int, step: int, fl: int):
    """(W, D, H): span row width gcd(step, block) (all fold-term offsets
    are multiples of it), rows per term block//W, and the aligned window
    height each term is sliced from (term row phases run 0..7)."""
    w = math.gcd(step, block)
    d = block // w
    h = -(-(7 + d) // 8) * 8
    return w, d, h


def _plan(block: int, step: int, fl: int):
    """Choose (TILE_K, SUP_L, SUP_A, NS): outputs per grid step, superblock
    length, outputs per superblock, and W-wide span rows per grid step.
    The span is W-row-structured (W = gcd(step, block), a multiple of 128
    for every supported geometry): each fold term x[k*step + m*block + j]
    is then a FULL-SUBLANE (2, D, W) slice of an 8-aligned (2, H, W)
    window — the round-3 per-(sup_l+block)-row layout put the 2-pol axis
    in the sublanes and ran the whole fold at 25% VPU utilization
    (measured 6.9 of the mid analysis' 8.5 ms)."""
    sup_l = math.lcm(step, block)
    sup_a = sup_l // step
    w, d, h = _geom(block, step, fl)
    phases = phases_of(fl, block)

    def ns(t):
        r_max = ((sup_a - 1) * step + (phases - 1) * block
                 + (t // sup_a - 1) * sup_l) // w
        n = -(-(r_max + h) // 8) * 8
        if d == 8:
            # aligned-accumulation fold (see _kernel): windows start at
            # 8*floor(a*step/(8w)) + 8*m' + superblock offset, m' <= phases
            r_al = (8 * (((sup_a - 1) * step) // (8 * w))
                    + (t // sup_a - 1) * (sup_l // w)
                    + 8 * (phases + 1))
            n = max(n, r_al + 8)
        return n

    tile = sup_a
    while True:
        cand = tile * 2
        if (cand > 512
                or 2 * 2 * 2 * (ns(cand) + cand * step // w) * w * 4
                > _SPAN_BUDGET):
            break
        tile = cand
    return tile, sup_l, sup_a, ns(tile)


def phases_of(fl: int, block: int) -> int:
    return fl // block


def _kernel(
    x_r, x_i,                # (P, R, W) ANY/HBM row views, front fl zeros
    f2d_ref,                 # (phases, D, W) VMEM — REVERSED filter, or the
                             # (SUP_A, phases+1, 8, W) aligned table (d==8)
    or_ref, oi_ref,          # out (2, TILE_K, D, W) VMEM
    bufr, bufi,              # scratch (2 slots, 2, NS, W) VMEM (per pol)
    sems,                    # DMA semaphores (2 slots, 2, 2)
    *,
    block: int, step: int, phases: int,
    tile_k: int, sup_l: int, sup_a: int, ns: int,
):
    t = pl.program_id(1)
    pg = pl.program_id(0)
    n_t = pl.num_programs(1)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    w, d, h = _geom(block, step, phases * block)
    ksup = tile_k // sup_a

    # one rect DMA per (component, pol): rows r0..r0+ns of the W-wide view
    def dma(step_idx, slot_idx, c, p):
        hbm, buf = ((x_r, bufr), (x_i, bufi))[c]
        r0 = step_idx * (tile_k * step // w)   # multiple of 8
        return pltpu.make_async_copy(
            hbm.at[2 * pg + p, pl.ds(r0, ns), :],
            buf.at[slot_idx, p],
            sems.at[slot_idx, c, p],
        )

    def start(step_idx, slot_idx):
        for c in range(2):
            for p in range(2):
                dma(step_idx, slot_idx, c, p).start()

    @pl.when(t == 0)
    def _():
        start(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start(t + 1, nxt)

    for c in range(2):
        for p in range(2):
            dma(t, slot, c, p).wait()

    f2d = f2d_ref[:]

    def fold_aligned(buf, out):
        # d == 8 path: SHUFFLE-FREE fold. Accumulate every spectrum in the
        # buffer's OWN sublane space — window reads are 8-aligned (2, 8, W)
        # slices, never [ph:ph+8] rotations — using the per-(a) filter
        # table g[a, m', s, :] = f2d[m' - [s<ph], (s-ph) mod 8, :]
        # (ph = (a*step/W) mod 8). The stored spectrum is then the true
        # block cyclically ADVANCED by ph*W samples, which under the DFT
        # is the per-bin phase e^{+2 pi i q ph/8} — merged for free into
        # the existing per-(k mod nu, q) derotation ramp constant
        # (_padded_fused_core; ph has period nu in k). Replaces ~phases
        # sublane rotations per spectrum (2-3x the madd cost each,
        # PERF_NOTES round-4) with zero.
        wins = {}

        def win8(b):
            if b not in wins:
                wins[b] = jnp.stack(
                    [buf[slot, 0, b: b + 8, :], buf[slot, 1, b: b + 8, :]]
                )
            return wins[b]

        for a in range(sup_a):
            ph = (a * step // w) % 8
            base_a = (a * step // w) - ph       # 8-aligned
            n_terms = phases + (1 if ph else 0)
            for K in range(ksup):
                base = base_a + (K * sup_l) // w
                acc = jnp.zeros((2, d, w), jnp.float32)
                for mp in range(n_terms):
                    acc = acc + f2d[a, mp] * win8(base + 8 * mp)
                out[:, K * sup_a + a] = acc

    def fold(buf, out):
        # per spectrum k = K*sup_a + a: `phases` full-sublane (2, D, W)
        # madds, each sliced at this shift's fixed row phase from an
        # 8-aligned (2, H, W) window. Windows land on an 8-row grid
        # shared across shifts and taps (b(a, m, K) differences are all
        # multiples of 8), so the cache cuts the load traffic ~3-4x.
        # The (D, W) row split of the block IS the row-major lane layout,
        # so the output tile (2, TILE_K, D, W) reshapes to the
        # (NB, block) stream for free.
        wins = {}

        def win(b):
            if b not in wins:
                wins[b] = jnp.stack(
                    [buf[slot, 0, b: b + h, :], buf[slot, 1, b: b + h, :]]
                )
            return wins[b]

        for a in range(sup_a):
            ph = (a * step // w) % 8
            for K in range(ksup):
                base = (a * step + K * sup_l) // w - ph
                acc = jnp.zeros((2, d, w), jnp.float32)
                for m in range(phases):
                    v = win(base + (m * block // w))
                    term = v[:, ph: ph + d, :] if ph or h > d else v
                    acc = acc + f2d[m] * term
                out[:, K * sup_a + a] = acc

    if d == 8:
        fold_aligned(bufr, or_ref)
        fold_aligned(bufi, oi_ref)
    else:
        fold(bufr, or_ref)
        fold(bufi, oi_ref)


@functools.partial(
    jax.jit, static_argnames=("block", "step", "fl", "interpret")
)
def _fold_call(xr, xi, f2d, *, block, step, fl, interpret=False):
    n_pol, n_pad = xr.shape
    phases = fl // block
    tile_k, sup_l, sup_a, ns = _plan(block, step, fl)
    w, d, h = _geom(block, step, fl)
    n_rows = n_pad // w
    rows_per_t = tile_k * step // w
    nblocks_pad = (n_rows - ns) // rows_per_t + 1
    x3r = xr[:, : n_rows * w].reshape(n_pol, n_rows, w)
    x3i = xi[:, : n_rows * w].reshape(n_pol, n_rows, w)

    f2d_in = f2d.reshape(phases, d, w)
    if d == 8:
        # aligned-fold filter table (see _kernel.fold_aligned):
        # g[a, m', s, :] = f2d[m' - [s<ph(a)], (s-ph(a)) mod 8, :]
        tabs = []
        zero = jnp.zeros_like(f2d_in[:1])
        for a in range(sup_a):
            ph = (a * step // w) % 8
            rolled = jnp.roll(f2d_in, ph, axis=1)
            plain = jnp.concatenate([rolled, zero], axis=0)
            shifted = jnp.concatenate([zero, rolled], axis=0)
            mask = (jnp.arange(8) < ph)[None, :, None]
            tabs.append(jnp.where(mask, shifted, plain))
        f2d_in = jnp.stack(tabs)            # (sup_a, phases+1, 8, w)

    kern = functools.partial(
        _kernel, block=block, step=step, phases=phases,
        tile_k=tile_k, sup_l=sup_l, sup_a=sup_a, ns=ns,
    )
    grid = (n_pol // 2, nblocks_pad)
    out_shape = [
        jax.ShapeDtypeStruct((n_pol, nblocks_pad * tile_k, d, w),
                             jnp.float32),
        jax.ShapeDtypeStruct((n_pol, nblocks_pad * tile_k, d, w),
                             jnp.float32),
    ]
    outr, outi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(
                f2d_in.shape,
                (lambda p, t: (0, 0, 0, 0)) if d == 8
                else (lambda p, t: (0, 0, 0)),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=[
            pl.BlockSpec((2, tile_k, d, w), lambda p, t: (p, t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, tile_k, d, w), lambda p, t: (p, t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, 2, ns, w), jnp.float32),
            pltpu.VMEM((2, 2, ns, w), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, 2)),
        ],
        interpret=interpret,
    )(x3r, x3i, f2d_in)
    nb = nblocks_pad * tile_k
    return (
        outr.reshape(n_pol, nb, block),
        outi.reshape(n_pol, nb, block),
    )


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
    w = math.gcd(step, block)
    if block // w == 8:
        # the aligned fold stores each spectrum cyclically ADVANCED by
        # ph(k)*w samples (ph(k) = (k*step/w) mod 8, period nu in k);
        # undo it here: FFT(true)[q] = FFT(stored)[q] e^{+2 pi i q ph/8}
        ph_k = (np.arange(nu) * (step // w)) % 8          # (nu,)
        ang = 2.0 * np.pi * np.outer(ph_k, q) / 8.0
        er, ei = np.cos(ang), np.sin(ang)
        cr, ci = cr * er - ci * ei, cr * ei + ci * er
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
    if math.gcd(step, block) % 128:
        raise ValueError(
            f"fused padded kernel requires gcd(step, block) % 128 == 0, "
            f"got step={step} (use the composed path)"
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
    tile_k, sup_l, sup_a, ns = _plan(block, step, fl)
    w, _, _ = _geom(block, step, fl)
    nblocks_pad = max(1, -(-nblocks // tile_k))
    # the kernel reads W-wide rows [t*rows_per_t, + ns) of the view
    n_pad = ((nblocks_pad - 1) * (tile_k * step // w) + ns) * w
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

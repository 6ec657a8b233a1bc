"""Fused Pallas synthesis (Golden inversion) frontend kernel.

The XLA-composed inversion (ops/synthesis.py) materializes the overlap-save
frame tensor, the full per-channel spectra, the fftshifted copy, and the
passband-trimmed copy as separate HBM round trips. This kernel fuses the
whole per-channel frontend of polyphase_synthesis.m:163-251 —

    frame (hop input_keep) → temporal taper → forward DFT → fftshift
    → keep central FN_width bins → deripple

— into ONE pallas_call that reads the fine-channel stream once and writes
only the kept passband bins, already in assembled spectrum order
(pol, block, chan, FN_width), so the subsequent reshape to the full-band
spectrum is a free bitcast. The epilogue (Nyquist roll, spectral taper,
optional spectral filter, big backward FFT, overlap discard) stays composed
XLA: its working set (e.g. the 1.8M-point mid IFFT) exceeds VMEM.

TPU-shaped choices (each forced by a Mosaic layout rule):
  * The stream is processed time-major (P, T, C): overlap-save frames then
    start at *sublane* offsets (divisible by 8 for any keep % 8 == 0
    geometry), where channel-major framing would need lane offsets
    divisible by 128 — impossible for low's keep = 160.
  * fftshift + passband keep + deripple all fold into the DFT matrix
    itself: the kernel multiplies against D[:, (L/2 + discard + j) mod L]
    * deripple[j] — column selection of a constant matrix is free, so the
    misaligned-lane slices/concats they would otherwise need never exist.
  * One GEMM per output component — [xr; xi] @ [[Dr],[−Di]] and
    [xr; xi] @ [[Di],[Dr]] — both (2L, FN_width) matrices, split-bf16x3 for
    fp32-class accuracy (see cfft.kernel_dot); contraction is along
    sublanes (dot_general ((0,), (0,))), so no operand is ever transposed.

Differential-tested against ops.polyphase_synthesis in tests/test_pallas.py.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import geometry, windows
from ...utils.rational import Rational
from .. import cfft
from ..synthesis import combine_channel_permutation

#: VMEM budget for the kernel working set (frames + GEMM operands).
_VMEM_BUDGET = 10 * 1024 * 1024


def _plan(n_chan: int, L: int, keep: int, fnw: int) -> Tuple[int, int]:
    """Choose (C_TILE, KB): channels and overlap-save blocks per grid step.
    C_TILE must keep lane offsets aligned (multiple of 128, or the whole
    channel axis); KB amortizes matrix loads across blocks."""
    c_tile = n_chan if n_chan <= 128 else 128
    kb = 4
    while kb > 1:
        vmem = (
            2 * kb * L * c_tile * 4          # frame slots (re+im)
            + 4 * (2 * L) * fnw * 2          # Dsel hi/lo for both components
            + 2 * kb * c_tile * fnw * 4      # output tiles
            + 2 * 2 * L * c_tile * 4         # GEMM temporaries
        )
        if vmem <= _VMEM_BUDGET:
            break
        kb //= 2
    return c_tile, kb


def _kernel_dot_t(a, bh, bl):
    """fp32-accurate GEMM contracting dim 0 of both operands (sublane
    contraction — no transposes): a (2L, C) x b (2L, F) → (C, F).
    Same split-bf16x3 scheme as cfft.kernel_dot."""
    dn = (((0,), (0,)), ((), ()))
    if cfft._PRECISION is jax.lax.Precision.HIGHEST:
        b = bh.astype(jnp.float32) + bl.astype(jnp.float32)
        return jax.lax.dot_general(
            a, b, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if cfft._PRECISION is None:
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), bh, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        ah, bh, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        ah, bl, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        al, bh, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    return acc


def _kernel(
    xr_hbm, xi_hbm,          # (P, T_pad, C) ANY/HBM, time-major
    taper_ref,               # (L, 1) VMEM
    dsel_h, dsel_l,          # (2L, 2*fnw) bf16 hi/lo: [[Dr|Di],[-Di|Dr]]
    out_ref,                 # out (1, KB, C_TILE, 2*fnw) VMEM
    bufr, bufi,              # scratch (KB, L, C_TILE) VMEM
    sems,                    # DMA semaphores (2, KB)
    *,
    L: int, keep: int, fnw: int, c_tile: int, kb: int,
):
    p = pl.program_id(0)
    c = pl.program_id(1)
    t = pl.program_id(2)
    base = t * kb * keep  # sublane offset: divisible by 8 (keep % 8 == 0)

    copies = []
    for b in range(kb):
        for comp, (hbm, buf) in enumerate(((xr_hbm, bufr), (xi_hbm, bufi))):
            cp = pltpu.make_async_copy(
                hbm.at[p, pl.ds(base + b * keep, L),
                       pl.ds(c * c_tile, c_tile)],
                buf.at[b],
                sems.at[comp, b],
            )
            cp.start()
            copies.append(cp)
    for cp in copies:
        cp.wait()

    taper = taper_ref[:]  # (L, 1) broadcasts along channels
    # ONE fat GEMM per grid step: the kb blocks ride side-by-side in the
    # lanes (c_tile-offset lane concat, aligned), and both output
    # components come from the combined [D_r | D_i] constant — per-GEMM
    # launch overhead dominated the round-2 kernel at 2*kb launches/step
    cat = jnp.concatenate(
        [
            jnp.concatenate([bufr[b] * taper, bufi[b] * taper], axis=0)
            for b in range(kb)
        ],
        axis=1,
    )  # (2L, kb*C_TILE)
    res = _kernel_dot_t(cat, dsel_h[:], dsel_l[:])  # (kb*C_TILE, 2*fnw)
    out_ref[0] = res.reshape(kb, c_tile, 2 * fnw)


@functools.lru_cache(maxsize=None)
def _dsel_matrices(L: int, fnw: int, kpos: int, dr_key) -> Tuple[np.ndarray, ...]:
    """(2L, 2*fnw) combined DFT matrix [D_r | D_i] with fftshift+keep as
    column selection and deripple folded in: kept bin j is raw DFT bin
    (kpos + j) mod L; one GEMM produces both output components."""
    dr = np.asarray(dr_key, dtype=np.float64)
    t = np.arange(L)[:, None]
    k = (kpos + np.arange(fnw))[None, :] % L
    ang = -2.0 * np.pi * ((t * k) % L) / L
    c = np.cos(ang) * dr
    s = np.sin(ang) * dr
    dsel_r = np.concatenate([c, -s], axis=0)
    dsel_i = np.concatenate([s, c], axis=0)
    dsel = np.concatenate([dsel_r, dsel_i], axis=1).astype(np.float32)
    return cfft.split_bf16(dsel)


@functools.partial(
    jax.jit,
    static_argnames=(
        "geom_key", "spans_nyquist", "has_sf", "ifft_plan", "time_major",
        "interpret",
    ),
)
def _fused_synthesis(
    xr, xi,                  # (P, C, T) float32 — or (P, T, C) if time_major
    t_taper, s_taper, dsel, perm, sf_r, sf_i, elem,
    *,
    geom_key, spans_nyquist: bool, has_sf: bool = False,
    ifft_plan=None, time_major: bool = False, interpret: bool = False,
):
    n_chan_g, L, overlap, nu, de = geom_key
    geom = geometry.SynthesisGeometry(n_chan_g, L, overlap, Rational(nu, de))
    if time_major:
        n_pol, n_dat, n_chan = xr.shape
    else:
        n_pol, n_chan, n_dat = xr.shape
    n_blocks = geom.n_blocks(n_dat)
    fnw = geom.fn_width
    keep = geom.input_keep
    kpos = (L // 2 + geom.discard) % L
    if keep % 8:
        raise ValueError(f"fused synthesis requires input_keep % 8 == 0, got {keep}")
    if n_chan > 128 and n_chan % 128:
        # _plan tiles channels at 128; a remainder would silently leave the
        # last (n_chan % 128) channel tiles unwritten (e.g. 216-ch lowpsi
        # critical slabs must use the composed path)
        raise ValueError(
            f"fused synthesis requires n_chan <= 128 or n_chan % 128 == 0, "
            f"got {n_chan}"
        )

    c_tile, kb = _plan(n_chan, L, keep, fnw)
    n_bt = -(-n_blocks // kb)
    t_pad = (n_bt * kb - 1) * keep + L
    pad = max(0, t_pad - n_dat)

    xs = jnp.stack([xr, xi])
    if time_major:
        # already the kernel's native layout; combine permutation rides the
        # channel (last) axis
        xs = jnp.take(xs, perm, axis=3)
        if pad:
            xs = jnp.pad(xs, [(0, 0), (0, 0), (0, pad), (0, 0)])
        xs = xs[:, :, :t_pad, :]
    else:
        xs = jnp.take(xs, perm, axis=2)
        if pad:
            xs = jnp.pad(xs, [(0, 0), (0, 0), (0, 0), (0, pad)])
        xs = jnp.swapaxes(xs[..., :t_pad], -1, -2)  # (2, P, T_pad, C)

    kern = functools.partial(
        _kernel, L=L, keep=keep, fnw=fnw, c_tile=c_tile, kb=kb,
    )
    grid = (n_pol, n_chan // c_tile, n_bt)
    mat_spec = pl.BlockSpec(
        (2 * L, 2 * fnw), lambda p, c, t: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct(
            (n_pol, n_bt * kb, n_chan, 2 * fnw), jnp.float32
        ),
    ]
    fn_both = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((L, 1), lambda p, c, t: (0, 0),
                         memory_space=pltpu.VMEM),
            mat_spec, mat_spec,
        ],
        out_specs=[
            pl.BlockSpec(
                (1, kb, c_tile, 2 * fnw), lambda p, c, t: (p, t, c, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((kb, L, c_tile), jnp.float32),
            pltpu.VMEM((kb, L, c_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, kb)),
        ],
        interpret=interpret,
    )(xs[0], xs[1], t_taper[:, None], *dsel)[0]
    fnr = fn_both[..., :fnw]
    fni = fn_both[..., fnw:]

    out_shape = (n_pol, 1, n_blocks * geom.output_keep)
    lo = geom.output_overlap
    n_big = geom.output_fft_length

    if ifft_plan is not None:
        # fused epilogue: roll/taper/filter/scale folded into the kernel's
        # constants; only the kept output region is ever computed
        from .ifft_fused import fused_big_ifft

        flatr = fnr[:, :n_blocks].reshape(n_pol, n_blocks, n_big)
        flati = fni[:, :n_blocks].reshape(n_pol, n_blocks, n_big)
        n2, n1 = ifft_plan
        roll = fnw // 2 if spans_nyquist else 0
        er, ei = (elem if elem is not None else (None, None))
        kr, ki = fused_big_ifft(
            flatr, flati, er, ei,
            shape_key=(n_big, n2, n1, lo, roll, de / nu),
            has_elem=elem is not None,
            interpret=interpret,
        )
        return kr.reshape(out_shape), ki.reshape(out_shape)

    # composed-XLA epilogue (e.g. mid's 1.8M-point IFFT exceeds VMEM)
    def assemble(fn):
        flat = fn[:, :n_blocks].reshape(n_pol, n_blocks, n_chan * fnw)
        if spans_nyquist:
            flat = jnp.roll(flat, -(fnw // 2), axis=-1)
        return flat * s_taper[None, None, :]

    flatr, flati = assemble(fnr), assemble(fni)
    if has_sf:
        flatr, flati = (
            flatr * sf_r - flati * sf_i,
            flatr * sf_i + flati * sf_r,
        )
    br, bi = cfft.ifft(flatr, flati)
    scale = np.float32(de / nu)
    hi = n_big - lo
    return (
        (br[..., lo:hi] * scale).reshape(out_shape),
        (bi[..., lo:hi] * scale).reshape(out_shape),
    )


def polyphase_synthesis_fused(
    x,
    input_fft_length: int,
    os_factor: Union[Rational, str],
    *,
    spans_nyquist: bool = True,
    input_overlap: Optional[int] = None,
    deripple_coeff: Optional[np.ndarray] = None,
    sample_offset: int = 0,
    temporal_taper: Union[str, np.ndarray, None] = "no_window",
    spectral_taper: Union[str, np.ndarray, None] = "no_window",
    combine: int = 1,
    spectral_filter=None,
    time_major_in: bool = False,
    interpret: bool = False,
):
    """Drop-in for :func:`ska_pst_dsp_tpu.ops.polyphase_synthesis` with the
    per-channel frontend fused into one Pallas kernel. Same arguments, same
    in/out typing (complex ↔ complex numpy, (re, im) tuple ↔ tuple).

    ``time_major_in=True`` takes x as (n_pol, n_dat, n_chan) — the fused
    analysis' native output layout (``time_major=True``) — skipping the
    full-stream transpose between the stages."""
    os_factor = Rational.coerce(os_factor)
    pair_in = isinstance(x, tuple)
    if pair_in:
        xr, xi = x
    else:
        xr, xi = cfft.split(x)
    if sample_offset:
        if time_major_in:
            xr = xr[:, sample_offset:, :]
            xi = xi[:, sample_offset:, :]
        else:
            xr = xr[:, :, sample_offset:]
            xi = xi[:, :, sample_offset:]
    if time_major_in:
        n_pol, n_dat, n_chan = xr.shape
    else:
        n_pol, n_chan, n_dat = xr.shape
    L = input_fft_length
    if input_overlap is None:
        input_overlap = L // 8
    geom = geometry.SynthesisGeometry(n_chan, L, input_overlap, os_factor)
    fnw = geom.fn_width

    if isinstance(temporal_taper, str) or temporal_taper is None:
        t_vec = windows.build(temporal_taper or "no_window", L, input_overlap)
    else:
        t_vec = np.asarray(temporal_taper, dtype=np.float32)
    if isinstance(spectral_taper, str) or spectral_taper is None:
        s_vec = windows.build(
            spectral_taper or "no_window", n_chan * fnw, input_overlap
        )
    else:
        s_vec = np.asarray(spectral_taper, dtype=np.float32)

    if deripple_coeff is not None:
        from ...design.fir import deripple_response

        dr = deripple_response(deripple_coeff, n_chan, fnw // 2).astype(
            np.float32
        )
    else:
        dr = np.ones(fnw, dtype=np.float32)

    perm = combine_channel_permutation(n_chan, combine).astype(np.int32)

    if spectral_filter is not None:
        if isinstance(spectral_filter, tuple):
            sf_r, sf_i = spectral_filter
        else:
            sf = np.asarray(spectral_filter)
            sf_r, sf_i = sf.real, sf.imag
        sf_r = jnp.asarray(np.asarray(sf_r, dtype=np.float32))
        sf_i = jnp.asarray(np.asarray(sf_i, dtype=np.float32))
    else:
        sf_r = sf_i = None

    kpos = (L // 2 + geom.discard) % L
    dsel = tuple(
        jnp.asarray(m)
        for m in _dsel_matrices(L, fnw, kpos, tuple(dr.tolist()))
    )

    # plan the fused IFFT epilogue; fold taper/filter into its elementwise
    # constant, pre-rolled by +roll so the kernel's modulation-theorem roll
    # sees them at the right bins (see ifft_fused)
    from .ifft_fused import plan_ifft

    ifft_plan = plan_ifft(geom.output_fft_length, geom.output_overlap)
    elem = None
    if ifft_plan is not None:
        roll = fnw // 2 if spans_nyquist else 0
        need_elem = (spectral_filter is not None) or not np.all(s_vec == 1.0)
        if need_elem:
            e_r = np.asarray(s_vec, dtype=np.float64).copy()
            e_i = np.zeros_like(e_r)
            if spectral_filter is not None:
                e_r, e_i = (
                    e_r * np.asarray(sf_r, dtype=np.float64),
                    e_r * np.asarray(sf_i, dtype=np.float64),
                )
            elem = (
                jnp.asarray(np.roll(e_r, roll).astype(np.float32)),
                jnp.asarray(np.roll(e_i, roll).astype(np.float32)),
            )

    rr, ri = _fused_synthesis(
        jnp.asarray(xr), jnp.asarray(xi),
        jnp.asarray(t_vec), jnp.asarray(s_vec), dsel,
        jnp.asarray(perm), sf_r, sf_i, elem,
        geom_key=(n_chan, L, input_overlap, os_factor.nu, os_factor.de),
        spans_nyquist=spans_nyquist,
        has_sf=spectral_filter is not None,
        ifft_plan=ifft_plan,
        time_major=time_major_in,
        interpret=interpret,
    )
    return (rr, ri) if pair_in else cfft.combine(rr, ri)

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
optional spectral filter, big backward FFT, overlap discard) runs as a
fused Pallas kernel too: in-VMEM four-step when the block fits
(ifft_fused; low), the out-of-core two-kernel three-factor path when it
does not (ifft_big; mid's 1.8M points), composed XLA otherwise.

TPU-shaped choices (each forced by a Mosaic layout rule):
  * The stream is processed time-major (P, T, C): overlap-save frames then
    start at *sublane* offsets (divisible by 8 for any keep % 8 == 0
    geometry), where channel-major framing would need lane offsets
    divisible by 128 — impossible for low's keep = 160.
  * fftshift + passband keep + deripple all fold into the DFT matrix
    itself: the kernel multiplies against D[:, (L/2 + discard + j) mod L]
    * deripple[j] — column selection of a constant matrix is free, so the
    misaligned-lane slices/concats they would otherwise need never exist.
  * The DFT runs as the Karatsuba 3-multiplication complex GEMM
    (cfft.kar_dot) against (L, FN_width) constants, split-bf16x3 for
    fp32-class accuracy; contraction is along sublanes (dot_general
    ((0,), (0,))), so no operand is ever transposed. Frame DMAs are
    double-buffered across grid steps, and ragged tails are handled by
    clamping the frame start (discarded blocks) instead of padding the
    stream.

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
    channel axis); KB amortizes matrix loads across blocks and sets the
    GEMM M-dim (KB * C_TILE rows)."""
    c_tile = n_chan if n_chan <= 128 else 128
    kb = 8
    while kb > 1:
        vmem = (
            2 * 2 * kb * L * c_tile * 4      # frame slots (re+im, 2 buffers)
            + 6 * L * fnw * 2                # Karatsuba constants hi/lo
            + 2 * 2 * kb * c_tile * fnw * 4  # output tiles (re+im, 2 buffers)
            + 6 * L * kb * c_tile * 2        # bf16 operand splits (3 GEMMs)
            + 2 * L * kb * c_tile * 4        # taper/sum temporaries
        )
        if vmem <= _VMEM_BUDGET:
            break
        kb //= 2
    return c_tile, kb


def _kernel(
    xr_hbm, xi_hbm,          # (P, T_pad, C) ANY/HBM, time-major
    taper_ref,               # (L, 1) VMEM
    drh, drl, dih, dil, dsh, dsl,  # (L, fnw) bf16 Karatsuba constants
    outr_ref, outi_ref,      # out (1, KB, C_TILE, fnw) VMEM each
    bufr, bufi,              # scratch (2 slots, KB, L, C_TILE) VMEM
    sems,                    # DMA semaphores (2 slots, 2, KB)
    *,
    L: int, keep: int, fnw: int, c_tile: int, kb: int, t_max: int,
):
    p = pl.program_id(0)
    c = pl.program_id(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(t_idx, slot_idx, comp, b):
        hbm, buf = ((xr_hbm, bufr), (xi_hbm, bufi))[comp]
        # frame start, clamped into bounds: blocks past the valid stream
        # are discarded by the caller, so they may read (aligned) garbage —
        # this removes the full-stream pad copy the tail otherwise forces.
        # Both operands of the min are multiples of 8, so the sublane
        # offset stays aligned.
        base = pl.multiple_of(
            jnp.minimum(t_idx * (kb * keep) + b * keep, t_max), 8
        )
        return pltpu.make_async_copy(
            hbm.at[p, pl.ds(base, L), pl.ds(c * c_tile, c_tile)],
            buf.at[slot_idx, b],
            sems.at[slot_idx, comp, b],
        )

    def start(t_idx, slot_idx):
        for comp in range(2):
            for b in range(kb):
                dma(t_idx, slot_idx, comp, b).start()

    # double buffering: issue the NEXT step's frame DMAs before blocking on
    # this step's — the copies ride under the GEMMs instead of ahead of them
    @pl.when(t == 0)
    def _():
        start(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start(t + 1, nxt)

    for comp in range(2):
        for b in range(kb):
            dma(t, slot, comp, b).wait()

    taper = taper_ref[:]  # (L, 1) broadcasts along channels
    # the kb blocks ride side-by-side in the lanes (c_tile-offset lane
    # concat, aligned) of THREE fat GEMMs — the Karatsuba 3-multiplication
    # complex product (cfft.kar_dot), 25% fewer MXU flops than the
    # (2L x 2fnw) block-matrix form
    ar = jnp.concatenate(
        [bufr[slot, b] * taper for b in range(kb)], axis=1
    )  # (L, kb*C_TILE)
    ai = jnp.concatenate(
        [bufi[slot, b] * taper for b in range(kb)], axis=1
    )
    consts = ((drh[:], drl[:]), (dih[:], dil[:]), (dsh[:], dsl[:]))
    dn = (((0,), (0,)), ((), ()))
    re, im = cfft.kar_dot(ar, ai, consts, dn)  # (kb*C_TILE, fnw) each
    outr_ref[0] = re.reshape(kb, c_tile, fnw)
    outi_ref[0] = im.reshape(kb, c_tile, fnw)


@functools.lru_cache(maxsize=None)
def _dsel_matrices(L: int, fnw: int, kpos: int, dr_key) -> Tuple[np.ndarray, ...]:
    """Karatsuba constant triple (hi/lo pairs) of the (L, fnw) DFT matrix
    with fftshift+keep as column selection and deripple folded in: kept bin
    j is raw DFT bin (kpos + j) mod L (see cfft.karatsuba_consts)."""
    dr = np.asarray(dr_key, dtype=np.float64)
    t = np.arange(L)[:, None]
    k = (kpos + np.arange(fnw))[None, :] % L
    ang = -2.0 * np.pi * ((t * k) % L) / L
    c = (np.cos(ang) * dr).astype(np.float32)
    s = (np.sin(ang) * dr).astype(np.float32)
    return cfft.karatsuba_consts(c, s)


@functools.partial(
    jax.jit,
    static_argnames=(
        "geom_key", "spans_nyquist", "has_sf", "has_perm", "valid_len",
        "ifft_plan", "time_major", "interpret",
    ),
)
def _fused_synthesis(
    xr, xi,                  # (P, C, T) float32 — or (P, T, C) if time_major
    t_taper, s_taper, dsel, perm, sf_r, sf_i, elem,
    *,
    geom_key, spans_nyquist: bool, has_sf: bool = False,
    has_perm: bool = True, valid_len=None,
    ifft_plan=None, time_major: bool = False, interpret: bool = False,
):
    n_chan_g, L, overlap, nu, de = geom_key
    geom = geometry.SynthesisGeometry(n_chan_g, L, overlap, Rational(nu, de))
    if time_major:
        n_pol, n_dat, n_chan = xr.shape
    else:
        n_pol, n_chan, n_dat = xr.shape
    # valid_len lets callers hand over a tail-padded stream (e.g. the fused
    # analysis' padded output) without slicing it first — blocks past the
    # valid region are never computed
    n_valid = n_dat if valid_len is None else valid_len
    n_blocks = geom.n_blocks(n_valid)
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

    xs = jnp.stack([xr, xi])
    if time_major:
        # already the kernel's native layout; combine permutation rides the
        # channel (last) axis — skipped entirely when it is the identity
        if has_perm:
            xs = jnp.take(xs, perm, axis=3)
    else:
        if has_perm:
            xs = jnp.take(xs, perm, axis=2)
        xs = jnp.swapaxes(xs, -1, -2)  # (2, P, T, C)

    # tail blocks of the last kb-group read clamped (in-bounds) garbage and
    # are discarded — no pad copy of the stream (see _kernel). The clamp
    # arithmetic needs n_dat >= L (else t_max goes negative) and keep % 8
    # == 0 (checked above) to keep the sublane DMA offset aligned.
    if n_dat < L:
        raise ValueError(
            f"fused synthesis needs at least one frame: n_dat={n_dat} < L={L}"
        )
    t_max = ((n_dat - L) // 8) * 8
    kern = functools.partial(
        _kernel, L=L, keep=keep, fnw=fnw, c_tile=c_tile, kb=kb, t_max=t_max,
    )
    grid = (n_pol, n_chan // c_tile, n_bt)
    mat_spec = pl.BlockSpec(
        (L, fnw), lambda p, c, t: (0, 0), memory_space=pltpu.VMEM
    )
    out_shape = [
        jax.ShapeDtypeStruct((n_pol, n_bt * kb, n_chan, fnw), jnp.float32),
        jax.ShapeDtypeStruct((n_pol, n_bt * kb, n_chan, fnw), jnp.float32),
    ]
    out_spec = pl.BlockSpec(
        (1, kb, c_tile, fnw), lambda p, c, t: (p, t, c, 0),
        memory_space=pltpu.VMEM,
    )
    dmats = [m for pair in dsel for m in pair]
    fnr, fni = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((L, 1), lambda p, c, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [mat_spec] * 6,
        out_specs=[out_spec, out_spec],
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, kb, L, c_tile), jnp.float32),
            pltpu.VMEM((2, kb, L, c_tile), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, kb)),
        ],
        interpret=interpret,
    )(xs[0], xs[1], t_taper[:, None], *dmats)

    out_shape = (n_pol, 1, n_blocks * geom.output_keep)
    lo = geom.output_overlap
    n_big = geom.output_fft_length

    if ifft_plan is not None:
        # fused epilogue: roll/taper/filter/scale folded into the kernel's
        # constants; only the kept output region is ever computed. "small"
        # = whole block in VMEM (low); "big" = out-of-core two-kernel
        # three-factor path (mid's 1.8M-point IFFT)
        from .ifft_big import fused_big_ifft_oc
        from .ifft_fused import fused_big_ifft

        roll = fnw // 2 if spans_nyquist else 0
        er, ei = (elem if elem is not None else (None, None))
        if ifft_plan[0] == "small":
            # the frontend's kb-group tail padding rides straight through:
            # the epilogue computes garbage for the pad blocks and returns
            # only the n_blocks valid ones — no slice/pad copy in between
            n2, n1 = ifft_plan[1:]
            n_bt_all = fnr.shape[1]
            kr, ki = fused_big_ifft(
                fnr.reshape(n_pol, n_bt_all, n_big),
                fni.reshape(n_pol, n_bt_all, n_big),
                er, ei,
                shape_key=(n_big, n2, n1, lo, roll, de / nu),
                has_elem=elem is not None,
                n_valid=n_blocks,
                interpret=interpret,
            )
        else:
            flatr = fnr[:, :n_blocks].reshape(n_pol, n_blocks, n_big)
            flati = fni[:, :n_blocks].reshape(n_pol, n_blocks, n_big)
            fp, fq, n1 = ifft_plan[1:]
            kr, ki = fused_big_ifft_oc(
                flatr, flati, er, ei,
                shape_key=(n_big, fp, fq, n1, lo, roll, de / nu),
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
    valid_len: Optional[int] = None,
    interpret: bool = False,
):
    """Drop-in for :func:`ska_pst_dsp_tpu.ops.polyphase_synthesis` with the
    per-channel frontend fused into one Pallas kernel. Same arguments, same
    in/out typing (complex ↔ complex numpy, (re, im) tuple ↔ tuple).

    ``time_major_in=True`` takes x as (n_pol, n_dat, n_chan) — the fused
    analysis' native output layout (``time_major=True``) — skipping the
    full-stream transpose between the stages. ``valid_len`` marks the first
    ``valid_len`` time samples as real data (the rest being tail padding a
    producer kernel emitted), so padded streams hand over without a slice
    copy."""
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
    has_perm = bool(np.any(perm != np.arange(n_chan, dtype=np.int32)))

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
        (jnp.asarray(h), jnp.asarray(lo))
        for h, lo in _dsel_matrices(L, fnw, kpos, tuple(dr.tolist()))
    )

    # plan the fused IFFT epilogue; fold taper/filter into its elementwise
    # constant, pre-rolled by +roll so the kernel's modulation-theorem roll
    # sees them at the right bins (see ifft_fused / ifft_big)
    from .ifft_big import plan_big_ifft
    from .ifft_fused import plan_ifft

    small = plan_ifft(geom.output_fft_length, geom.output_overlap)
    if small is not None:
        ifft_plan = ("small",) + small
    else:
        big = plan_big_ifft(geom.output_fft_length, geom.output_overlap)
        ifft_plan = ("big",) + big if big is not None else None
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
        has_perm=has_perm,
        valid_len=valid_len,
        ifft_plan=ifft_plan,
        time_major=time_major_in,
        interpret=interpret,
    )
    return (rr, ri) if pair_in else cfft.combine(rr, ri)

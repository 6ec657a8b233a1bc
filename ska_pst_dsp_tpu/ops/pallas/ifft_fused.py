"""Fused Pallas four-step backward FFT epilogue for the Golden inversion.

The composed epilogue (ops/synthesis.py + ops/cfft.py) spends several HBM
round trips per inversion block: the Nyquist roll, the spectral taper, the
four-step IFFT's inner transform / twiddle / outer transform / transpose,
the output slice and the de/nu scale each materialize the ~N-point spectrum.
This kernel runs the whole epilogue as ONE pallas_call over (pol, block):

    X (N = n2*n1 bins) → IFFT_N → keep [output_overlap, N-output_overlap)

with every elementwise factor folded into the kernel's constant matrices:

  * the DC-centering roll by s = FN_width/2 (polyphase_synthesis.m:265-278)
    becomes, by the modulation theorem, out[t] *= exp(-2πi·s·t/N) — and
    t = k2 + n2*k1 makes that SEPARABLE: the k1 part scales the outer DFT
    matrix's columns, the k2 part scales the twiddle constant;
  * 1/N and the de/nu inversion gain also ride the twiddle;
  * only the kept k1 ∈ [lo/n2, (N-lo)/n2) outer columns are computed at all
    (the overlap-save discard never exists);
  * the spectral taper / optional spectral filter (dedispersion chirp) fold
    into one complex elementwise constant applied before the inner GEMM.

Orientation (the round-4 redesign — zero transposes anywhere, in XLA or in
kernel): the inner n2-point DFT contracts SUBLANES of both operands
(dot_general ((0,),(0,)) against the symmetric DFT matrix), so its output
lands TRANSPOSED as (m1, k2) with the kb batched blocks stacked on
sublanes — M = kb*n1 rows, the fattest possible GEMM. The per-block
twiddle multiplies an (n1, n2) constant, and the outer n1-point DFT runs
const-first sublane-contraction per block, emitting (k1_keep, k2) — which
IS the kept time series t = k2 + n2*k1 in row-major order, so the final
reshape is free. The factorization prefers the SMALLEST n2 that is a
multiple of 128 (n = 49152 → n2 = 128, n1 = 384): both GEMMs keep K ∈
{128, 384} and full-height M, where the previous (96, 512) split ran a
96-row inner and needed a kept-output transpose in XLA. All GEMMs are
split-bf16x3 Karatsuba 3-multiplication complex products (cfft.kar_dot).

Ragged tails: callers may pass MORE trailing blocks than are valid (e.g.
the fused synthesis frontend's kb-group padding) — tail blocks compute
garbage that the caller slices off, and no pad/slice copy of the spectra
ever happens.

Applicable when N = n2*n1 with n2 % 128 == 0, n2 <= 512, n1 <= 512,
n1 % 8 == 0, lo % n2 == 0 and (N-2lo) % n2 == 0; callers fall back to the
out-of-core path (ifft_big) or composed XLA otherwise.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os

from .. import cfft

#: experiment knob (A/B only): 1 = wide-inner orientation — const-first
#: inner GEMM with N = kb*n1 lanes and an XLA output transpose, vs the
#: default transpose-free sublane-contraction inner (N = n2).
_WIDE = _os.environ.get("SKA_PST_IFFT_WIDE", "0") == "1"


def plan_ifft(n: int, lo: int) -> Optional[Tuple[int, int]]:
    """(n2, n1) factorization usable by the fused epilogue, or None.

    Candidate n2 must be a multiple of 128 (lane-aligned inner width) with
    n1 <= 512, n1 % 8 == 0 and the keep geometry divisible. The SMALLEST
    n2 wins: total GEMM flops are 18*n1*n2*(n2 + n1_keep), minimized at
    small n2, and the matched-flops shape probe (PERF_NOTES round 5)
    shows per-flop throughput is nearly flat (~24-37 TFLOPS) across the
    candidate shapes — so flop count, not GEMM shape, decides.
    SKA_PST_IFFT_N2 overrides for A/B."""
    if (n - 2 * lo) <= 0:
        return None
    force = int(_os.environ.get("SKA_PST_IFFT_N2", "0"))
    for n2 in range(128, 513, 128):
        if n % n2:
            continue
        n1 = n // n2
        if n1 > 512 or n1 % 8:
            continue
        if lo % n2 or (n - 2 * lo) % n2:
            continue
        if ((n - 2 * lo) // n2) % 8:
            continue
        if force and n2 != force:
            continue
        return n2, n1
    return None


@functools.lru_cache(maxsize=None)
def _constants(n: int, n2: int, n1: int, lo: int, roll: int, gain: float):
    """Host-side constants with the roll modulation and gain folded in:
    Karatsuba split-bf16 triples (see cfft.karatsuba_consts) for the inner
    (n2, n2) and outer (n1, n1_keep) DFT matrices, plus the (n1, n2)
    float32 twiddle (transposed orientation — see module docstring)."""
    k1_lo = lo // n2
    n1_keep = (n - 2 * lo) // n2

    # inner inverse DFT over n2: D2[m2, k2] = exp(+2πi m2 k2 / n2) — the
    # sublane-contraction dot needs m2 on dim 0, and D2 is symmetric
    j, k = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    ang = 2.0 * np.pi * ((j * k) % n2) / n2
    inner = cfft.karatsuba_consts(np.cos(ang), np.sin(ang))

    # twiddle W[m1, k2] = exp(+2πi m1 k2 / n) carrying gain/n and the k2
    # part of the roll modulation v[k2] = exp(-2πi roll k2 / n)
    m1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    ang = 2.0 * np.pi * (m1.astype(np.float64) * k2) / n
    vang = -2.0 * np.pi * roll * np.arange(n2, dtype=np.float64) / n
    w = np.exp(1j * ang) * (gain / n) * np.exp(1j * vang)[None, :]
    tw_r = np.real(w).astype(np.float32)
    tw_i = np.imag(w).astype(np.float32)

    # outer inverse DFT over n1, kept columns only, carrying the k1 part of
    # the roll modulation u[k1] = exp(-2πi roll n2 k1 / n)
    k1 = k1_lo + np.arange(n1_keep)
    m1, kk = np.meshgrid(np.arange(n1), k1, indexing="ij")
    ang = 2.0 * np.pi * ((m1 * kk) % n1) / n1
    uang = -2.0 * np.pi * roll * n2 * k1.astype(np.float64) / n
    d1 = np.exp(1j * ang) * np.exp(1j * uang)[None, :]
    outer = cfft.karatsuba_consts(np.real(d1), np.imag(d1))
    return inner, (tw_r, tw_i), outer


@functools.partial(
    jax.jit, static_argnames=("shape_key", "has_elem", "n_valid", "interpret")
)
def fused_big_ifft(
    flatr, flati,              # (P, B, N) assembled (unrolled) spectra
    elem_r=None, elem_i=None,  # optional (N,) pre-roll elementwise factor
    *,
    shape_key,                 # (n, n2, n1, lo, roll, gain) — static
    has_elem: bool = False,
    n_valid: Optional[int] = None,
    interpret: bool = False,
):
    """Fused IFFT(roll(X·elem, -roll))·gain, keeping [lo, N-lo).
    Returns (P, n_valid, keep) kept time series as (re, im); blocks past
    ``n_valid`` (default all) are tail padding and are never returned."""
    n, n2, n1, lo, roll, gain = shape_key
    n_pol, n_blocks, n_flat = flatr.shape
    assert n_flat == n
    if n_valid is None:
        n_valid = n_blocks
    n1_keep = (n - 2 * lo) // n2
    (i_b, (tw_r, tw_i), o_b) = _constants(n, n2, n1, lo, roll, gain)

    # batch KB blocks per grid step and feed them to SHARED fat GEMMs:
    # per-GEMM launch overhead dominated the round-2 kernel (48 skinny
    # launches/step measured ~5x slower than the GEMM flops justify).
    # VMEM per block: in tiles (2 comps x 2 pipeline buffers), out tiles
    # (same), and the kb-tiled twiddle pair.
    per_kb = (2 * 2 * n2 * n1 + 2 * 2 * n1_keep * n2 + 2 * n1 * n2) * 4
    fixed = (3 * 2 * n2 * n2 + 3 * 2 * n1 * n1_keep) * 2
    kb = 1
    limit = (12 if _WIDE else 14) * 1024 * 1024
    while kb < 8 and 2 * kb * per_kb + fixed <= limit:
        kb *= 2
    b_pad = -(-n_blocks // kb) * kb

    x3r = flatr.reshape(n_pol, n_blocks, n2, n1)
    x3i = flati.reshape(n_pol, n_blocks, n2, n1)
    if b_pad != n_blocks:
        pad = [(0, 0), (0, b_pad - n_blocks), (0, 0), (0, 0)]
        x3r = jnp.pad(x3r, pad)
        x3i = jnp.pad(x3i, pad)

    def kern(xr_ref, xi_ref,
             i1h, i1l, i2h, i2l, i3h, i3l,
             twr_ref, twi_ref,
             o1h, o1l, o2h, o2l, o3h, o3l,
             er_ref, ei_ref, outr_ref, outi_ref):
        # the kb blocks ride side-by-side in the LANES of the inner GEMMs
        # (lane-concat at n1 offsets is aligned and free); the sublane
        # contraction then lands them stacked on SUBLANES of the (kb*n1,
        # n2) transposed result — no operand or result is ever transposed
        re_all = jnp.concatenate(
            [xr_ref[0, b] for b in range(kb)], axis=1)   # (n2, kb*n1)
        im_all = jnp.concatenate(
            [xi_ref[0, b] for b in range(kb)], axis=1)
        if has_elem:
            er, ei = er_ref[:], ei_ref[:]                # (n2, kb*n1) tiled
            re_all, im_all = (
                re_all * er - im_all * ei,
                re_all * ei + im_all * er,
            )
        inner_c = ((i1h[:], i1l[:]), (i2h[:], i2l[:]), (i3h[:], i3l[:]))
        dn00 = (((0,), (0,)), ((), ()))
        dn_std = (((1,), (0,)), ((), ()))
        outer_c = ((o1h[:], o1l[:]), (o2h[:], o2l[:]), (o3h[:], o3l[:]))
        if _WIDE:
            # wide-inner orientation: const-first inner with N = kb*n1
            # lanes; outer standard-dn; output (k2, k1)-ordered — the
            # caller transposes in XLA
            br, bi = cfft.kar_dot(
                re_all, im_all, inner_c, dn_std, const_first=True
            )                                            # (n2, kb*n1)
            tr, ti = twr_ref[:], twi_ref[:]              # (n2, kb*n1)
            cr = br * tr - bi * ti
            ci = br * ti + bi * tr
            cr2 = jnp.concatenate(
                [cr[:, b * n1:(b + 1) * n1] for b in range(kb)], axis=0)
            ci2 = jnp.concatenate(
                [ci[:, b * n1:(b + 1) * n1] for b in range(kb)], axis=0)
            kr, ki = cfft.kar_dot(cr2, ci2, outer_c, dn_std)
            outr_ref[0] = kr.reshape(kb, n2, n1_keep)
            outi_ref[0] = ki.reshape(kb, n2, n1_keep)
            return
        br, bi = cfft.kar_dot(re_all, im_all, inner_c, dn00)  # (kb*n1, n2)
        tr, ti = twr_ref[:], twi_ref[:]                  # (kb*n1, n2) tiled
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        # regroup the kb blocks from sublane-stacked (kb*n1, n2) to
        # lane-stacked (n1, kb*n2) — the slices are n1-aligned (n1 % 8
        # == 0) so all pieces share one layout and the lane concat is
        # free — then run ONE fat outer GEMM for all kb blocks (the
        # per-block form costs kb*9 skinny dot launches per grid step)
        cr2 = jnp.concatenate(
            [cr[b * n1:(b + 1) * n1] for b in range(kb)], axis=1)
        ci2 = jnp.concatenate(
            [ci[b * n1:(b + 1) * n1] for b in range(kb)], axis=1)
        # outer: const-first sublane contraction → (n1_keep, kb*n2); per
        # block the (n1_keep, n2) tile IS the kept samples t = k2 + n2*k1
        # in row-major order
        kr, ki = cfft.kar_dot(cr2, ci2, outer_c, dn00, const_first=True)
        for b in range(kb):
            outr_ref[0, b] = kr[:, b * n2:(b + 1) * n2]
            outi_ref[0, b] = ki[:, b * n2:(b + 1) * n2]

    grid = (n_pol, b_pad // kb)
    spec_in = pl.BlockSpec((1, kb, n2, n1), lambda p, b: (p, b, 0, 0),
                           memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda p, b: (0, 0),
                            memory_space=pltpu.VMEM)

    if has_elem:
        e_r = jnp.tile(elem_r.reshape(n2, n1), (1, kb))
        e_i = jnp.tile(elem_i.reshape(n2, n1), (1, kb))
    else:
        e_r = jnp.ones((8, 128), jnp.float32)
        e_i = jnp.zeros((8, 128), jnp.float32)

    if _WIDE:
        tw_pair = [np.tile(tw_r.T, (1, kb)), np.tile(tw_i.T, (1, kb))]
        out_dims = (n2, n1_keep)
    else:
        tw_pair = [np.tile(tw_r, (kb, 1)), np.tile(tw_i, (kb, 1))]
        out_dims = (n1_keep, n2)
    const_args = (
        [i_b[0][0], i_b[0][1], i_b[1][0], i_b[1][1], i_b[2][0], i_b[2][1]]
        + tw_pair
        + [o_b[0][0], o_b[0][1], o_b[1][0], o_b[1][1], o_b[2][0], o_b[2][1]]
    )
    const_args = [jnp.asarray(m) for m in const_args]
    const_specs = [cspec(m.shape) for m in const_args]

    out_spec = pl.BlockSpec((1, kb) + out_dims, lambda p, b: (p, b, 0, 0),
                            memory_space=pltpu.VMEM)
    outr, outi = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=(
            [spec_in, spec_in] + const_specs
            + [cspec(e_r.shape), cspec(e_i.shape)]
        ),
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pol, b_pad) + out_dims, jnp.float32),
            jax.ShapeDtypeStruct((n_pol, b_pad) + out_dims, jnp.float32),
        ],
        interpret=interpret,
    )(x3r, x3i, *const_args, e_r, e_i)

    keep = n1_keep * n2
    if _WIDE:
        # (k2, k1) tiles → one XLA transpose to time order
        return (
            jnp.swapaxes(outr[:, :n_valid], -1, -2)
            .reshape(n_pol, n_valid, keep),
            jnp.swapaxes(outi[:, :n_valid], -1, -2)
            .reshape(n_pol, n_valid, keep),
        )
    # kept samples t = k2 + n2*k1 are exactly the (k1, k2) row-major tile
    # layout — the reshape is free, no transpose
    return (
        outr[:, :n_valid].reshape(n_pol, n_valid, keep),
        outi[:, :n_valid].reshape(n_pol, n_valid, keep),
    )

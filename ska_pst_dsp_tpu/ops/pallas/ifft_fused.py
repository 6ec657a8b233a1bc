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

Both GEMMs contract along sublanes (dot_general ((0,),(0,))) against
split-bf16x3 constants, and the second GEMM puts the kept-k1 axis first by
operand order — no transposes anywhere; the (n1_keep, n2) output tiles
flatten to the kept time series as a free reshape. Applicable when
N = n2*n1 with n1 <= 512, n2 <= 512, n2 % 8 == 0, n1 % 128 == 0 and
output_overlap % n2 == 0 (true for the low config: 49152 = 96*512,
overlap 9216 = 96*96); callers fall back to the composed path otherwise
(e.g. mid's 1.8M-point IFFT, whose blocks exceed VMEM).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cfft


def plan_ifft(n: int, lo: int) -> Optional[Tuple[int, int]]:
    """(n2, n1) factorization usable by the fused epilogue, or None."""
    try:
        n1 = cfft._split_factor(n)
    except ValueError:
        return None
    n2 = n // n1
    if n1 > 512 or n2 > 512 or n2 % 8 or n1 % 128:
        return None
    if lo % n2 or (n - 2 * lo) <= 0:
        return None
    return n2, n1


@functools.lru_cache(maxsize=None)
def _constants(n: int, n2: int, n1: int, lo: int, roll: int, gain: float):
    """Host-side constants with the roll modulation and gain folded in:
    Karatsuba split-bf16 triples (see cfft.karatsuba_consts) for the inner
    (n2, n2) and outer (n1, n1_keep) DFT matrices, plus the (n2, n1)
    float32 twiddle."""
    k1_lo = lo // n2
    n1_keep = (n - 2 * lo) // n2

    # inner inverse DFT over n2: D2[j, k] = exp(+2πi jk/n2)
    j, k = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    ang = 2.0 * np.pi * ((j * k) % n2) / n2
    inner = cfft.karatsuba_consts(np.cos(ang), np.sin(ang))

    # twiddle W[k2, m1] = exp(+2πi m1 k2 / n) carrying gain/n and the k2
    # part of the roll modulation v[k2] = exp(-2πi roll k2 / n)
    k2, m1 = np.meshgrid(np.arange(n2), np.arange(n1), indexing="ij")
    ang = 2.0 * np.pi * (m1.astype(np.float64) * k2) / n
    vang = -2.0 * np.pi * roll * np.arange(n2, dtype=np.float64) / n
    w = np.exp(1j * ang) * (gain / n) * np.exp(1j * vang)[:, None]
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
    jax.jit, static_argnames=("shape_key", "has_elem", "interpret")
)
def fused_big_ifft(
    flatr, flati,              # (P, B, N) assembled (unrolled) spectra
    elem_r=None, elem_i=None,  # optional (N,) pre-roll elementwise factor
    *,
    shape_key,                 # (n, n2, n1, lo, roll, gain) — static
    has_elem: bool = False,
    interpret: bool = False,
):
    """Fused IFFT(roll(X·elem, -roll))·gain, keeping [lo, N-lo).
    Returns (P, B, keep) kept time series as (re, im)."""
    n, n2, n1, lo, roll, gain = shape_key
    n_pol, n_blocks, n_flat = flatr.shape
    assert n_flat == n
    n1_keep = (n - 2 * lo) // n2
    (i_b, (tw_r, tw_i), o_b) = _constants(n, n2, n1, lo, roll, gain)

    # batch KB blocks per grid step and feed them to SHARED fat GEMMs:
    # per-GEMM launch overhead dominated the round-2 kernel (48 skinny
    # launches/step measured ~5x slower than the GEMM flops justify)
    kb = 1
    while (
        kb < 8
        and 2 * (kb * 2) * (n2 * n1 + n1_keep * n2) * 4 <= 4 * 1024 * 1024
    ):
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
        # every GEMM keeps the WIDE axis in the lanes; the kb blocks ride
        # side-by-side in the lanes of the inner GEMMs (lane-concat at n1
        # offsets is aligned and free). Both stages use the Karatsuba
        # 3-multiplication complex product (cfft.kar_dot) — 25% fewer MXU
        # flops than the block-matrix form.
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
        dn_left = (((1,), (0,)), ((), ()))
        br, bi = cfft.kar_dot(
            re_all, im_all, inner_c, dn_left, const_first=True
        )                                                # (n2, kb*n1)
        tr, ti = twr_ref[:], twi_ref[:]                  # (n2, kb*n1) tiled
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        # the kb blocks stack on SUBLANES for one fat outer GEMM
        # (M = kb*n2 rows instead of kb skinny M = n2 launches)
        cr2 = jnp.concatenate(
            [cr[:, b * n1:(b + 1) * n1] for b in range(kb)], axis=0)
        ci2 = jnp.concatenate(
            [ci[:, b * n1:(b + 1) * n1] for b in range(kb)], axis=0)
        outer_c = ((o1h[:], o1l[:]), (o2h[:], o2l[:]), (o3h[:], o3l[:]))
        dn = (((1,), (0,)), ((), ()))
        kr, ki = cfft.kar_dot(cr2, ci2, outer_c, dn)     # (kb*n2, n1_keep)
        outr_ref[0] = kr.reshape(kb, n2, n1_keep)
        outi_ref[0] = ki.reshape(kb, n2, n1_keep)

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

    tw_rt = np.tile(tw_r, (1, kb))
    tw_it = np.tile(tw_i, (1, kb))
    const_args = (
        [i_b[0][0], i_b[0][1], i_b[1][0], i_b[1][1], i_b[2][0], i_b[2][1]]
        + [tw_rt, tw_it]
        + [o_b[0][0], o_b[0][1], o_b[1][0], o_b[1][1], o_b[2][0], o_b[2][1]]
    )
    const_args = [jnp.asarray(m) for m in const_args]
    const_specs = [cspec(m.shape) for m in const_args]

    out_spec = pl.BlockSpec((1, kb, n2, n1_keep), lambda p, b: (p, b, 0, 0),
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
            jax.ShapeDtypeStruct((n_pol, b_pad, n2, n1_keep), jnp.float32),
            jax.ShapeDtypeStruct((n_pol, b_pad, n2, n1_keep), jnp.float32),
        ],
        interpret=interpret,
    )(x3r, x3i, *const_args, e_r, e_i)

    # kept samples are t = k2 + n2*k1: transpose the small (n2, n1_keep)
    # tiles to [k1, k2] order (one cheap XLA pass over the kept output only)
    keep = n1_keep * n2
    outr = outr[:, :n_blocks]
    outi = outi[:, :n_blocks]
    return (
        jnp.swapaxes(outr, -1, -2).reshape(n_pol, n_blocks, keep),
        jnp.swapaxes(outi, -1, -2).reshape(n_pol, n_blocks, keep),
    )

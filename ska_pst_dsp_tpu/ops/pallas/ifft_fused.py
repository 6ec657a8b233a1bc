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
from .synthesis_fused import _kernel_dot_t


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


def _dot_t_const_first(bh, bl, a):
    """Split-bf16x3 GEMM with the CONSTANT as the left operand, contracting
    dim 0 of both: (2n, K1)ᵀ-style · (2n, K2) → (K1, K2). Mirrors
    synthesis_fused._kernel_dot_t with the roles swapped so the kept output
    axis lands first without any transpose."""
    dn = (((0,), (0,)), ((), ()))
    if cfft._PRECISION is jax.lax.Precision.HIGHEST:
        b = bh.astype(jnp.float32) + bl.astype(jnp.float32)
        return jax.lax.dot_general(
            b, a, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if cfft._PRECISION is None:
        return jax.lax.dot_general(
            bh, a.astype(jnp.bfloat16), dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jax.lax.dot_general(
        bh, ah, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        bh, al, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    acc = acc + jax.lax.dot_general(
        bl, ah, dimension_numbers=dn, preferred_element_type=jnp.float32
    )
    return acc


@functools.lru_cache(maxsize=None)
def _constants(n: int, n2: int, n1: int, lo: int, roll: int, gain: float):
    """Host-side constants with the roll modulation and gain folded in:
    inner split-bf16 (2*n2, 2*n2) = [inner_r | inner_i] (both output
    components in one GEMM); (tw_r, tw_i) float32 (n2, n1);
    outer split-bf16 (2*n1, 2*n1_keep) = [outer_r | outer_i]."""
    k1_lo = lo // n2
    n1_keep = (n - 2 * lo) // n2

    # inner inverse DFT over n2: D2[j, k] = exp(+2πi jk/n2)
    j, k = np.meshgrid(np.arange(n2), np.arange(n2), indexing="ij")
    ang = 2.0 * np.pi * ((j * k) % n2) / n2
    d2r, d2i = np.cos(ang), np.sin(ang)
    inner_r = np.concatenate([d2r, -d2i], axis=0)  # [xr; xi] → Re
    inner_i = np.concatenate([d2i, d2r], axis=0)   # [xr; xi] → Im

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
    outer_r = np.concatenate([np.real(d1), -np.imag(d1)], axis=0)
    outer_i = np.concatenate([np.imag(d1), np.real(d1)], axis=0)

    # both output components ride one GEMM: N doubles, launches halve
    inner = np.concatenate([inner_r, inner_i], axis=1)
    outer = np.concatenate([outer_r, outer_i], axis=1)
    return (
        cfft.split_bf16(inner.astype(np.float32)),
        (tw_r, tw_i),
        cfft.split_bf16(outer.astype(np.float32)),
    )


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
        and 2 * (kb * 2) * (n2 * n1 + n1_keep * n2) * 4 <= 6 * 1024 * 1024
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
             i_bh, i_bl, twr_ref, twi_ref, o_bh, o_bl,
             er_ref, ei_ref, out_ref):
        # every GEMM keeps the WIDE axis in the lanes; the kb blocks ride
        # side-by-side in the lanes of ONE inner GEMM (lane-concat at n1
        # offsets is aligned and free), and both output components come out
        # of each GEMM via the [C_r | C_i] combined constants
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
        cat = jnp.concatenate([re_all, im_all], axis=0)  # (2*n2, kb*n1)
        b_all = _dot_t_const_first(i_bh[:], i_bl[:], cat)  # (2*n2, kb*n1)
        br = b_all[:n2]
        bi = b_all[n2:]
        tr, ti = twr_ref[:], twi_ref[:]                  # (n2, kb*n1) tiled
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        for b in range(kb):
            cat2 = jnp.concatenate(
                [cr[:, b * n1:(b + 1) * n1], ci[:, b * n1:(b + 1) * n1]],
                axis=1,
            )                                            # (n2, 2*n1)
            # (n2, 2*n1_keep): [kept_r | kept_i]; caller splits in XLA
            out_ref[0, b] = cfft.kernel_dot(cat2, o_bh[:], o_bl[:])

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
    const_args = [i_b[0], i_b[1], tw_rt, tw_it, o_b[0], o_b[1]]
    const_args = [jnp.asarray(m) for m in const_args]
    const_specs = [cspec(m.shape) for m in const_args]

    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=(
            [spec_in, spec_in] + const_specs
            + [cspec(e_r.shape), cspec(e_i.shape)]
        ),
        out_specs=[
            pl.BlockSpec((1, kb, n2, 2 * n1_keep), lambda p, b: (p, b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pol, b_pad, n2, 2 * n1_keep), jnp.float32),
        ],
        interpret=interpret,
    )(x3r, x3i, *const_args, e_r, e_i)[0]

    # kept samples are t = k2 + n2*k1: split components and transpose the
    # small (n2, n1_keep) tiles to [k1, k2] order (one cheap XLA pass over
    # the kept output only)
    keep = n1_keep * n2
    out = out[:, :n_blocks]
    return (
        jnp.swapaxes(out[..., :n1_keep], -1, -2).reshape(n_pol, n_blocks, keep),
        jnp.swapaxes(out[..., n1_keep:], -1, -2).reshape(n_pol, n_blocks, keep),
    )

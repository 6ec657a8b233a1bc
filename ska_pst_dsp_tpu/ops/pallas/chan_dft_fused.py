"""Fused per-spectrum channel DFT + derotation ramp for the padded (SKA-
Mid) analysis — the stage between the fold kernel and the synthesis.

The composed path runs the 4096-point DFT through cfft's generic four-step
(ops/cfft.py _fft_last): its inner transform contracts K = 8 on the MXU
(~6 % utilization) and its output interleave costs two full-stream XLA
transposes — together the dominant cost of the mid analysis. This kernel
runs the whole stage as ONE pallas_call over (pol, KB-spectra tiles):

  * block = 8 * b1 splits every spectrum's lanes into 8 aligned b1-wide
    slices (free value slicing);
  * the radix-8 inner DFT over those slices runs as an unrolled
    split-complex DIT butterfly network on the VPU (trivial twiddles:
    1, ±i, sqrt2/2(±1±i));
  * the N-level twiddle rides an (8, b1) constant;
  * the outer b1-point DFT is one fat Karatsuba split-bf16x3 GEMM per k2
    digit (M = KB spectra, K = N = b1 — full MXU tiles);
  * the 8 per-k2 result planes write k2-major (Mosaic cannot lower the
    in-register lane interleave as a shape cast); ONE XLA transpose
    outside restores channel order k2 + 8*k1 — the composed four-step
    needed two such passes plus its K=8 inner GEMM;
  * the derotation ramp (and the padded analysis' reverse-then-IFFT
    equivalence phase, see analysis_padded_fused) multiplies as a
    (KB, block) constant — KB % nu == 0 makes it the same for every tile.

Requires block = 8*b1 with b1 % 128 == 0, b1 <= 512 (mid: 4096 = 8*512).
Reference: polyphase_analysis_padded.m:113-153's per-block IFFT role.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cfft

KB = 32  # spectra per grid step (multiple of every production nu)


def plan_chan_dft(block: int) -> Optional[Tuple[int, int]]:
    """(8, b1) split usable by the fused channel DFT, or None."""
    if block % 8:
        return None
    b1 = block // 8
    if b1 % 128 or b1 > 512:
        return None
    return 8, b1


_SQ = np.float64(np.sqrt(0.5))
#: w8^k = e^{-2pi i k/8} for k = 0..3 as (re, im) host constants
_W8 = ((1.0, 0.0), (_SQ, -_SQ), (0.0, -1.0), (-_SQ, -_SQ))


def _cmul_const(ar, ai, cr, ci):
    """(ar + i ai) * (cr + i ci) with host-constant c — special-cased for
    the trivial eighth roots so ±1/±i multiplies emit no FMA at all."""
    if (cr, ci) == (1.0, 0.0):
        return ar, ai
    if (cr, ci) == (-1.0, 0.0):
        return -ar, -ai
    if (cr, ci) == (0.0, -1.0):
        return ai, -ar
    if (cr, ci) == (0.0, 1.0):
        return -ai, ar
    if ci == 0.0:
        return ar * cr, ai * cr
    if cr == 0.0:
        return -ai * ci, ar * ci
    return ar * cr - ai * ci, ar * ci + ai * cr


def _dft2(a, b):
    return (a[0] + b[0], a[1] + b[1]), (a[0] - b[0], a[1] - b[1])


def _dft4(xs):
    """4-point DIT DFT of split-complex pairs (twiddle w4^1 = -i)."""
    e0, e1 = _dft2(xs[0], xs[2])
    o0, o1 = _dft2(xs[1], xs[3])
    t1 = _cmul_const(o1[0], o1[1], 0.0, -1.0)
    return [
        (e0[0] + o0[0], e0[1] + o0[1]),
        (e1[0] + t1[0], e1[1] + t1[1]),
        (e0[0] - o0[0], e0[1] - o0[1]),
        (e1[0] - t1[0], e1[1] - t1[1]),
    ]


def _dft8(xs: List[Tuple]) -> List[Tuple]:
    """8-point DIT DFT: b[k] = sum_n xs[n] e^{-2pi i n k / 8}."""
    ev = _dft4([xs[0], xs[2], xs[4], xs[6]])
    od = _dft4([xs[1], xs[3], xs[5], xs[7]])
    out = [None] * 8
    for k in range(4):
        tr, ti = _cmul_const(od[k][0], od[k][1], *_W8[k])
        out[k] = (ev[k][0] + tr, ev[k][1] + ti)
        out[k + 4] = (ev[k][0] - tr, ev[k][1] - ti)
    return out


@functools.lru_cache(maxsize=None)
def _constants(block: int, b1: int):
    """Twiddle W[k2, m1] = e^{-2pi i m1 k2 / block} (f32) and the outer
    b1-point forward DFT matrix as a Karatsuba split-bf16 triple."""
    k2, m1 = np.meshgrid(np.arange(8), np.arange(b1), indexing="ij")
    ang = -2.0 * np.pi * (m1.astype(np.float64) * k2) / block
    tw_r = np.cos(ang).astype(np.float32)
    tw_i = np.sin(ang).astype(np.float32)
    j, k = np.meshgrid(np.arange(b1), np.arange(b1), indexing="ij")
    ang = -2.0 * np.pi * ((j * k) % b1) / b1
    outer = cfft.karatsuba_consts(np.cos(ang), np.sin(ang))
    return tw_r, tw_i, outer


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def chan_dft_ramp(gr, gi, cr, ci, *, block: int, interpret: bool = False):
    """(P, NB, block) folded spectra → ramped channelized spectra, NB
    padded to KB internally (tail tiles compute garbage the caller keeps
    or slices — no pad/slice copy when NB % KB == 0)."""
    d8b1 = plan_chan_dft(block)
    assert d8b1 is not None
    _, b1 = d8b1
    n_pol, nb, _ = gr.shape
    nb_pad = -(-nb // KB) * KB
    if nb_pad != nb:
        pad = [(0, 0), (0, nb_pad - nb), (0, 0)]
        gr = jnp.pad(gr, pad)
        gi = jnp.pad(gi, pad)
    tw_r, tw_i, outer = _constants(block, b1)

    def kern(gr_ref, gi_ref, twr_ref, twi_ref,
             o1h, o1l, o2h, o2l, o3h, o3l, cr_ref, ci_ref,
             outr_ref, outi_ref):
        xr = gr_ref[0]   # (KB, block)
        xi = gi_ref[0]
        xs = [
            (xr[:, i * b1:(i + 1) * b1], xi[:, i * b1:(i + 1) * b1])
            for i in range(8)
        ]
        bs = _dft8(xs)                       # 8 x (KB, b1) split pairs
        # sublane-stack the 8 k2 planes and run ONE (8*KB, b1, b1)
        # Karatsuba GEMM against the SHARED outer matrix (the round-4
        # per-k2 form launched 8 M=KB GEMMs per step — M=32 tiles,
        # measured ~1.9 ms standalone at mid); the twiddle and the
        # derotation ramp are k2-major (8*KB, b1) host constants
        br_all = jnp.concatenate([b[0] for b in bs], axis=0)
        bi_all = jnp.concatenate([b[1] for b in bs], axis=0)
        twr = twr_ref[:]                     # (8*KB, b1), k2-major
        twi = twi_ref[:]
        ar = br_all * twr - bi_all * twi
        ai = br_all * twi + bi_all * twr
        outer_c = ((o1h[:], o1l[:]), (o2h[:], o2l[:]), (o3h[:], o3l[:]))
        dn = (((1,), (0,)), ((), ()))
        yr, yi = cfft.kar_dot(ar, ai, outer_c, dn)   # (8*KB, b1)
        rr = cr_ref[:]                       # ramp, k2-major (8*KB, b1)
        ri = ci_ref[:]
        # k2-major output planes (the lane interleave to channel order
        # 8*k1 + k2 is not a lowerable shape cast in-kernel — one XLA
        # transpose outside restores channel order)
        outr_ref[0] = (yr * rr - yi * ri).reshape(8, KB, b1)
        outi_ref[0] = (yr * ri + yi * rr).reshape(8, KB, b1)

    spec_x = pl.BlockSpec((1, KB, block), lambda p, b: (p, b, 0),
                          memory_space=pltpu.VMEM)
    spec_o = pl.BlockSpec((1, 8, KB, b1), lambda p, b: (p, 0, b, 0),
                          memory_space=pltpu.VMEM)

    def cspec(shape):
        return pl.BlockSpec(shape, lambda p, b: (0, 0),
                            memory_space=pltpu.VMEM)

    # the ramp constant arrives in TRUE channel order (KB, block); the
    # kernel consumes it per k2 plane — permute the tiny constant once
    cr_p = jnp.concatenate([cr[:, k2::8] for k2 in range(8)], axis=0)
    ci_p = jnp.concatenate([ci[:, k2::8] for k2 in range(8)], axis=0)
    # twiddle tiled k2-major to the stacked (8*KB, b1) GEMM layout
    tw_r = np.repeat(tw_r, KB, axis=0)
    tw_i = np.repeat(tw_i, KB, axis=0)
    consts = [tw_r, tw_i,
              outer[0][0], outer[0][1], outer[1][0], outer[1][1],
              outer[2][0], outer[2][1]]
    consts = [jnp.asarray(m) for m in consts]
    outr, outi = pl.pallas_call(
        kern,
        grid=(n_pol, nb_pad // KB),
        in_specs=[spec_x, spec_x] + [cspec(m.shape) for m in consts]
        + [cspec(cr_p.shape), cspec(ci_p.shape)],
        out_specs=[spec_o, spec_o],
        out_shape=[
            jax.ShapeDtypeStruct((n_pol, 8, nb_pad, b1), jnp.float32),
            jax.ShapeDtypeStruct((n_pol, 8, nb_pad, b1), jnp.float32),
        ],
        interpret=interpret,
    )(gr, gi, *consts, jnp.asarray(cr_p), jnp.asarray(ci_p))

    # restore channel order chan = k2 + 8*k1: one XLA transpose over the
    # kept stream (the composed four-step needed TWO of these plus a K=8
    # inner GEMM)
    def order(y):
        return jnp.transpose(y, (0, 2, 3, 1)).reshape(n_pol, nb_pad, block)

    return order(outr)[:, :nb], order(outi)[:, :nb]

"""Fused Pallas analysis PFB kernel.

The XLA-composed analysis pipeline materializes a (nblocks, padded_taps)
frame tensor in HBM (a ~16x blow-up of the input) and round-trips HBM
between framing, fold, DFT and ramp. This kernel fuses the whole chain into
ONE pallas_call per stream:

  * with L = lcm(step, block) and A = L/step output blocks per superblock,
    each grid step issues A DMAs per complex component, each shifted by
    a*step samples — after which every polyphase-fold term
    x[k*step + m*block + j] is a *lane-aligned static slice*
    xb[a][m*block//L + K, (m*block % L) + j] of a (rows, L) VMEM view
    (L is a multiple of block, so slices never cross rows and lane offsets
    are multiples of 128). No gathers, no frame tensor, input read ~A times
    from HBM instead of taps/step (~16) times. Only shifts whose lane
    offset a*step is NOT 128-aligned need a pre-staged shifted copy of the
    input — 128/gcd(step,128) copies (2 for the low config, 1 — i.e. none —
    when step % 128 == 0), the aligned remainder rides the DMA offset;
  * the complex DFT is a single (TILE, 2*block) @ (2*block, 2*block) MXU
    matmul against the [[Dr, Di], [-Di, Dr]] block matrix (see ops/cfft);
  * the phase-ramp derotation multiplies in VMEM and the result is written
    back transposed to the (pol, block, time) layout.

Mathematically identical to ops.analysis.polyphase_analysis (same fold +
DFT + ramp; differential-tested in tests/test_pallas.py). Requires
block % 128 == 0 (true for every production geometry: 256 / 4096 channels).
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils import geometry
from ...utils.rational import Rational
from .. import analysis as _analysis
from .. import cfft

#: VMEM budget for the DMA'd input spans (bytes, all components + shifts).
#: v5e scoped VMEM tops out at 16 MiB shared with the double-buffered output
#: tiles, the DFT matrix, ramps and the fold/matmul temporaries — 8 MiB of
#: spans pushed the real-hardware total past the limit, so keep the spans
#: small enough that the whole working set stays well under 16 MiB.
_SPAN_BUDGET = 1536 * 1024


def _plan(block: int, step: int, fl: int, nu: int) -> Tuple[int, int, int, int]:
    """Choose (TILE_K, L, A, NS2): spectra per grid step, superblock length,
    blocks per superblock, and VMEM rows per shifted span."""
    L = math.lcm(step, block)
    A = L // step
    tile = A

    def ns2(t):
        return t // A + -(-fl // L) + 1

    while True:
        cand = tile * 2
        if cand > 1024 or 2 * A * ns2(cand) * L * 4 > _SPAN_BUDGET:
            break
        tile = cand
    while tile % nu or tile % A:
        tile += A
    return tile, L, A, ns2(tile)


def _n_copies(step: int, sup_a: int) -> int:
    """Staged input copies needed: shifts a*step share copy (a mod this),
    with the 128-aligned remainder riding the in-kernel DMA offset."""
    return min(128 // math.gcd(step, 128), sup_a)


def _tail(step: int, sup_a: int, ns2: int, sup_l: int) -> int:
    """Samples needed past the last tile base: the largest in-kernel DMA
    offset is (a - a%p)*step within copy c <= p-1, so the input must extend
    (p-1 + (sup_a-1) - (sup_a-1)%p)*step + the span length."""
    p = _n_copies(step, sup_a)
    w = (p - 1) + (sup_a - 1) - (sup_a - 1) % p
    return w * step + ns2 * sup_l


def _kernel(
    *refs,                   # see layout below
    block: int, step: int, phases: int,
    tile_k: int, sup_l: int, sup_a: int, ns2: int, n_copies: int,
):
    # refs: xr copies [0..n_copies), xi copies, f2d (phases, block),
    # dblk hi/lo (2*block, 2*block), ramp re/im (TILE_K, block),
    # out re/im (2, TILE_K, block), scratch xbr/xbi (2, A, 2, NS2*L), sems.
    # Each copy c is the input advanced by c*step samples: in-kernel DMA
    # lane offsets must be 128-aligned, and only every
    # (128/gcd(step,128))-th shift is — the rest live in the copies.
    xr_c = refs[:n_copies]
    xi_c = refs[n_copies: 2 * n_copies]
    (f2d_ref, drh_ref, drl_ref, dih_ref, dil_ref, dsh_ref, dsl_ref,
     rampr_ref, rampi_ref, or_ref, oi_ref, xbr, xbi, sems) = \
        refs[2 * n_copies:]

    t = pl.program_id(1)
    pg = pl.program_id(0)   # polarization pair (HBM sublane tiling is 2)
    n_t = pl.num_programs(1)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)

    def dma(step_idx, slot_idx, a, c):
        hbm, buf = ((xr_c[a % n_copies], xbr), (xi_c[a % n_copies], xbi))[c]
        # base is a multiple of L (lane-tiling aligned); the aligned part
        # of the a*step shift rides the DMA offset, the residue lives in
        # the pre-staged copy (a % n_copies)
        base = step_idx * tile_k * step + (a - a % n_copies) * step
        return pltpu.make_async_copy(
            hbm.at[pl.ds(2 * pg, 2), pl.ds(base, ns2 * sup_l)],
            buf.at[slot_idx, a],
            sems.at[slot_idx, c, a],
        )

    def start(step_idx, slot_idx):
        for a in range(sup_a):
            for c in range(2):
                dma(step_idx, slot_idx, a, c).start()

    # double buffering: the grid iterates t innermost, so each step issues
    # the NEXT step's copies before blocking on its own — DMA rides under
    # the fold+GEMM instead of serializing ahead of them
    @pl.when(t == 0)
    def _():
        start(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start(t + 1, nxt)

    for a in range(sup_a):
        for c in range(2):
            dma(t, slot, a, c).wait()

    ksup = tile_k // sup_a
    f2d = f2d_ref[:]

    def fold(buf):
        accs = []
        for a in range(sup_a):
            view = buf[slot, a].reshape(2, ns2, sup_l)
            acc = jnp.zeros((2, ksup, block), jnp.float32)
            for m in range(phases):
                ob = m * block
                p_, rem = divmod(ob, sup_l)  # rem is a multiple of block
                acc = acc + f2d[m] * view[:, p_: p_ + ksup, rem: rem + block]
            accs.append(acc)
        # folded[p, k = K*A + a] = accs[a][p, K]
        return jnp.stack(accs, axis=2).reshape(2 * tile_k, block)

    # bare-bf16 MXU passes give ~3e-3 relative error — far above the −60 dB
    # purity floor — so the DFT GEMMs run split-bf16x3 in the Karatsuba
    # 3-multiplication complex form (cfft.kar_dot expanded inline): 25%
    # fewer MXU flops than the (2n x 2n) block-matrix GEMM. The t1 GEMM is
    # issued between the two VPU folds so Mosaic can overlap MXU and VPU
    # work instead of serializing fold_r, fold_i, then all GEMMs.
    dn = (((1,), (0,)), ((), ()))
    fr = fold(xbr)
    t1 = cfft._dot1(fr, drh_ref[:], drl_ref[:], dn)
    fi = fold(xbi)
    t2 = cfft._dot1(fi, dih_ref[:], dil_ref[:], dn)
    t3 = cfft._dot1(fr + fi, dsh_ref[:], dsl_ref[:], dn)
    re = t1 - t2
    im = t3 - t1 - t2
    sr = (re * block).reshape(2, tile_k, block)
    si = (im * block).reshape(2, tile_k, block)

    rr = rampr_ref[:]
    ri = rampi_ref[:]
    # time-major (2, TILE_K, block) writes — no in-kernel transpose (lane↔
    # sublane crossings are expensive); callers that want the channel-major
    # (P, block, T) public layout transpose once in XLA outside
    or_ref[...] = sr * rr - si * ri
    oi_ref[...] = sr * ri + si * rr


@functools.partial(
    jax.jit, static_argnames=("block", "step", "fl", "interpret")
)
def _fused_call(xr, xi, f2d, dkar, rampr, rampi, *, block, step,
                fl, interpret=False):
    n_pol, n_pad = xr.shape
    phases = fl // block
    tile_k = rampr.shape[0]
    sup_l = math.lcm(step, block)
    sup_a = sup_l // step
    ns2 = tile_k // sup_a + -(-fl // sup_l) + 1
    tail = _tail(step, sup_a, ns2, sup_l)
    nblocks_pad = (n_pad - tail) // (tile_k * step) + 1

    # pre-stage only the shifts the DMA engine cannot address: lane offsets
    # must be 128-aligned, so shifts a*step with the same residue mod
    # (128/gcd(step,128)) share one staged copy (copy 0 is the input
    # itself). The round-2 kernel staged all A shifts — for the low config
    # that stack alone cost ~1.1 ms, more than the kernel's own math.
    n_copies = _n_copies(step, sup_a)
    n_shift = (nblocks_pad - 1) * tile_k * step + ns2 * sup_l \
        + (sup_a - 1 - (sup_a - 1) % n_copies) * step
    xr_c, xi_c = [xr], [xi]  # copy 0 is the input itself — no staging copy
    for c in range(1, n_copies):
        xr_c.append(
            jax.lax.dynamic_slice_in_dim(xr, c * step, n_shift, axis=1)
        )
        xi_c.append(
            jax.lax.dynamic_slice_in_dim(xi, c * step, n_shift, axis=1)
        )

    kern = functools.partial(
        _kernel, block=block, step=step, phases=phases,
        tile_k=tile_k, sup_l=sup_l, sup_a=sup_a, ns2=ns2, n_copies=n_copies,
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
            pl.BlockSpec(memory_space=pl.ANY)
            for _ in range(2 * n_copies)
        ] + [
            pl.BlockSpec((phases, block), lambda p, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec((block, block), lambda p, t: (0, 0),
                         memory_space=pltpu.VMEM)
            for _ in range(6)
        ] + [
            pl.BlockSpec((tile_k, block), lambda p, t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_k, block), lambda p, t: (0, 0),
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
            pltpu.VMEM((2, sup_a, 2, ns2 * sup_l), jnp.float32),
            pltpu.VMEM((2, sup_a, 2, ns2 * sup_l), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, sup_a)),
        ],
        interpret=interpret,
    )(*xr_c, *xi_c, f2d, *dkar, rampr, rampi)


def polyphase_analysis_fused(
    x,
    filt,
    block: int,
    os_factor,
    *,
    block0: int = 0,
    time_major: bool = False,
    keep_padding: bool = False,
    interpret: bool = False,
):
    """Fused single-stage analysis PFB (drop-in for
    ops.polyphase_analysis). Complex/tuple in → same kind out.

    ``time_major=True`` returns (n_pol, nblocks, block) — the kernel's
    native write layout and exactly the input layout of the fused
    synthesis, so a fused round trip skips two full-stream transposes.

    ``keep_padding=True`` (tuple + time_major only) returns
    ``((outr, outi), nblocks)`` with the kernel's tail padding still in
    place — hand the pair to ``polyphase_synthesis_fused(...,
    valid_len=nblocks)`` and the inter-stage slice copy never happens."""
    os_factor = Rational.coerce(os_factor)
    if block % 128:
        raise ValueError("fused kernel requires block % 128 == 0")
    pair_in = isinstance(x, tuple)
    if pair_in:
        xr, xi = x
    else:
        if hasattr(x, "ndim") and x.ndim == 3:
            x = x[:, 0, :]
        xr, xi = cfft.split(x)
    if xr.ndim == 3:
        xr, xi = xr[:, 0, :], xi[:, 0, :]
    if block0 % os_factor.nu:
        raise ValueError("block0 must be a multiple of nu for the fused kernel")

    step = geometry.analysis_step(block, os_factor)
    f2d = _analysis._prep_filter(filt, block)
    phases = f2d.shape[0]
    fl = phases * block
    nu = os_factor.nu
    tile_k, sup_l, sup_a, ns2 = _plan(block, step, fl, nu)

    n_pol, n_dat = xr.shape
    pol_pad = n_pol % 2
    nblocks = (n_dat - fl) // step
    nblocks_pad = max(1, -(-nblocks // tile_k))
    tail = _tail(step, sup_a, ns2, sup_l)
    n_pad = (nblocks_pad - 1) * tile_k * step + tail
    pad = max(0, n_pad - n_dat)
    if pad > 0 or pol_pad:
        xr = jnp.pad(jnp.asarray(xr), [(0, pol_pad), (0, pad)])[:, :n_pad]
        xi = jnp.pad(jnp.asarray(xi), [(0, pol_pad), (0, pad)])[:, :n_pad]
    else:
        xr, xi = jnp.asarray(xr)[:, :n_pad], jnp.asarray(xi)[:, :n_pad]

    dr, di, _ = cfft._dft_parts(block, inverse=False)
    dkar = [
        jnp.asarray(m)
        for pair in cfft.karatsuba_consts(dr, di)
        for m in pair
    ]
    rr4, ri4 = _analysis._phase_ramp(block, step, nu, 0)
    rampr = np.tile(rr4, (tile_k // nu, 1))
    rampi = np.tile(ri4, (tile_k // nu, 1))

    outr, outi = _fused_call(
        xr, xi,
        jnp.asarray(f2d), tuple(dkar),
        jnp.asarray(rampr), jnp.asarray(rampi),
        block=block, step=step, fl=fl, interpret=interpret,
    )
    if keep_padding:
        if not (pair_in and time_major):
            raise ValueError(
                "keep_padding requires tuple input and time_major=True"
            )
        if pol_pad:
            outr, outi = outr[:n_pol], outi[:n_pol]
        return (outr, outi), nblocks
    outr = outr[:n_pol, :nblocks, :]
    outi = outi[:n_pol, :nblocks, :]
    if not time_major:
        outr = jnp.swapaxes(outr, -1, -2)
        outi = jnp.swapaxes(outi, -1, -2)
    return (outr, outi) if pair_in else cfft.combine(outr, outi)

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
import os as _os
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
    blocks per superblock, and VMEM rows per shifted span. TILE_K / A (the
    spectra per shift, = the scratch's K rows) must be a multiple of 8 so
    the fold's K-blocked sublane slices stay 8-aligned."""
    L = math.lcm(step, block)
    A = L // step
    tile = A

    nc = _n_copies(step, A)
    cap = int(_os.environ.get("SKA_PST_ANALYSIS_TILE_CAP", "128"))
    while True:
        cand = tile * 2
        if (cand > cap
                or 2 * nc * (_ns2(cand // A, step, A, fl, L) + 8) * L * 4
                > _SPAN_BUDGET):
            break
        tile = cand
    while tile % nu or tile % A or (tile // A) % 8:
        tile += A
    return tile, L, A, _ns2(tile // A, step, A, fl, L)


def _n_copies(step: int, sup_a: int) -> int:
    """Staged input copies (= spans fetched per grid step): shifts a*step
    share copy (a mod this). When gcd(step, 128) >= 64 the fold addresses
    EVERY shift's lane residue itself with 64-lane-granular value columns,
    so ONE un-staged span serves all shifts (half the DMA traffic and no
    staged-copy passes); coarser-grained steps fall back to one copy per
    128-alignment residue class."""
    if math.gcd(step, 128) >= 64:
        return 1
    return min(128 // math.gcd(step, 128), sup_a)


def _row_off_max(step: int, sup_a: int, fl: int, sup_l: int) -> int:
    """Largest span-row offset any fold term's last sample reaches: term
    (a, m) spans flat offsets [lam_a + m*block, + block) of its span,
    lam_a = (a - a%n_copies)*step < sup_l being the lane residue the DMA
    cannot absorb (it shifts rows, and row shifts must stay 8-aligned)."""
    n_copies = _n_copies(step, sup_a)
    lam_max = (sup_a - 1 - (sup_a - 1) % n_copies) * step
    return (lam_max + fl - 1) // sup_l


def _ns2(ksup: int, step: int, sup_a: int, fl: int, sup_l: int) -> int:
    """DMA'd span rows per shift, rounded to 8 (Mosaic requires sublane
    slice LENGTHS 8-aligned too, not just offsets)."""
    ro = _row_off_max(step, sup_a, fl, sup_l)
    return -(-(ksup + ro + 1) // 8) * 8


def _fold_geom(step: int, sup_a: int, sup_l: int, fl: int,
               ksup: int) -> Tuple[int, int]:
    """(H, NS2_PAD): sublane height of the fold's K-window value loads and
    the scratch row count. Fold terms for window K ∈ [K8, K8+8) touch
    span rows [K8 + p, K8 + p + 8) with p ≤ row_off_max, so each window
    loads H = ceil((row_off_max + 8)/8)*8 rows; the scratch holds
    max(ksup - 8 + H, NS2) rows (rows past the DMA'd NS2 stay
    uninitialized — loaded into window values but never multiplied)."""
    ro = _row_off_max(step, sup_a, fl, sup_l)
    h = -(-(ro + 8) // 8) * 8
    return h, max(ksup - 8 + h, _ns2(ksup, step, sup_a, fl, sup_l))


def _kernel(
    *refs,                   # see layout below
    block: int, step: int, phases: int,
    tile_k: int, sup_l: int, sup_a: int, ns2: int, n_copies: int,
):
    # refs: xr copies [0..n_copies), xi copies — each (P, NR, sup_l) row-
    # structured HBM views (free reshape of the flat stream); f2d (phases,
    # block); Karatsuba DFT hi/lo pairs (block, block); ramp re/im
    # (TILE_K, block); out re/im (2, TILE_K, block); scratch xbr/xbi
    # (2, A, 2, NS2_PAD, SUP_L) row-structured spans; fsr/fsi
    # (2, TILE_K, block) fold staging; sems.
    #
    # Each copy c is the input advanced by c*step samples: DMA lane offsets
    # must be 128-aligned, and only every (128/gcd(step,128))-th shift is —
    # the rest live in the copies. Each span is ONE aligned rectangular
    # row DMA (rows r0..r0+ns2 of the 3D view); the remaining aligned lane
    # residue lam = (a - a%n_copies)*step of each shift is applied in the
    # FOLD's term addressing (value slices carry no alignment rules), with
    # terms that straddle a row boundary assembled from two lane pieces of
    # adjacent row windows. The round-3 kernel's flat spans instead forced
    # a ~233 KB value per shift whose 13 overlapping slices spilled vector
    # registers (~6-9 MB/step of spill traffic, half the kernel's time).
    xr_c = refs[:n_copies]
    xi_c = refs[n_copies: 2 * n_copies]
    (f2d_ref, drh_ref, drl_ref, dih_ref, dil_ref, dsh_ref, dsl_ref,
     rampr_ref, rampi_ref, or_ref, oi_ref, xbr, xbi, fsr, fsi, sems) = \
        refs[2 * n_copies:]

    t = pl.program_id(1)
    pg = pl.program_id(0)   # polarization pair (HBM sublane tiling is 2)
    n_t = pl.num_programs(1)
    slot = jax.lax.rem(t, 2)
    nxt = jax.lax.rem(t + 1, 2)
    ksup = tile_k // sup_a
    h, _ = _fold_geom(step, sup_a, sup_l, phases * block, ksup)

    # shifts a and a + n_copies read the SAME span (the sub-span part of
    # the shift lives in the fold's term addressing), so only one span per
    # staged copy is ever fetched — sup_a/n_copies times less DMA traffic
    # than one-span-per-shift
    def dma(step_idx, slot_idx, cp, c):
        hbm, buf = ((xr_c[cp], xbr), (xi_c[cp], xbi))[c]
        r0 = step_idx * ksup
        return pltpu.make_async_copy(
            hbm.at[pl.ds(2 * pg, 2), pl.ds(r0, ns2), :],
            buf.at[slot_idx, cp, :, pl.ds(0, ns2), :],
            sems.at[slot_idx, c, cp],
        )

    def start(step_idx, slot_idx):
        for cp in range(n_copies):
            for c in range(2):
                dma(step_idx, slot_idx, cp, c).start()

    # double buffering: the grid iterates t innermost, so each step issues
    # the NEXT step's copies before blocking on its own — DMA rides under
    # the fold+GEMM instead of serializing ahead of them
    @pl.when(t == 0)
    def _():
        start(t, slot)

    @pl.when(t + 1 < n_t)
    def _():
        start(t + 1, nxt)

    for cp in range(n_copies):
        for c in range(2):
            dma(t, slot, cp, c).wait()

    f2d = f2d_ref[:]

    def fold(buf, fs):
        # K-blocked: each (a, K8) loads one (2, H, sup_l) window value —
        # small enough to live in vector registers — shifts it per row
        # offset p on sublanes (one shuffle shared by all terms at that
        # offset), and accumulates (2, 8, block) FULL-SUBLANE madds.
        # Output rows k = (K8+k8)*A + a assemble a-minor, so each K8
        # writes one aligned 8*A-row group into the fold staging scratch.
        for K8 in range(0, ksup, 8):
            accs = []
            for a in range(sup_a):
                lam = (a - a % n_copies) * step
                v = buf[slot, a % n_copies, :, K8: K8 + h, :]  # (2, H, sup_l)
                wins = {}

                def win(p):
                    if p not in wins:
                        wins[p] = v[:, p: p + 8, :] if (h > 8 or p) else v
                    return wins[p]

                # accumulate per lane column — 128 lanes when this shift's
                # residue is 128-aligned, 64 otherwise (merged spans put
                # odd shifts at 64-lane offsets): at column granularity no
                # term piece ever straddles a span row (column width
                # divides sup_l), and the per-column accumulators share
                # one layout so the final lane concat is trivially
                # lowerable (concat of mismatched sublane-offset windows
                # is not)
                w = 128 if lam % 128 == 0 else 64
                cols = [jnp.zeros((2, 8, w), jnp.float32)
                        for _ in range(block // w)]
                for m in range(phases):
                    for j in range(block // w):
                        p, lc = divmod(lam + m * block + j * w, sup_l)
                        cols[j] = cols[j] + (
                            f2d[m, j * w:(j + 1) * w]
                            * win(p)[:, :, lc: lc + w]
                        )
                accs.append(jnp.concatenate(cols, axis=2))
            g = jnp.stack(accs, axis=2).reshape(2, 8 * sup_a, block)
            fs[:, pl.ds(K8 * sup_a, 8 * sup_a), :] = g

    # bare-bf16 MXU passes give ~3e-3 relative error — far above the −60 dB
    # purity floor — so the DFT GEMMs run split-bf16x3 in the Karatsuba
    # 3-multiplication complex form (cfft.kar_dot expanded inline): 25%
    # fewer MXU flops than the (2n x 2n) block-matrix GEMM. The t1 GEMM is
    # issued between the two VPU folds so Mosaic can overlap MXU and VPU
    # work instead of serializing fold_r, fold_i, then all GEMMs.
    dn = (((1,), (0,)), ((), ()))
    fold(xbr, fsr)
    fr = fsr[:].reshape(2 * tile_k, block)
    t1 = cfft._dot1(fr, drh_ref[:], drl_ref[:], dn)
    fold(xbi, fsi)
    fi = fsi[:].reshape(2 * tile_k, block)
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
    ksup = tile_k // sup_a
    ns2 = _ns2(ksup, step, sup_a, fl, sup_l)
    _, ns2_pad = _fold_geom(step, sup_a, sup_l, fl, ksup)
    nblocks_pad = (n_pad // sup_l - ns2) // ksup + 1

    # pre-stage only the shifts the DMA engine cannot address: lane offsets
    # must be 128-aligned, so shifts a*step with the same residue mod
    # (128/gcd(step,128)) share one staged copy (copy 0 is the input
    # itself). The round-2 kernel staged all A shifts — for the low config
    # that stack alone cost ~1.1 ms, more than the kernel's own math.
    # Every copy is viewed ROW-STRUCTURED (P, NR, sup_l) — a free reshape —
    # so the kernel's rectangular piece DMAs can address rows directly.
    n_copies = _n_copies(step, sup_a)
    n_rows = (nblocks_pad - 1) * ksup + ns2
    xr_c = [xr[:, : n_rows * sup_l].reshape(n_pol, n_rows, sup_l)]
    xi_c = [xi[:, : n_rows * sup_l].reshape(n_pol, n_rows, sup_l)]
    for c in range(1, n_copies):
        xr_c.append(
            jax.lax.dynamic_slice_in_dim(
                xr, c * step, n_rows * sup_l, axis=1
            ).reshape(n_pol, n_rows, sup_l)
        )
        xi_c.append(
            jax.lax.dynamic_slice_in_dim(
                xi, c * step, n_rows * sup_l, axis=1
            ).reshape(n_pol, n_rows, sup_l)
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
            pltpu.VMEM((2, n_copies, 2, ns2_pad, sup_l), jnp.float32),
            pltpu.VMEM((2, n_copies, 2, ns2_pad, sup_l), jnp.float32),
            pltpu.VMEM((2, tile_k, block), jnp.float32),
            pltpu.VMEM((2, tile_k, block), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 2, n_copies)),
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
    # row-structured coverage: the kernel's piece DMAs read rows up to
    # (nblocks_pad-1)*ksup + ns2 of each staged copy, and copy c starts
    # c*step into the stream
    ksup = tile_k // sup_a
    n_rows = (nblocks_pad - 1) * ksup + ns2
    n_pad = n_rows * sup_l + (_n_copies(step, sup_a) - 1) * step
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

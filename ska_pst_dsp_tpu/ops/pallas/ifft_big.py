"""Out-of-core fused backward FFT epilogue for SKA-Mid-class geometries.

The single-kernel epilogue (ops/pallas/ifft_fused.py) requires the whole
N-point block in VMEM — impossible for mid's N = 1,835,008-point backward
FFT (polyphase_synthesis.m:285 at 4096 channels), whose split-complex
spectrum alone is 14.7 MB. This module runs the same mathematics as TWO
pallas_calls with a three-factor decomposition N = (p*q) * n1, n2 = p*q:

  time   t = k2 + n2*k1          (k2 in [0,n2), k1 in [0,n1))
  freq   f = n1*i2 + i1          (i2 in [0,n2), i1 in [0,n1))
  k2     = gamma + p*delta       (gamma in [0,p), delta in [0,q))
  i2     = q*alpha + beta        (alpha in [0,p), beta in [0,q))

  y[t] = (gain/N) * sum_f X[f] e^{+2pi i f t / N}
       = sum_{i1} e^{2pi i i1 k1/n1} W[k2,i1] sum_{i2} X3[i2,i1] e^{2pi i i2 k2/n2}

Kernel 1 (inner, grid over i1 column chunks x gamma):
  * p-point DFT over alpha on the VPU (p <= 8: explicit FMA fan-in),
  * per-gamma twiddle e^{2pi i beta gamma/n2},
  * q-point DFT over beta as a sublane-contraction Karatsuba GEMM,
  writing A[k2, i1] laid out as (gamma, i1, delta) — each GEMM's natural
  (rows=i1-chunk, lanes=delta) tile, no transposes.

Kernel 2 (outer, grid over gamma x delta chunks):
  * the N-level twiddle W[k2, i1] = e^{2pi i i1 k2 / N} delivered as a
    BlockSpec-tiled host constant, one (n1, CHUNK) tile per (gamma,
    delta) step (the in-kernel transcendental version cost ~65k sin+cos
    lanes per grid step — measured 2-3 ms per mid bench step),
  * the DC-centering roll by s (modulation theorem, as in ifft_fused):
    e^{-2pi i s k2/N} rides a host-computed (p, q) constant (s*k2 overflows
    int32 — host does the exact mod), e^{-2pi i s n2 k1/N} scales the outer
    matrix's kept columns,
  * the outer n1-point DFT over i1 as a sublane-contraction Karatsuba GEMM
    against kept columns k1 in [lo/n2, n1 - lo/n2) only — the
    overlap-save discard is never computed.

The kept tiles (gamma, delta, k1) reorder to the time series with one XLA
transpose over the kept output only. Spectral taper / dedispersion chirp
fold into an optional per-bin complex constant applied in kernel 1.

Memory per N-point block: read X twice, write A once, write the kept half
once (~52 bytes/output sample) vs ~8 full-spectrum round trips for the
composed four-step path.

Differential-tested against the composed assemble+cfft.ifft path in
tests/test_pallas.py. Reference: polyphase_synthesis.m:253-316.
"""

from __future__ import annotations

import functools
import os as _os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import cfft

_CHUNK = 128  # i1 / delta chunk width (lanes)


def _chunk2(q: int) -> int:
    """Kernel 2's delta-axis chunk: as wide as q allows up to 256."""
    return 256 if q % 256 == 0 else _CHUNK


def plan_big_ifft(n: int, lo: int) -> Optional[Tuple[int, int, int]]:
    """(p, q, n1) three-factor split usable by the out-of-core epilogue,
    or None. Wants n1 <= 512 (n1 % 128 == 0), q <= 512 (q % 128 == 0:
    the delta axis chunks at _CHUNK lanes), p <= 8, lo % n2 == 0, and
    exact fp32 twiddle phases (n1*n2 < 2^24)."""
    try:
        n1 = cfft._split_factor(n)
    except ValueError:
        return None
    n2 = n // n1
    if n1 % 128 or n1 > 512 or (n - 2 * lo) <= 0 or lo % n2:
        return None
    if (n1 - 1) * (n2 - 1) >= 2 ** 24:
        return None
    # largest q <= 512 dividing n2 with p = n2/q <= 8 (q % 128 == 0: the
    # delta axis chunks at _CHUNK lanes)
    q = 0
    for cand in range(min(512, n2), 0, -1):
        if n2 % cand == 0 and n2 // cand <= 8 and cand % _CHUNK == 0:
            q = cand
            break
    if not q or (n - 2 * lo) % n2:
        return None
    return n2 // q, q, n1


def _use_radix4(q: int) -> bool:
    """Kernel 1's beta-DFT runs the radix-4 split (4x fewer MXU MACs:
    q/4 per point instead of q at q=512) when the sub-factor qm = q/4
    is lane-aligned (every sub-tile stays >= 128 lanes wide — a radix-8
    split would leave 64-lane tiles, below Mosaic's block minimum)."""
    if _os.environ.get("SKA_PST_IFFT_BIG_DENSE") == "1":
        return False
    return q % 4 == 0 and (q // 4) % 128 == 0


def _k2_radix(n1: int, n1_keep: int, k1_lo: int) -> bool:
    """Kernel 2 runs the radix-4 split of its i1 contraction when the
    row groups stay sublane-aligned and the kept k1 = r1 + 4*m1 range
    has the same m1 span for every r1."""
    if _os.environ.get("SKA_PST_IFFT_BIG_DENSE2") == "1":
        return False
    return (n1 % 4 == 0 and (n1 // 4) % 8 == 0
            and n1_keep % 4 == 0 and k1_lo % 4 == 0)


def _idft4(xs):
    """4-point INVERSE DFT (e^{+2pi i h r/4}, twiddles 1/+i/-1/-i only)
    of split-complex (re, im) pairs."""
    (a, b, c, d) = xs
    e0 = (a[0] + c[0], a[1] + c[1])
    e1 = (a[0] - c[0], a[1] - c[1])
    o0 = (b[0] + d[0], b[1] + d[1])
    # +i * (b - d)
    o1 = (-(b[1] - d[1]), b[0] - d[0])
    return [
        (e0[0] + o0[0], e0[1] + o0[1]),
        (e1[0] + o1[0], e1[1] + o1[1]),
        (e0[0] - o0[0], e0[1] - o0[1]),
        (e1[0] - o1[0], e1[1] - o1[1]),
    ]


@functools.lru_cache(maxsize=None)
def _radix_consts(q: int):
    """Host constants for kernel 1's radix-4 beta split (beta = b1 + qm*h,
    delta = r + 4*m): the r-twiddle t[r, b1] = e^{+2pi i b1 r / q} and the
    qm-point inverse-DFT Karatsuba triple E[b1, m] = e^{+2pi i b1 m/qm}."""
    qm = q // 4
    r, b1 = np.meshgrid(np.arange(4), np.arange(qm), indexing="ij")
    ang = 2.0 * np.pi * (r.astype(np.float64) * b1) / q
    t_r = np.cos(ang).astype(np.float32)
    t_i = np.sin(ang).astype(np.float32)
    b1, m = np.meshgrid(np.arange(qm), np.arange(qm), indexing="ij")
    ang = 2.0 * np.pi * ((b1 * m) % qm) / qm
    eqm = cfft.karatsuba_consts(np.cos(ang), np.sin(ang))
    return t_r, t_i, eqm


@functools.lru_cache(maxsize=None)
def _constants(n: int, p: int, q: int, n1: int, lo: int, roll: int,
               gain: float, radix: bool = False):
    """Host constants: c7 (p, p) alpha-DFT; tw2 (p, q) beta twiddle;
    Dq (q, q) Karatsuba; rollw (p, q) gain + k2-roll factor;
    outer (n1, n1_keep) Karatsuba with the k1-roll factor folded.

    ``radix``: kernel 1 emits delta in PERMUTED order j = r*qm + m for
    delta = r + 4*m (the radix-4 split's natural output order) — the
    delta-indexed constants (rollw, W) are built on that grid and the
    final time reorder accounts for it (one XLA transpose either way)."""
    n2 = p * q
    k1_lo = lo // n2
    n1_keep = (n - 2 * lo) // n2
    if radix:
        qm = q // 4
        j = np.arange(q)
        delta_of_j = (j // qm) + 4 * (j % qm)
    else:
        delta_of_j = np.arange(q)

    g, a = np.meshgrid(np.arange(p), np.arange(p), indexing="ij")
    c7 = np.exp(2j * np.pi * g * a / p)

    g, b = np.meshgrid(np.arange(p), np.arange(q), indexing="ij")
    tw2 = np.exp(2j * np.pi * g.astype(np.float64) * b / n2)

    b, d = np.meshgrid(np.arange(q), np.arange(q), indexing="ij")
    ang = 2.0 * np.pi * ((b * d) % q) / q
    dq = cfft.karatsuba_consts(np.cos(ang), np.sin(ang))

    g = np.arange(p)[:, None]
    k2 = g + p * delta_of_j[None, :]
    rollw = (gain / n) * np.exp(-2j * np.pi * roll * k2.astype(np.float64) / n)

    # N-level twiddle W[k2, i1] = e^{2pi i i1 k2 / n} as (p, q/CHUNK2, n1,
    # CHUNK2) host constants, BlockSpec-delivered per (gamma, delta) tile:
    # computing it in-kernel cost ~65k transcendental lanes per grid step.
    # Kernel 2's delta chunk is wider than kernel 1's i1 chunk (whose
    # (n2, CHUNK) input slab is the VMEM bound): fewer, fatter outer GEMMs.
    chunk2 = _chunk2(q)
    nch_d = q // chunk2
    i1 = np.arange(n1, dtype=np.float64)[:, None]
    w_r = np.empty((p, nch_d, n1, chunk2), np.float32)
    w_i = np.empty((p, nch_d, n1, chunk2), np.float32)
    for gg in range(p):
        for dd in range(nch_d):
            dj = delta_of_j[dd * chunk2: (dd + 1) * chunk2].astype(np.float64)
            kk2 = gg + p * dj
            ang = 2.0 * np.pi * (i1 * kk2[None, :] % n) / n
            w_r[gg, dd] = np.cos(ang)
            w_i[gg, dd] = np.sin(ang)

    i1, j = np.meshgrid(np.arange(n1), np.arange(n1_keep), indexing="ij")
    k1 = k1_lo + j
    ang = 2.0 * np.pi * ((i1 * k1) % n1) / n1
    uang = -2.0 * np.pi * roll * n2 * k1.astype(np.float64) / n
    d1 = np.exp(1j * ang) * np.exp(1j * uang)
    outer = cfft.karatsuba_consts(np.real(d1), np.imag(d1))

    # kernel-2 radix-4 over i1 (i1 = i + (n1/4)*h, k1 = r1 + 4*m1; see
    # _k2_radix): the r1-twiddle t[r1, i] = e^{2pi i i r1/n1} carrying
    # the r1 part of the roll factor, and the SHARED kept-column DFT
    # E[i, j] = e^{2pi i i m1/(n1/4)} * u(4*m1) — the kept m1 range is
    # identical for every r1 (k1_lo % 4 == 0 gate)
    rx = None
    if _k2_radix(n1, n1_keep, k1_lo):
        q4 = n1 // 4
        r1, i = np.meshgrid(np.arange(4), np.arange(q4), indexing="ij")
        ang = (2.0 * np.pi * (i.astype(np.float64) * r1) / n1
               - 2.0 * np.pi * roll * n2 * r1 / n)
        rx_tr = np.cos(ang).astype(np.float32).reshape(4 * q4, 1)
        rx_ti = np.sin(ang).astype(np.float32).reshape(4 * q4, 1)
        m1 = k1_lo // 4 + np.arange(n1_keep // 4, dtype=np.float64)
        i, mm = np.meshgrid(np.arange(q4, dtype=np.float64), m1,
                            indexing="ij")
        ang = (2.0 * np.pi * ((i * mm) % q4) / q4
               - 2.0 * np.pi * roll * n2 * 4.0 * mm / n)
        rx_e = cfft.karatsuba_consts(np.cos(ang), np.sin(ang))
        rx = (rx_tr, rx_ti, rx_e)

    f32 = lambda x: np.ascontiguousarray(x, dtype=np.float32)  # noqa: E731
    return (
        f32(c7.real), f32(c7.imag),
        f32(tw2.real), f32(tw2.imag),
        dq,
        f32(rollw.real), f32(rollw.imag),
        outer,
        (w_r, w_i),
        rx,
    )


@functools.partial(
    jax.jit, static_argnames=("shape_key", "has_elem", "interpret")
)
def fused_big_ifft_oc(
    flatr, flati,              # (P, B, N) assembled (unrolled) spectra
    elem_r=None, elem_i=None,  # optional (N,) pre-roll elementwise factor
    *,
    shape_key,                 # (n, p, q, n1, lo, roll, gain) — static
    has_elem: bool = False,
    interpret: bool = False,
):
    """Out-of-core fused IFFT(roll(X*elem, -roll))*gain, keeping
    [lo, N-lo). Returns (P, B, keep) kept time series as (re, im)."""
    n, p, q, n1, lo, roll, gain = shape_key
    n2 = p * q
    n_pol, n_blocks, n_flat = flatr.shape
    assert n_flat == n
    n1_keep = (n - 2 * lo) // n2
    radix = _use_radix4(q)
    qm = q // 4
    (c7r, c7i, tw2r, tw2i, dq, rollr, rolli, outer, (w_r, w_i),
     rx) = _constants(n, p, q, n1, lo, roll, gain, radix)
    k1_lo = lo // n2
    radix2 = rx is not None
    if radix:
        t4r, t4i, eqm = _radix_consts(q)
        t4r = t4r.reshape(4 * qm, 1)
        t4i = t4i.reshape(4 * qm, 1)
    else:
        t4r = np.zeros((8, 128), np.float32)
        t4i = np.zeros((8, 128), np.float32)
    nchunk = n1 // _CHUNK

    x3r = flatr.reshape(n_pol, n_blocks, n2, n1)
    x3i = flati.reshape(n_pol, n_blocks, n2, n1)

    # ---- kernel 1: inner n2-point DFT per i1 column --------------------
    def kern1(xr_ref, xi_ref, c7r_ref, c7i_ref, tw2r_ref, tw2i_ref,
              q1h, q1l, q2h, q2l, q3h, q3l, t8r_ref, t8i_ref,
              er_ref, ei_ref, outr_ref, outi_ref):
        g = pl.program_id(3)
        # p-point DFT over alpha (rows q*alpha+beta of the (n2, C) tile)
        ar = jnp.zeros((q, _CHUNK), jnp.float32)
        ai = jnp.zeros((q, _CHUNK), jnp.float32)
        for alpha in range(p):
            xr_a = xr_ref[0, 0, alpha * q:(alpha + 1) * q, :]
            xi_a = xi_ref[0, 0, alpha * q:(alpha + 1) * q, :]
            if has_elem:
                er_a = er_ref[0, alpha * q:(alpha + 1) * q, :]
                ei_a = ei_ref[0, alpha * q:(alpha + 1) * q, :]
                xr_a, xi_a = (
                    xr_a * er_a - xi_a * ei_a,
                    xr_a * ei_a + xi_a * er_a,
                )
            cr = c7r_ref[g, alpha]
            ci = c7i_ref[g, alpha]
            ar = ar + (cr * xr_a - ci * xi_a)
            ai = ai + (cr * xi_a + ci * xr_a)
        # beta twiddle e^{2pi i beta*gamma/n2} — (q, 1) broadcast
        t2r = tw2r_ref[g].reshape(q, 1)
        t2i = tw2i_ref[g].reshape(q, 1)
        br = ar * t2r - ai * t2i
        bi = ar * t2i + ai * t2r
        dn = (((0,), (0,)), ((), ()))
        if radix:
            # radix-4 split of the q-point beta DFT (beta = b1 + qm*h,
            # delta = r + 4*m): e^{2pi i beta delta/q} = w4[h,r] *
            # t[r,b1] * E[b1,m]. A trivial-twiddle 4-point VPU inverse
            # DFT over the aligned qm-row groups, the r-twiddle, then
            # ONE shared (K=qm) Karatsuba GEMM with all 4 r-planes
            # lane-stacked — 4x fewer MXU MACs than the dense q x q
            # product, and every tile stays >= 128 lanes wide.
            zs = _idft4([
                (br[h * qm:(h + 1) * qm], bi[h * qm:(h + 1) * qm])
                for h in range(4)
            ])
            zr_parts, zi_parts = [], []
            for r in range(4):
                tr = t8r_ref[r * qm:(r + 1) * qm, :]
                ti = t8i_ref[r * qm:(r + 1) * qm, :]
                zr, zi = zs[r]
                zr_parts.append(zr * tr - zi * ti)
                zi_parts.append(zr * ti + zi * tr)
            zr_all = jnp.concatenate(zr_parts, axis=1)   # (qm, 4*CHUNK)
            zi_all = jnp.concatenate(zi_parts, axis=1)
            consts = ((q1h[:], q1l[:]), (q2h[:], q2l[:]), (q3h[:], q3l[:]))
            yr, yi = cfft.kar_dot(zr_all, zi_all, consts, dn)
            outr_ref[0, 0, 0] = yr.reshape(4, _CHUNK, qm)
            outi_ref[0, 0, 0] = yi.reshape(4, _CHUNK, qm)
            return
        # q-point DFT over beta: sublane contraction, Karatsuba
        consts = ((q1h[:], q1l[:]), (q2h[:], q2l[:]), (q3h[:], q3l[:]))
        yr, yi = cfft.kar_dot(br, bi, consts, dn)  # (CHUNK, q) = (i1, delta)
        outr_ref[0, 0, 0] = yr
        outi_ref[0, 0, 0] = yi

    grid1 = (n_pol, n_blocks, nchunk, p)
    in_x = pl.BlockSpec((1, 1, n2, _CHUNK), lambda pi, b, c, g: (pi, b, 0, c),
                        memory_space=pltpu.VMEM)

    def cspec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda pi, b, c, g: (0,) * nd,
                            memory_space=pltpu.VMEM)

    if has_elem:
        e_r = elem_r.reshape(n2, n1)
        e_i = elem_i.reshape(n2, n1)
    else:
        e_r = jnp.ones((8, 128), jnp.float32)
        e_i = jnp.zeros((8, 128), jnp.float32)
    espec = (
        pl.BlockSpec((1, n2, _CHUNK), lambda pi, b, c, g: (0, 0, c),
                     memory_space=pltpu.VMEM)
        if has_elem
        else cspec((8, 128))
    )
    if has_elem:
        e_r = e_r[None]
        e_i = e_i[None]

    gemm1 = eqm if radix else dq
    consts1 = [c7r, c7i, tw2r, tw2i,
               gemm1[0][0], gemm1[0][1], gemm1[1][0], gemm1[1][1],
               gemm1[2][0], gemm1[2][1]]
    if radix:
        # r-twiddle tiles pre-broadcast to (4*qm, CHUNK): the kernel's
        # per-r (qm, CHUNK) slices multiply zs elementwise shape-exact
        consts1 += [
            np.broadcast_to(t4r, (4 * qm, _CHUNK)).copy(),
            np.broadcast_to(t4i, (4 * qm, _CHUNK)).copy(),
        ]
        out1_spec = pl.BlockSpec(
            (1, 1, 1, 4, _CHUNK, qm), lambda pi, b, c, g: (pi, b, g, 0, c, 0),
            memory_space=pltpu.VMEM,
        )
        a1_shape = (n_pol, n_blocks, p, 4, n1, qm)
    else:
        consts1 += [t4r, t4i]
        out1_spec = pl.BlockSpec(
            (1, 1, 1, _CHUNK, q), lambda pi, b, c, g: (pi, b, g, c, 0),
            memory_space=pltpu.VMEM,
        )
        a1_shape = (n_pol, n_blocks, p, n1, q)
    consts1 = [jnp.asarray(m) for m in consts1]
    a1r, a1i = pl.pallas_call(
        kern1,
        grid=grid1,
        in_specs=[in_x, in_x] + [cspec(m.shape) for m in consts1]
        + [espec, espec],
        out_specs=[out1_spec, out1_spec],
        out_shape=[
            jax.ShapeDtypeStruct(a1_shape, jnp.float32),
            jax.ShapeDtypeStruct(a1_shape, jnp.float32),
        ],
        interpret=interpret,
    )(x3r, x3i, *consts1, e_r, e_i)

    if _os.environ.get("SKA_PST_IFFT_BIG_STAGE") == "1":
        # profiling knob: stop after kernel 1 (tools/ stage timing only)
        return a1r, a1i

    # ---- kernel 2: N-twiddle + outer n1-point DFT, kept columns --------
    def kern2(ar_ref, ai_ref, wr_ref, wi_ref, rollr_ref, rolli_ref,
              o1h, o1l, o2h, o2l, o3h, o3l, t2r_ref, t2i_ref,
              outr_ref, outi_ref):
        # W[k2, i1] tile delivered per (gamma, delta-chunk) by BlockSpec
        wr = wr_ref[0, 0]
        wi = wi_ref[0, 0]
        if radix:
            # (rk, n1, qm) r-plane tiles → lane-concat to the (n1,
            # chunk2) delta_perm-ordered slab (128-lane pieces, aligned)
            a6r = ar_ref[0, 0, 0]
            a6i = ai_ref[0, 0, 0]
            rk = a6r.shape[0]
            ar = jnp.concatenate([a6r[r] for r in range(rk)], axis=1)
            ai = jnp.concatenate([a6i[r] for r in range(rk)], axis=1)
        else:
            ar = ar_ref[0, 0, 0]
            ai = ai_ref[0, 0, 0]
        br = ar * wr - ai * wi
        bi = ar * wi + ai * wr
        # gain + k2-part of the roll modulation (host constant, delivered
        # pre-sliced per (gamma, delta-chunk) by its BlockSpec — in-kernel
        # dynamic sublane indexing is not lowerable)
        rr = rollr_ref[0, 0:1, :]   # (1, CHUNK), broadcasts over i1 rows
        ri = rolli_ref[0, 0:1, :]
        cr = br * rr - bi * ri
        ci = br * ri + bi * rr
        consts = ((o1h[:], o1l[:]), (o2h[:], o2l[:]), (o3h[:], o3l[:]))
        dn = (((0,), (0,)), ((), ()))
        if radix2:
            # radix-4 split of the i1 contraction (i1 = i + q4*h,
            # k1 = r1 + 4*m1): 4-point VPU inverse DFT over the aligned
            # q4-row groups, the r1-twiddle (with its roll part), then
            # ONE shared (K=q4) Karatsuba GEMM against the kept-m1 DFT
            # columns, all 4 r1-planes lane-stacked — 4x fewer MXU MACs
            q4 = n1 // 4
            zs = _idft4([
                (cr[h * q4:(h + 1) * q4], ci[h * q4:(h + 1) * q4])
                for h in range(4)
            ])
            zr_cols, zi_cols = [], []
            for r1 in range(4):
                tr = t2r_ref[r1 * q4:(r1 + 1) * q4, :]
                ti = t2i_ref[r1 * q4:(r1 + 1) * q4, :]
                zr, zi = zs[r1]
                zr_cols.append(zr * tr - zi * ti)
                zi_cols.append(zr * ti + zi * tr)
            zr_all = jnp.concatenate(zr_cols, axis=1)   # (q4, 4*chunk2)
            zi_all = jnp.concatenate(zi_cols, axis=1)
            yr, yi = cfft.kar_dot(zr_all, zi_all, consts, dn)
            outr_ref[0, 0, 0] = yr.reshape(4, chunk2, n1_keep // 4)
            outi_ref[0, 0, 0] = yi.reshape(4, chunk2, n1_keep // 4)
            return
        yr, yi = cfft.kar_dot(cr, ci, consts, dn)  # (CHUNK, n1_keep)
        outr_ref[0, 0, 0] = yr
        outi_ref[0, 0, 0] = yi

    chunk2 = _chunk2(q)
    grid2 = (n_pol, n_blocks, p, q // chunk2)
    if radix:
        rk = chunk2 // qm   # r-planes per delta_perm chunk
        in_a = pl.BlockSpec(
            (1, 1, 1, rk, n1, qm), lambda pi, b, g, d: (pi, b, g, d, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        in_a = pl.BlockSpec(
            (1, 1, 1, n1, chunk2), lambda pi, b, g, d: (pi, b, g, 0, d),
            memory_space=pltpu.VMEM,
        )
    in_w = pl.BlockSpec(
        (1, 1, n1, chunk2), lambda pi, b, g, d: (g, d, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def cspec2(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda pi, b, g, d: (0,) * nd,
                            memory_space=pltpu.VMEM)

    # (gamma*nchunk + d) rows of 8 replicated sublanes x CHUNK2 lanes: a
    # (1, 8, CHUNK2) block satisfies Mosaic's (8, 128)-divisible block rule
    nch_d = q // chunk2
    roll_spec = pl.BlockSpec(
        (1, 8, chunk2), lambda pi, b, g, d: (g * nch_d + d, 0, 0),
        memory_space=pltpu.VMEM,
    )

    def _roll8(v):
        v = v.reshape(p, nch_d, 1, chunk2)
        return np.broadcast_to(
            v, (p, nch_d, 8, chunk2)
        ).reshape(p * nch_d, 8, chunk2).copy()
    gemm2 = rx[2] if radix2 else outer
    consts2 = [
        gemm2[0][0], gemm2[0][1], gemm2[1][0], gemm2[1][1],
        gemm2[2][0], gemm2[2][1],
    ]
    if radix2:
        # r1-twiddle pre-broadcast to (n1, chunk2) for shape-exact slices
        consts2 += [
            np.broadcast_to(rx[0], (n1, chunk2)).copy(),
            np.broadcast_to(rx[1], (n1, chunk2)).copy(),
        ]
        out2_spec = pl.BlockSpec(
            (1, 1, 1, 4, chunk2, n1_keep // 4),
            lambda pi, b, g, d: (pi, b, g, 0, d, 0),
            memory_space=pltpu.VMEM,
        )
        y2_shape = (n_pol, n_blocks, p, 4, q, n1_keep // 4)
    else:
        consts2 += [np.zeros((8, 128), np.float32),
                    np.zeros((8, 128), np.float32)]
        out2_spec = pl.BlockSpec(
            (1, 1, 1, chunk2, n1_keep), lambda pi, b, g, d: (pi, b, g, d, 0),
            memory_space=pltpu.VMEM,
        )
        y2_shape = (n_pol, n_blocks, p, q, n1_keep)
    consts2 = [jnp.asarray(m) for m in consts2]
    y2r, y2i = pl.pallas_call(
        kern2,
        grid=grid2,
        in_specs=[in_a, in_a, in_w, in_w, roll_spec, roll_spec]
        + [cspec2(m.shape) for m in consts2],
        out_specs=[out2_spec, out2_spec],
        out_shape=[
            jax.ShapeDtypeStruct(y2_shape, jnp.float32),
            jax.ShapeDtypeStruct(y2_shape, jnp.float32),
        ],
        interpret=interpret,
    )(a1r, a1i, jnp.asarray(w_r), jnp.asarray(w_i),
      jnp.asarray(_roll8(rollr)), jnp.asarray(_roll8(rolli)),
      *consts2)

    # t - lo = n2*j + p*delta + gamma: reorder (gamma, delta, j) -> t with
    # one XLA transpose over the kept output only (the radix path's
    # delta axis arrives permuted as (r, m) with delta = r + 4m — still
    # one pure transpose, ordered (k1, m, r, gamma))
    keep = (n - 2 * lo)

    def order(y):
        if radix and radix2:
            # delta arrives (r2, m2)-major, kept k1 arrives (r1, m1)-
            # split: t-order is (m1, r1, m2, r2, gamma) outer->inner
            y = y.reshape(n_pol, n_blocks, p, 4, 4, qm, n1_keep // 4)
            return jnp.transpose(y, (0, 1, 6, 3, 5, 4, 2)).reshape(
                n_pol, n_blocks, keep
            )
        if radix2:
            y = y.reshape(n_pol, n_blocks, p, 4, q, n1_keep // 4)
            return jnp.transpose(y, (0, 1, 5, 3, 4, 2)).reshape(
                n_pol, n_blocks, keep
            )
        if radix:
            y = y.reshape(n_pol, n_blocks, p, 4, qm, n1_keep)
            return jnp.transpose(y, (0, 1, 5, 4, 3, 2)).reshape(
                n_pol, n_blocks, keep
            )
        return jnp.transpose(y, (0, 1, 4, 3, 2)).reshape(
            n_pol, n_blocks, keep
        )

    return order(y2r), order(y2i)

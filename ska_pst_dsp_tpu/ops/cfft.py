"""Split-complex FFT built from MXU matmuls.

The TPU backend in this environment implements no complex dtype and no XLA
FFT op — and on TPU hardware the MXU (128x128 systolic array) is where the
FLOPs live anyway. So the framework carries complex data as separate
real/imag float32 arrays ("split complex") and computes DFTs as real
matmuls:

* sizes up to ``BASE`` (512): one real matmul against a constant
  (2n x 2n) block matrix  [[Dr, Di], [-Di, Dr]]  — the complex DFT expressed
  as a single real GEMM, the densest possible MXU formulation;
* larger sizes: Cooley-Tukey four-step decomposition N = N1*N2
  (X[k2 + N2*k1] = FFT_N1( W_N^{n1 k2} * FFT_N2(x[n1 + N1*n2]) )):
  inner/outer transforms recurse, twiddles are computed in-graph from exact
  int32 phase indices (products < 2^24 asserted, so fp32 angles are exact).

Matmuls run with precision=HIGHEST (bf16 multi-pass ≈ fp32 accuracy on the
MXU) — the −60 dB purity requirement leaves no room for bare-bf16 error.

Replaces: Matlab fft/ifft calls inside polyphase_analysis.m:116-120,
polyphase_synthesis.m:184-285, PSTFilterbank.m:35.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array
BASE = 512  # largest direct-DFT matmul

# fp32 matmul precision for the DFT GEMMs. HIGH = bf16x3 passes, which
# carries full fp32 operand significance (measured end-to-end tone purity on
# v5e is identical to HIGHEST at -83.5 dB, ~2x cheaper); HIGHEST = bf16x6.
# Bare bf16 ("default") gives ~3e-3 relative error — fails the -60 dB purity
# floor — and is only for experiments. CPU ignores the knob (f32 is exact).
import os as _os

_PRECISION = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": None,
}[_os.environ.get("SKA_PST_FFT_PRECISION", "high").lower()]

# Mosaic (Pallas TPU) only lowers DEFAULT and HIGHEST dot precisions; HIGH
# rounds up to HIGHEST inside kernels.
_KERNEL_PRECISION = (
    jax.lax.Precision.HIGHEST if _PRECISION is not None else None
)


def kernel_dot(a, bh, bl):
    """fp32-accurate GEMM for Pallas kernels: manual bf16x3 against a
    pre-split constant matrix (bh + bl == b in fp32). Mosaic lowers only
    DEFAULT (bare bf16, ~3e-3 relative error — fails the purity floor) and
    HIGHEST (bf16x6); three bf16 passes a_hi@b_hi + a_hi@b_lo + a_lo@b_hi
    carry full fp32 operand significance (error ~2^-21) at half HIGHEST's
    cost. Honors the env knob: 'highest' falls back to one HIGHEST dot.
    """
    if _PRECISION is jax.lax.Precision.HIGHEST:
        b = bh.astype(jnp.float32) + bl.astype(jnp.float32)
        return jnp.dot(a, b, preferred_element_type=jnp.float32,
                       precision=jax.lax.Precision.HIGHEST)
    if _PRECISION is None:
        return jnp.dot(a.astype(jnp.bfloat16), bh,
                       preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    acc = jnp.dot(ah, bh, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(ah, bl, preferred_element_type=jnp.float32)
    acc = acc + jnp.dot(al, bh, preferred_element_type=jnp.float32)
    return acc


def split_bf16(m: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Split an fp32 constant matrix into (hi, lo) bf16 parts for
    :func:`kernel_dot` (hi + lo reproduces the fp32 value exactly)."""
    m = np.asarray(m, dtype=np.float32)
    import ml_dtypes

    hi = m.astype(ml_dtypes.bfloat16)
    lo = (m - hi.astype(np.float32)).astype(ml_dtypes.bfloat16)
    return hi, lo


def karatsuba_consts(dr: np.ndarray, di: np.ndarray):
    """Host: split-bf16 triple (Dr, Di, Dr+Di) for :func:`kar_dot` — the
    3-multiplication complex GEMM. The (2n x 2n) block-matrix form executes
    4 real n^2 GEMMs per complex product; Karatsuba needs 3:

        t1 = Ar@Dr,  t2 = Ai@Di,  t3 = (Ar+Ai)@(Dr+Di)
        Re = t1 - t2,  Im = t3 - t1 - t2

    25% fewer MXU flops at every precision scheme. The t3 cancellation
    costs ~1 bit of the 2^-21 bf16x3 error — irrelevant against the
    -60 dB purity floor."""
    dr = np.asarray(dr, dtype=np.float32)
    di = np.asarray(di, dtype=np.float32)
    return split_bf16(dr), split_bf16(di), split_bf16(dr + di)


def _dot1(a, bh, bl, dn, const_first=False):
    """One fp32-class GEMM against a pre-split constant with explicit
    dimension_numbers (bf16x3 at HIGH, single dot at HIGHEST/bare)."""
    def dg(x, y):
        ops = (y, x) if const_first else (x, y)
        return jax.lax.dot_general(
            ops[0], ops[1], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
        )

    if _PRECISION is jax.lax.Precision.HIGHEST:
        b = bh.astype(jnp.float32) + bl.astype(jnp.float32)
        ops = (b, a) if const_first else (a, b)
        return jax.lax.dot_general(
            ops[0], ops[1], dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    if _PRECISION is None:
        return dg(a.astype(jnp.bfloat16), bh)
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    return dg(ah, bh) + dg(ah, bl) + dg(al, bh)


def kar_dot(ar, ai, consts, dn, const_first=False):
    """3-multiplication complex GEMM (see :func:`karatsuba_consts`):
    complex data (ar, ai) x complex constant (Dr + i Di) -> (Re, Im).
    ``dn`` are the dimension_numbers of each underlying real GEMM;
    ``const_first`` makes the constant the LEFT operand."""
    (c1h, c1l), (c2h, c2l), (c3h, c3l) = consts
    t1 = _dot1(ar, c1h, c1l, dn, const_first)
    t2 = _dot1(ai, c2h, c2l, dn, const_first)
    t3 = _dot1(ar + ai, c3h, c3l, dn, const_first)
    return t1 - t2, t3 - t1 - t2

# Which lowering to use: the matmul path is the TPU-native implementation
# (this environment's TPU backend has no XLA FFT op); CPU uses the native
# complex FFT, which is faster and exact. "auto" picks per backend at trace
# time; tests force "matmul" to exercise the TPU path on CPU.
MODE = _os.environ.get("SKA_PST_FFT_MODE", "auto")  # auto | matmul | native


def _use_matmul() -> bool:
    if MODE == "matmul":
        return True
    if MODE == "native":
        return False
    return jax.default_backend() != "cpu"


@functools.lru_cache(maxsize=None)
def _dft_block(n: int, inverse: bool) -> np.ndarray:
    """(2n, 2n) real block matrix for right-multiplication:
    [Br Bi] = [Ar Ai] @ [[Dr, Di], [-Di, Dr]], D[j,k] = exp(∓2j*pi*jk/n)."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    sign = 1.0 if inverse else -1.0
    ang = sign * 2.0 * np.pi * ((j * k) % n) / n
    dr = np.cos(ang)
    di = np.sin(ang)
    top = np.concatenate([dr, di], axis=1)
    bot = np.concatenate([-di, dr], axis=1)
    return np.concatenate([top, bot], axis=0).astype(np.float32)


@functools.lru_cache(maxsize=None)
def _split_factor(n: int) -> int:
    """Largest divisor of n that is <= BASE (the outer/base transform size)."""
    best = 1
    i = 1
    while i * i <= n:
        if n % i == 0:
            for d in (i, n // i):
                if d <= BASE:
                    best = max(best, d)
        i += 1
    if best == 1:
        raise ValueError(
            f"FFT size {n} has no factor <= {BASE}; sizes must be composite "
            f"(this framework's geometries are all 2^a*3^b*7^c)"
        )
    return best


def _twiddle(n1: int, n2: int, n: int, inverse: bool) -> Tuple[Array, Array]:
    """W_n^{±n1*k2} as (n2, n1) [k2, n1] real/imag, phases from exact int32
    products (computed in-graph: cheap VPU work, no giant constants)."""
    assert (n1 - 1) * (n2 - 1) < 2**24, "twiddle phase index overflows fp32"
    k2 = jax.lax.broadcasted_iota(jnp.int32, (n2, n1), 0)
    m1 = jax.lax.broadcasted_iota(jnp.int32, (n2, n1), 1)
    r = (k2 * m1) % n
    sign = 1.0 if inverse else -1.0
    ang = (sign * 2.0 * np.pi / n) * r.astype(jnp.float32)
    return jnp.cos(ang), jnp.sin(ang)


@functools.lru_cache(maxsize=None)
def _dft_parts(n: int, inverse: bool):
    """(Dr, Di, Dr+Di) fp32 for the 3-multiplication complex DFT matmul
    (see :func:`karatsuba_consts` — XLA-level variant, unsplit)."""
    j, k = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    sign = 1.0 if inverse else -1.0
    ang = sign * 2.0 * np.pi * ((j * k) % n) / n
    dr = np.cos(ang).astype(np.float32)
    di = np.sin(ang).astype(np.float32)
    return dr, di, (dr + di).astype(np.float32)


def _base_fft_last(xr: Array, xi: Array, inverse: bool) -> Tuple[Array, Array]:
    n = xr.shape[-1]
    dr, di, ds = (jnp.asarray(m) for m in _dft_parts(n, inverse))
    t1 = jnp.matmul(xr, dr, precision=_PRECISION)
    t2 = jnp.matmul(xi, di, precision=_PRECISION)
    t3 = jnp.matmul(xr + xi, ds, precision=_PRECISION)
    return t1 - t2, t3 - t1 - t2


def _base_fft_axis2(xr: Array, xi: Array, inverse: bool) -> Tuple[Array, Array]:
    """DFT along axis -2 (length must be <= BASE) as LEFT matmuls
    contracting axis -2 directly, so the four-step driver never transposes
    operands; 3-multiplication complex scheme (karatsuba_consts)."""
    n = xr.shape[-2]
    dr, di, ds = (jnp.asarray(m) for m in _dft_parts(n, inverse))
    nb = xr.ndim - 2

    def dg(x, d):
        # out[..., j, k] = sum_i d[i, k] * x[..., i, j]
        out = jax.lax.dot_general(
            x, d,
            dimension_numbers=(((nb,), (0,)), ((), ())),
            precision=_PRECISION,
        )  # (..., m, n): contracted axis replaced, d-dim appended last
        return jnp.swapaxes(out, -1, -2)

    t1 = dg(xr, dr)
    t2 = dg(xi, di)
    t3 = dg(xr + xi, ds)
    return t1 - t2, t3 - t1 - t2


def _fft_last(xr: Array, xi: Array, inverse: bool) -> Tuple[Array, Array]:
    n = xr.shape[-1]
    if n <= BASE:
        return _base_fft_last(xr, xi, inverse)
    n1 = _split_factor(n)
    n2 = n // n1
    batch = xr.shape[:-1]
    # x[n1 + N1*n2] → view [..., n2, n1] (row-major: no data movement)
    xr3 = xr.reshape(*batch, n2, n1)
    xi3 = xi.reshape(*batch, n2, n1)
    # inner transform over n2 (axis -2): left matmul, no transposes
    if n2 <= BASE:
        br, bi = _base_fft_axis2(xr3, xi3, inverse)  # [..., k2, n1]
    else:
        br, bi = _fft_last(
            jnp.swapaxes(xr3, -1, -2), jnp.swapaxes(xi3, -1, -2), inverse
        )
        br = jnp.swapaxes(br, -1, -2)
        bi = jnp.swapaxes(bi, -1, -2)
    tr, ti = _twiddle(n1, n2, n, inverse)
    cr = br * tr - bi * ti
    ci = br * ti + bi * tr
    # outer transform over n1 (last axis)
    dr, di = _fft_last(cr, ci, inverse)  # [..., k2, k1]
    dr = jnp.swapaxes(dr, -1, -2).reshape(*batch, n)  # X[k2 + N2*k1]
    di = jnp.swapaxes(di, -1, -2).reshape(*batch, n)
    return dr, di


def _move_last(x: Array, axis: int) -> Array:
    return jnp.moveaxis(x, axis, -1)


def fft(xr: Array, xi: Array, axis: int = -1) -> Tuple[Array, Array]:
    """Forward DFT of split-complex data along ``axis``."""
    if not _use_matmul():
        y = jnp.fft.fft(jax.lax.complex(xr, xi), axis=axis)
        return jnp.real(y), jnp.imag(y)
    axis = axis % xr.ndim
    if axis != xr.ndim - 1:
        yr, yi = _fft_last(_move_last(xr, axis), _move_last(xi, axis), False)
        return jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)
    return _fft_last(xr, xi, False)


def ifft(xr: Array, xi: Array, axis: int = -1) -> Tuple[Array, Array]:
    """Inverse DFT (1/N normalized) of split-complex data along ``axis``."""
    if not _use_matmul():
        y = jnp.fft.ifft(jax.lax.complex(xr, xi), axis=axis)
        return jnp.real(y), jnp.imag(y)
    axis = axis % xr.ndim
    n = xr.shape[axis]
    if axis != xr.ndim - 1:
        yr, yi = _fft_last(_move_last(xr, axis), _move_last(xi, axis), True)
        yr, yi = jnp.moveaxis(yr, -1, axis), jnp.moveaxis(yi, -1, axis)
    else:
        yr, yi = _fft_last(xr, xi, True)
    inv_n = np.float32(1.0 / n)
    return yr * inv_n, yi * inv_n


def fftshift(x: Array, axis: int = -1) -> Array:
    """Swap spectrum halves (pure roll — no FFT op involved)."""
    return jnp.roll(x, x.shape[axis] // 2, axis=axis)


# ---------------------------------------------------------------------------
# host-boundary helpers
# ---------------------------------------------------------------------------

def split(x) -> Tuple[Array, Array]:
    """Complex (numpy or jax) → (re, im) float32 jax arrays. Splitting
    happens on host for numpy inputs so no complex op ever reaches TPU."""
    if isinstance(x, np.ndarray):
        if np.iscomplexobj(x):
            return (
                jnp.asarray(np.ascontiguousarray(x.real).astype(np.float32)),
                jnp.asarray(np.ascontiguousarray(x.imag).astype(np.float32)),
            )
        xr = jnp.asarray(x.astype(np.float32))
        return xr, jnp.zeros_like(xr)
    x = jnp.asarray(x)
    if jnp.iscomplexobj(x):
        return jnp.real(x).astype(jnp.float32), jnp.imag(x).astype(jnp.float32)
    return x.astype(jnp.float32), jnp.zeros_like(x, dtype=jnp.float32)


def combine(xr: Array, xi: Array) -> np.ndarray:
    """(re, im) → complex64 numpy (combination on host — complex never
    touches the device)."""
    return np.asarray(xr).astype(np.float32) + 1j * np.asarray(xi).astype(np.float32)


def cmul(ar, ai, br, bi) -> Tuple[Array, Array]:
    return ar * br - ai * bi, ar * bi + ai * br

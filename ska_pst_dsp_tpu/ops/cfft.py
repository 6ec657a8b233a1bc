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


def _base_fft_last(xr: Array, xi: Array, inverse: bool) -> Tuple[Array, Array]:
    n = xr.shape[-1]
    d = jnp.asarray(_dft_block(n, inverse))
    a2 = jnp.concatenate([xr, xi], axis=-1)
    out = jnp.matmul(a2, d, precision=_PRECISION)
    return out[..., :n], out[..., n:]


def _base_fft_axis2(xr: Array, xi: Array, inverse: bool) -> Tuple[Array, Array]:
    """DFT along axis -2 (length must be <= BASE) as one LEFT block-matmul:
    [Br; Bi] = [[Dr, Di], [-Di, Dr]]^T @ [Ar; Ai] — contracting axis -2
    directly, so the four-step driver never transposes operands."""
    n = xr.shape[-2]
    d = jnp.asarray(_dft_block(n, inverse))  # right-mult convention
    a2 = jnp.concatenate([xr, xi], axis=-2)  # (..., 2n, m)
    nb = a2.ndim - 2
    # out[..., k, j] = sum_i d[i, k] * a2[..., i, j]  (d transposed == left)
    out = jax.lax.dot_general(
        a2, d,
        dimension_numbers=(((nb,), (0,)), ((), ())),
        precision=_PRECISION,
    )  # (..., m, 2n): contracted axis replaced, d-dim appended last
    out = jnp.swapaxes(out, -1, -2)
    return out[..., :n, :], out[..., n:, :]


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

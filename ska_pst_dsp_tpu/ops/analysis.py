"""Oversampled polyphase analysis filterbanks — TPU-native JAX kernels.

Mathematical equivalents of the reference's analysis kernels
(polyphase_analysis.m:88-120, polyphase_analysis_padded.m:113-153),
re-derived for XLA rather than translated:

* The reference's per-block ``circshift`` of the windowed samples commutes
  with phase-folding and becomes a per-bin phase ramp under the DFT, so the
  whole per-block loop collapses to

      out[k, q] = block * FFT(folded_k)[q] * exp(-2j*pi*q*(step*k % block)/block)

  (upper-sideband; polyphase_analysis.m:102-120). The padded variant's
  sliding time-flipped mask + barrel-rotator reduces to a time-reversed
  filter correlation with ``block^2 * IFFT`` and the *same*
  ``step*k mod block`` ramp schedule (the equivalence the reference itself
  notes at polyphase_analysis_padded.m:138-142).

* Each kernel is one batched multiply-fold + one batched FFT + one
  elementwise complex ramp: no per-block control flow, no gathers (framing
  is static slices, :mod:`.framing`), fully fused by XLA, and shape-static
  so a single compilation serves an entire stream.

Both kernels take ``block0``, the absolute index of the first output
spectrum: the ramp schedule depends on absolute position, which is what lets
streamed and sharded execution stay bit-identical with one-shot execution.

Verified against the NumPy oracle (:mod:`ska_pst_dsp_tpu.oracle`) in
tests/test_analysis.py.
"""

from __future__ import annotations

import functools
from typing import Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import geometry
from ..utils.rational import Rational
from .framing import frame


def _phase_ramp(block: int, step: int, nblocks: int, k0: int) -> np.ndarray:
    """ramp[k, q] = exp(-2j*pi * q * (step*(k+k0) mod block) / block)."""
    k = np.arange(nblocks) + k0
    shift = (step * k) % block
    q = np.arange(block)
    ramp = np.exp(-2j * np.pi * q[None, :] * shift[:, None] / block)
    return ramp.astype(np.complex64)


def _prep_filter(filt, block: int, reverse: bool = False) -> np.ndarray:
    """Zero-pad taps to a multiple of block (pad_filter.m:9-13) and reshape
    to (phases, block) with f2d[m, j] = f[m*block + j]."""
    filt = np.asarray(filt, dtype=np.float64).ravel()
    fl = geometry.padded_filter_length(filt.size, block)
    f = np.zeros(fl, dtype=np.float64)
    f[: filt.size] = filt
    if reverse:
        f = f[::-1]
    return f.reshape(fl // block, block).astype(np.float32)


@functools.partial(jax.jit, static_argnames=("block", "step", "k0"))
def _analysis_core(x, f2d, *, block: int, step: int, k0: int):
    """x: (n_pol, n_dat) → (n_pol, block, nblocks); upper-sideband."""
    n_pol, n_dat = x.shape
    phases = f2d.shape[0]
    fl = phases * block
    nblocks = (n_dat - fl) // step

    frames = frame(x, fl, step, nblocks)  # (n_pol, nblocks, fl)
    frames = frames.reshape(n_pol, nblocks, phases, block)
    folded = jnp.einsum("pkmj,mj->pkj", frames, f2d.astype(x.real.dtype))
    spectra = jnp.fft.fft(folded, axis=-1) * block
    out = spectra * jnp.asarray(_phase_ramp(block, step, nblocks, k0))[None]
    return jnp.transpose(out, (0, 2, 1))


@functools.partial(
    jax.jit, static_argnames=("block", "step", "k0", "delay")
)
def _analysis_padded_core(x, f2d_rev, *, block: int, step: int, k0: int, delay: int):
    """x: (n_pol, n_dat) → (n_pol, block, n_dat//step); lower-sideband."""
    n_pol, n_dat = x.shape
    phases = f2d_rev.shape[0]
    fl = phases * block
    nblocks = n_dat // step

    # y_i[j] = sum_{tau = j+m*block} f[tau] * x[i*step - 1 - tau]
    #        = reverse_j( fold( f_reversed * x[i*step - fl : i*step] ) )
    xpad = jnp.pad(x, [(0, 0), (fl, 0)])
    frames = frame(xpad, fl, step, nblocks).reshape(n_pol, nblocks, phases, block)
    g = jnp.einsum("pkmj,mj->pkj", frames, f2d_rev.astype(x.real.dtype))
    y = g[..., ::-1]
    spectra = jnp.fft.ifft(y, axis=-1) * (block * block)
    out = spectra * jnp.asarray(_phase_ramp(block, step, nblocks, k0))[None]
    out = jnp.transpose(out, (0, 2, 1))
    if delay:
        out = jnp.roll(out, -delay, axis=2)
    return out


def polyphase_analysis(
    x: jnp.ndarray,
    filt,
    block: int,
    os_factor: Union[Rational, str],
    *,
    block0: int = 0,
) -> jnp.ndarray:
    """Single-stage oversampled analysis PFB (SKA-Low / "Bunton" style).

    Args:
      x: (n_pol, 1, n_dat) or (n_pol, n_dat) complex input stream.
      filt: prototype lowpass FIR coefficients.
      block: number of output channels (= FFT length).
      os_factor: oversampling ratio nu/de.
      block0: absolute index of the first output spectrum (for streamed /
        sharded calls; 0 for one-shot).

    Returns (n_pol, block, nblocks), nblocks = (n_dat - padded_taps)//step.
    """
    os_factor = Rational.coerce(os_factor)
    if x.ndim == 3:
        x = x[:, 0, :]
    return _analysis_core(
        jnp.asarray(x),
        jnp.asarray(_prep_filter(filt, block)),
        block=block,
        step=geometry.analysis_step(block, os_factor),
        k0=block0,
    )


def polyphase_analysis_padded(
    x: jnp.ndarray,
    filt,
    block: int,
    os_factor: Union[Rational, str],
    *,
    block0: int = 0,
    apply_delay: bool = True,
) -> jnp.ndarray:
    """Zero-padded oversampled analysis PFB (SKA-Mid / "Gunaratne" style).

    Output block k is computed from samples x[k*step - padded_taps : k*step]
    (zero-padded before the stream start), then the whole stream is advanced
    by ceil((taps-1)/2/step) spectra to cancel the filter group delay
    (polyphase_analysis_padded.m:89, :156). ``apply_delay=False`` leaves the
    raw timeline for streamed callers that roll once at the end.

    x: (n_pol, 1, n_dat) or (n_pol, n_dat). Returns (n_pol, block, n_dat//step).
    """
    os_factor = Rational.coerce(os_factor)
    if x.ndim == 3:
        x = x[:, 0, :]
    n_taps = int(np.asarray(filt).size)
    delay = (
        geometry.padded_sample_delay_shift(n_taps, block, os_factor)
        if apply_delay
        else 0
    )
    return _analysis_padded_core(
        jnp.asarray(x),
        jnp.asarray(_prep_filter(filt, block, reverse=True)),
        block=block,
        step=geometry.analysis_step(block, os_factor),
        k0=block0,
        delay=delay,
    )

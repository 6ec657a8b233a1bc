"""SKA-Low CBF firmware-model PST filterbank — TPU-native JAX kernel.

Equivalent of the reference's PSTFilterbank.m:7-45 and its wrapper
polyphase_analysis_lowcbf.m:16-48: the 3072-tap / 256-channel / 12-tap FIR
filterbank with hop 192 that models the SKA-Low CBF FPGA firmware, keeping
the 216 = 256*27/32 critically sampled fine channels.

XLA re-derivation notes:
* The per-output-sample 256x12 MAC loop is the same multiply-fold as the
  analysis PFB — one batched einsum over framed input.
* The firmware's per-sample pi/2 phase de-rotation
  exp(2j*pi*mod(s*(-128:127),4)/4) is periodic in s with period 4, so the
  whole de-rotation is a constant (4, 256) table of exact quarter-turn
  factors {1, i, -1, -i} indexed by s mod 4 — no transcendentals at runtime.
* Firmware scalings (2^9 FIR, /128 FFT) and the wrapper's compensating
  2^9*2048*256 rescale are folded into a single constant.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .framing import frame

NFILT = 3072
BLOCK = 256
STEP = 192
TAPS = 12
KEPT_LO = 20       # 0-based first kept channel (Matlab 21)
KEPT = 216
FIRST_CALL_PAD = 1536  # half the FIR length (PSTFilterbank.m:4-9)


def _rotation_table() -> np.ndarray:
    """rot[s % 4, shifted_bin] = exp(2j*pi*((s * -(bin-128)) mod 4)/4),
    exact quarter turns."""
    quarter = np.array([1, 1j, -1, -1j], dtype=np.complex64)
    bins = np.arange(-128, 128)
    s = np.arange(4)[:, None]
    return quarter[(s * (-bins)) % 4]


@functools.partial(jax.jit, static_argnames=("scale",))
def _lowcbf_core(x: jnp.ndarray, taps2d: jnp.ndarray, *, scale: float) -> jnp.ndarray:
    """x: (n_pol, n_dat) already padded → (n_pol, KEPT, n_out)."""
    n_pol, n_dat = x.shape
    n_out = (n_dat - NFILT) // STEP
    frames = frame(x, NFILT, STEP, n_out).reshape(n_pol, n_out, TAPS, BLOCK)
    fft_in = jnp.einsum("pstj,tj->psj", frames, taps2d.astype(x.real.dtype))
    spectra = jnp.fft.fftshift(jnp.fft.fft(fft_in, axis=-1), axes=-1)
    rot = jnp.asarray(_rotation_table())
    s_idx = jnp.arange(n_out) % 4
    spectra = spectra * rot[s_idx][None]  # (P, S, 256)
    kept = spectra[..., KEPT_LO: KEPT_LO + KEPT] * jnp.asarray(
        scale, dtype=spectra.dtype
    )
    return jnp.transpose(kept, (0, 2, 1))


def polyphase_analysis_lowcbf(
    x: jnp.ndarray,
    filt,
    block: int = BLOCK,
    os_factor=None,
    *,
    first_call: bool = True,
) -> jnp.ndarray:
    """LowCBF firmware-model analysis (polyphase_analysis_lowcbf.m).

    The firmware divides by 2^9 (FIR), 256 (FFT) and 2048*... which the
    wrapper multiplies back out (polyphase_analysis_lowcbf.m:25); net scale
    here is (2^9*2048*256)/(2^9*128*256) applied once. The reference
    zero-pads 1536 samples only on the first call via Matlab ``persistent``
    state; that state is explicit here (``first_call``).

    x: (n_pol, 1, n_dat) or (n_pol, n_dat). Returns (n_pol, 216, n_out).
    """
    if x.ndim == 3:
        x = x[:, 0, :]
    x = jnp.asarray(x)
    if first_call:
        x = jnp.pad(x, [(0, 0), (FIRST_CALL_PAD, 0)])
    taps2d = np.asarray(filt, dtype=np.float64).ravel()[: NFILT].reshape(TAPS, BLOCK)
    # firmware: /2^9 (FIR) then /128 (FFT+phase scaling); wrapper: *2^9*2048*256
    scale = (2.0**9 * 2048 * 256) / (2.0**9 * 128.0)
    return _lowcbf_core(
        x, jnp.asarray(taps2d.astype(np.float32)), scale=scale
    )

"""Sharded (multi-device) PFB pipeline.

The reference is single-threaded Matlab; its latent parallel axes (SURVEY
§2.9) become mesh axes here:

* **time blocks** — overlap-save processing is embarrassingly parallel given
  each shard a halo of neighbor samples: the analysis needs the next
  ``padded_taps - step`` samples (filter history), the padded variant the
  previous ``padded_taps`` samples, the synthesis the next ``2*overlap``
  fine-channel samples. Halos move over ICI via ``jax.lax.ppermute`` inside
  ``shard_map`` — the sharded equivalent of the reference's serial buffered
  carry (FilterBank.m:85-126).
* **polarization / coarse channel** — pure batch axes (vmap/reshape).

Position-independence: the analysis phase-ramp schedule ``step*k mod block``
has period ``nu`` in k (because step*nu = block*de ≡ 0 mod block), so shards
whose block counts are multiples of ``nu`` all run the *identical* kernel
with block0=0 — no per-shard state, bit-identical to one-shot output. This
is the same invariant the streaming layer relies on (FilterBank.m:93-104
trims output to nu-multiples for exactly this reason).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import analysis as _analysis
from ..ops import synthesis as _synthesis
from ..utils import geometry, windows
from ..utils.rational import Rational


def make_mesh(n_devices: Optional[int] = None, axis: str = "time") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def _right_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Prefix of the *next* shard (zeros for the last shard)."""
    n = jax.lax.axis_size(axis_name)
    prefix = x[..., :halo]
    # send my prefix to my left neighbor (non-circular: last shard gets zeros)
    return jax.lax.ppermute(
        prefix, axis_name, perm=[(i, i - 1) for i in range(1, n)]
    )


def _left_halo(x: jnp.ndarray, halo: int, axis_name: str) -> jnp.ndarray:
    """Suffix of the *previous* shard (zeros for the first shard)."""
    n = jax.lax.axis_size(axis_name)
    suffix = x[..., -halo:]
    return jax.lax.ppermute(
        suffix, axis_name, perm=[(i, i + 1) for i in range(n - 1)]
    )


def sharded_polyphase_analysis(
    x: jnp.ndarray,
    filt,
    block: int,
    os_factor,
    mesh: Mesh,
    *,
    axis: str = "time",
) -> jnp.ndarray:
    """Time-sharded single-stage analysis PFB.

    x: (n_pol, n_dat) with n_dat divisible by n_devices*step*nu. Returns
    (n_pol, block, n_dat//step) spectra, of which the final
    ceil((padded_taps-step)/step) are tail garbage (same count one-shot
    would not emit) — callers slice to geometry.analysis_nblocks.
    """
    os_factor = Rational.coerce(os_factor)
    if x.ndim == 3:
        x = x[:, 0, :]
    step = geometry.analysis_step(block, os_factor)
    n_dev = mesh.devices.size
    n_pol, n_dat = x.shape
    shard = n_dat // n_dev
    if shard % (step * os_factor.nu):
        raise ValueError(
            f"shard size {shard} must be a multiple of step*nu = "
            f"{step * os_factor.nu}"
        )
    f2d = jnp.asarray(_analysis._prep_filter(filt, block))
    fl = f2d.shape[0] * block
    halo = fl  # history needed beyond own samples, rounded up to taps

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None)),
        out_specs=P(None, None, axis),
    )
    def run(x_local, f2d_local):
        nbh = _right_halo(x_local, halo, axis)
        xe = jnp.concatenate([x_local, nbh], axis=-1)
        # every shard starts at a nu-aligned block ⇒ identical ramp (k0=0)
        return _analysis._analysis_core(xe, f2d_local, block=block, step=step, k0=0)

    out = run(x, f2d)
    return out[:, :, : n_dat // step]


def sharded_polyphase_analysis_padded(
    x: jnp.ndarray,
    filt,
    block: int,
    os_factor,
    mesh: Mesh,
    *,
    axis: str = "time",
    apply_delay: bool = True,
) -> jnp.ndarray:
    """Time-sharded zero-padded analysis PFB: halo is the *previous* shard's
    padded-filter-length of samples; the first shard's zero history is the
    kernel's own zero padding (true stream start)."""
    os_factor = Rational.coerce(os_factor)
    if x.ndim == 3:
        x = x[:, 0, :]
    step = geometry.analysis_step(block, os_factor)
    n_dev = mesh.devices.size
    n_pol, n_dat = x.shape
    shard = n_dat // n_dev
    if shard % (step * os_factor.nu):
        raise ValueError(
            f"shard size {shard} must be a multiple of step*nu = "
            f"{step * os_factor.nu}"
        )
    f2d_rev = jnp.asarray(_analysis._prep_filter(filt, block, reverse=True))
    fl = f2d_rev.shape[0] * block
    # history ≥ fl, in whole blocks, and a multiple of nu blocks so that
    # dropping the recomputed history blocks keeps the ramp schedule aligned
    halo_blocks = -(-fl // step)
    halo_blocks += (-halo_blocks) % os_factor.nu
    halo = halo_blocks * step

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, axis), P(None, None)),
        out_specs=P(None, None, axis),
    )
    def run(x_local, f2d_local):
        hist = _left_halo(x_local, halo, axis)
        xe = jnp.concatenate([hist, x_local], axis=-1)
        raw = _analysis._analysis_padded_core(
            xe, f2d_local, block=block, step=step, k0=0, delay=0
        )
        # shard 0's true history is zeros, which is exactly what its halo
        # received (non-circular ppermute) — so dropping the recomputed
        # history blocks is correct for every shard.
        return raw[:, :, halo_blocks:]

    out = run(x, f2d_rev)
    if apply_delay:
        delay = geometry.padded_sample_delay_shift(
            int(np.asarray(filt).size), block, os_factor
        )
        out = jnp.roll(out, -delay, axis=2)
    return out


def sharded_polyphase_synthesis(
    x: jnp.ndarray,
    input_fft_length: int,
    os_factor,
    mesh: Mesh,
    *,
    input_overlap: Optional[int] = None,
    deripple_coeff=None,
    temporal_taper: str = "no_window",
    spectral_taper: str = "no_window",
    spans_nyquist: bool = True,
    axis: str = "time",
) -> jnp.ndarray:
    """Time-sharded Golden inversion: each shard inverts its own overlap-save
    blocks after receiving a 2*overlap fine-channel halo from the next shard.

    x: (n_pol, n_chan, n_dat) with n_dat divisible by n_devices*input_keep.
    Returns (n_pol, 1, (n_dat - 2*overlap)//input_keep * output_keep) —
    identical to the one-shot kernel.
    """
    os_factor = Rational.coerce(os_factor)
    n_pol, n_chan, n_dat = x.shape
    L = input_fft_length
    if input_overlap is None:
        input_overlap = L // 8
    geom = geometry.SynthesisGeometry(n_chan, L, input_overlap, os_factor)
    keep = geom.input_keep
    n_dev = mesh.devices.size
    shard = n_dat // n_dev
    if shard % keep:
        raise ValueError(f"shard size {shard} must be a multiple of input_keep={keep}")

    t_vec = jnp.asarray(windows.build(temporal_taper, L, input_overlap))
    s_vec = jnp.asarray(
        windows.build(spectral_taper, n_chan * geom.fn_width, input_overlap)
    )
    if deripple_coeff is not None:
        from ..design.fir import deripple_response

        dr = deripple_response(deripple_coeff, n_chan, geom.fn_width // 2)
        dr = jnp.asarray(dr.astype(np.float32))
    else:
        dr = jnp.ones(geom.fn_width, dtype=jnp.float32)
    perm = jnp.arange(n_chan, dtype=jnp.int32)
    geom_key = (n_chan, L, input_overlap, os_factor.nu, os_factor.de)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(None, None, axis), P(None), P(None), P(None), P(None)),
        out_specs=P(None, None, axis),
    )
    def run(x_local, t_local, s_local, dr_local, perm_local):
        halo = _right_halo(x_local, 2 * input_overlap, axis)
        xe = jnp.concatenate([x_local, halo], axis=-1)
        return _synthesis._synthesis_core(
            xe, t_local, s_local, dr_local, perm_local,
            geom_key=geom_key, spans_nyquist=spans_nyquist,
        )

    out = run(x, t_vec, s_vec, dr, perm)
    # each shard emits shard//keep blocks; the last shard's final block used
    # zero halo — trim to the one-shot block count
    valid = geom.n_blocks(n_dat) * geom.output_keep
    return out[:, :, :valid]


def sharded_round_trip(
    x: jnp.ndarray,
    filt,
    n_chan: int,
    os_factor,
    input_fft_length: int,
    input_overlap: int,
    mesh: Mesh,
    *,
    temporal_taper: str = "tukey",
    deripple: bool = True,
) -> jnp.ndarray:
    """Full sharded pipeline: time-sharded analysis → time-sharded Golden
    inversion (the flagship 'one step' of this framework)."""
    os_factor = Rational.coerce(os_factor)
    chan = sharded_polyphase_analysis(x, filt, n_chan, os_factor, mesh)
    step = geometry.analysis_step(n_chan, os_factor)
    n_dev = mesh.devices.size
    keep = input_fft_length - 2 * input_overlap
    # trim fine-channel stream so each shard gets whole inversion blocks
    t_valid = geometry.analysis_nblocks(
        x.shape[-1], int(np.asarray(filt).size), n_chan, os_factor
    )
    t_shard = (t_valid // (n_dev * keep)) * keep
    chan = chan[:, :, : t_shard * n_dev]
    chan = jax.lax.with_sharding_constraint(
        chan, NamedSharding(mesh, P(None, None, "time"))
    )
    return sharded_polyphase_synthesis(
        chan,
        input_fft_length,
        os_factor,
        mesh,
        input_overlap=input_overlap,
        deripple_coeff=filt if deripple else None,
        temporal_taper=temporal_taper,
    )

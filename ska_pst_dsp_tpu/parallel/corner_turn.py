"""2-D mesh (channel × time) synthesis with an all-to-all corner turn.

The Golden inversion has two phases with opposite natural layouts
(SURVEY §2.9):

* per-fine-channel forward FFTs + passband selection + deripple — channel
  parallel (256–4096-way);
* full-band assembly + the big backward FFT — needs *all* channels of each
  overlap-save block.

On a ('chan', 'time') device mesh this becomes: phase 1 runs
channel-sharded; then a ``jax.lax.all_to_all`` over the 'chan' axis
redistributes from channel-sharded/block-replicated to
block-sharded/channel-complete — the channel↔time corner turn the reference
performs as an in-memory transpose (polyphase_synthesis.m:171-184, 253-278),
here riding ICI; phase 2 runs block-parallel on whole spectra.

Output blocks end up distributed over both mesh axes
(PartitionSpec (None, None, ('time', 'chan'))), time-major.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import cfft
from ..ops.framing import frame
from ..utils import geometry, windows
from ..utils.rational import Rational

Pair = Tuple[jax.Array, jax.Array]


def make_mesh_2d(n_chan_devices: int, n_time_devices: int) -> Mesh:
    devices = np.array(jax.devices()[: n_chan_devices * n_time_devices])
    return Mesh(devices.reshape(n_chan_devices, n_time_devices),
                ("chan", "time"))


def sharded_polyphase_synthesis_2d(
    x,
    input_fft_length: int,
    os_factor,
    mesh: Mesh,
    *,
    input_overlap: Optional[int] = None,
    deripple_coeff=None,
    temporal_taper: str = "no_window",
    spectral_taper: str = "no_window",
    spans_nyquist: bool = True,
) -> Pair:
    """Golden inversion on a ('chan', 'time') mesh.

    x: (n_pol, n_chan, n_dat) complex or (re, im) pair; n_chan divisible by
    the chan axis, n_dat divisible by time_devices*input_keep, and blocks
    per time shard divisible by the chan axis. Returns the (re, im) pair of
    (n_pol, 1, n_blocks*output_keep), identical to the one-shot kernel.
    """
    os_factor = Rational.coerce(os_factor)
    if isinstance(x, tuple):
        xr, xi = jnp.asarray(x[0]), jnp.asarray(x[1])
    else:
        xr, xi = cfft.split(x)
    n_pol, n_chan, n_dat = xr.shape
    L = input_fft_length
    if input_overlap is None:
        input_overlap = L // 8
    geom = geometry.SynthesisGeometry(n_chan, L, input_overlap, os_factor)
    keep = geom.input_keep
    fnw = geom.fn_width

    dc = mesh.shape["chan"]
    dt = mesh.shape["time"]
    if n_chan % dc:
        raise ValueError(f"n_chan={n_chan} not divisible by chan axis {dc}")
    if n_dat % (dt * keep):
        raise ValueError(
            f"n_dat={n_dat} must be divisible by time_devices*input_keep = "
            f"{dt * keep}"
        )
    blocks_per_t = n_dat // dt // keep
    if blocks_per_t % dc:
        raise ValueError(
            f"blocks per time shard ({blocks_per_t}) must be divisible by "
            f"the chan axis ({dc})"
        )

    t_vec = jnp.asarray(windows.build(temporal_taper, L, input_overlap))
    s_vec = jnp.asarray(
        windows.build(spectral_taper, n_chan * fnw, input_overlap)
    )
    if deripple_coeff is not None:
        from ..design.fir import deripple_response

        dr = jnp.asarray(
            deripple_response(deripple_coeff, n_chan, fnw // 2).astype(np.float32)
        )
    else:
        dr = jnp.ones(fnw, dtype=jnp.float32)

    nu, de = os_factor.nu, os_factor.de
    scale = np.float32(de / nu)
    lo, hi = geom.output_overlap, geom.output_fft_length - geom.output_overlap

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            (P(None, "chan", "time"), P(None, "chan", "time")),
            P(None), P(None), P(None),
        ),
        out_specs=(
            P(None, None, ("time", "chan")),
            P(None, None, ("time", "chan")),
        ),
    )
    def run(pair, t_local, s_local, dr_local):
        lr, li = pair  # (P, C/dc, T/dt)
        n = jax.lax.axis_size("time")
        # halo: next time-shard's first 2*overlap fine samples
        perm = [(i, i - 1) for i in range(1, n)]
        hr = jax.lax.ppermute(lr[..., : 2 * input_overlap], "time", perm)
        hi_ = jax.lax.ppermute(li[..., : 2 * input_overlap], "time", perm)
        xer = jnp.concatenate([lr, hr], axis=-1)
        xei = jnp.concatenate([li, hi_], axis=-1)

        # phase 1 — channel-local: frame, taper, FFT, shift, keep, deripple
        xs = jnp.stack([xer, xei])  # (2, P, C/dc, T')
        frames = frame(xs, L, keep, blocks_per_t) * t_local
        sr, si = cfft.fft(frames[0], frames[1])     # (P, C/dc, B, L)
        sr = cfft.fftshift(sr, axis=-1)[..., geom.discard: geom.discard + fnw]
        si = cfft.fftshift(si, axis=-1)[..., geom.discard: geom.discard + fnw]
        sr = sr * dr_local
        si = si * dr_local

        # corner turn — all-to-all over 'chan': split blocks, gather channels
        # (P, C/dc, B, fnw) -> (P, C, B/dc, fnw)
        def turn(v):
            return jax.lax.all_to_all(
                v, "chan", split_axis=2, concat_axis=1, tiled=True
            )

        sr = turn(sr)
        si = turn(si)

        # phase 2 — block-local: assemble full band, roll, taper, big IFFT
        b_loc = blocks_per_t // dc
        def assemble(v):
            flat = jnp.transpose(v, (0, 2, 1, 3)).reshape(
                n_pol, b_loc, n_chan * fnw
            )
            if spans_nyquist:
                flat = jnp.roll(flat, -(fnw // 2), axis=-1)
            return flat * s_local

        br, bi = cfft.ifft(assemble(sr), assemble(si))
        outr = (br[..., lo:hi] * scale).reshape(n_pol, 1, b_loc * geom.output_keep)
        outi = (bi[..., lo:hi] * scale).reshape(n_pol, 1, b_loc * geom.output_keep)
        return outr, outi

    rr, ri = run((xr, xi), t_vec, s_vec, dr)
    valid = geom.n_blocks(n_dat) * geom.output_keep
    return rr[:, :, :valid], ri[:, :, :valid]

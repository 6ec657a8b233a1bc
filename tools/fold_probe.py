"""Isolate the analysis kernel's cost centers on the chip: DMA-only,
aligned-slice fold (numerically wrong — perf probe only), and the real
shifted fold, all without the GEMM/ramp epilogue. One JSON line each."""
import functools
import json
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

BLOCK, STEP, PHASES = 256, 192, 13
SUP_L, SUP_A = 768, 4
TILE_K, KSUP = 128, 32
NS2, NS2_PAD, H = 40, 40, 16
NC = 2


def make_kernel(mode):
    def kern(x0, x1, f2d_ref, dh1, dl1, dh2, dl2, dh3, dl3,
             rr_ref, ri_ref, o_ref, xb, fs, fs2, sems):
        t = pl.program_id(1)
        n_t = pl.num_programs(1)
        slot = jax.lax.rem(t, 2)
        nxt = jax.lax.rem(t + 1, 2)
        xc = (x0, x1)

        if mode == "dmaflat":
            # flat (2, NS2*SUP_L) copies from a flat HBM view into a flat
            # scratch (xb last dims flattened) — round-3 shape
            def dma(ti, si, a):
                return pltpu.make_async_copy(
                    xc[a % NC].at[pl.ds(0, 2),
                                  pl.ds(ti * KSUP * SUP_L, NS2 * SUP_L)],
                    xb.at[si, a],
                    sems.at[si, a],
                )
        elif mode == "dmarow8":
            # coarse rows: (2, NS2//8, 8*SUP_L) rect from an 8-row view
            def dma(ti, si, a):
                return pltpu.make_async_copy(
                    xc[a % NC].at[pl.ds(0, 2),
                                  pl.ds(ti * KSUP // 8, NS2 // 8), :],
                    xb.at[si, a],
                    sems.at[si, a],
                )
        else:
            def dma(ti, si, a):
                return pltpu.make_async_copy(
                    xc[a % NC].at[pl.ds(0, 2), pl.ds(ti * KSUP, NS2), :],
                    xb.at[si, a, :, pl.ds(0, NS2), :],
                    sems.at[si, a],
                )

        n_span = 2 if mode.startswith("merged") else SUP_A

        @pl.when(t == 0)
        def _():
            for a in range(n_span):
                dma(t, slot, a).start()

        @pl.when(t + 1 < n_t)
        def _():
            for a in range(n_span):
                dma(t + 1, nxt, a).start()

        for a in range(n_span):
            dma(t, slot, a).wait()

        if mode == "dmaflat":
            o_ref[...] = jnp.zeros((2, TILE_K, BLOCK), jnp.float32) + xb[
                slot, 0, :, 0:BLOCK][:, None, :]
            return
        if mode == "dmarow8":
            o_ref[...] = jnp.zeros((2, TILE_K, BLOCK), jnp.float32) + xb[
                slot, 0, :, 0:1, 0:BLOCK]
            return
        if mode == "dma":
            o_ref[...] = jnp.zeros((2, TILE_K, BLOCK), jnp.float32) + xb[
                slot, 0, :, 0:1, 0:BLOCK]
            return

        f2d = f2d_ref[:]

        if mode == "merged64":
            # ONE span serves all SUP_A shifts with 64-lane columns (the
            # offset granularity gcd(step, 128) = 64); no staged copies
            def mfold64(c, dst):
                for K8 in range(0, KSUP, 8):
                    accs = []
                    v = xb[slot, c, :, K8: K8 + H, :]
                    wins = {}

                    def win(p):
                        if p not in wins:
                            wins[p] = v[:, p: p + 8, :]
                        return wins[p]

                    for a in range(SUP_A):
                        cols = [jnp.zeros((2, 8, 64), jnp.float32)
                                for _ in range(BLOCK // 64)]
                        for m in range(PHASES):
                            for j in range(BLOCK // 64):
                                p, lc = divmod(
                                    a * STEP + m * BLOCK + j * 64, SUP_L)
                                cols[j] = cols[j] + (
                                    f2d[m, j * 64:(j + 1) * 64]
                                    * win(p)[:, :, lc: lc + 64]
                                )
                        accs.append(jnp.concatenate(cols, axis=2))
                    g = jnp.stack(accs, axis=2).reshape(2, 8 * SUP_A, BLOCK)
                    dst[:, pl.ds(K8 * SUP_A, 8 * SUP_A), :] = g

            mfold64(0, fs)
            mfold64(1, fs2)
            o_ref[...] = fs[:] + fs2[:]
            return

        if mode.startswith("merged"):
            # ONE span serves all SUP_A shifts: lane offsets go to 64-
            # granularity (gcd(step,128)) — value-level lane rotations.
            # Fold runs twice (both complex components, as the real kernel
            # does) into the two staging scratches.
            def mfold(c, dst):
                for K8 in range(0, KSUP, 8):
                    accs = []
                    v = xb[slot, c, :, K8: K8 + H, :]
                    wins = {}

                    def win(p):
                        if p not in wins:
                            wins[p] = v[:, p: p + 8, :]
                        return wins[p]

                    for a in range(SUP_A):
                        cols = [jnp.zeros((2, 8, 128), jnp.float32)
                                for _ in range(BLOCK // 128)]
                        for m in range(PHASES):
                            for j in range(BLOCK // 128):
                                p, lc = divmod(
                                    a * STEP + m * BLOCK + j * 128, SUP_L)
                                cols[j] = cols[j] + (
                                    f2d[m, j * 128:(j + 1) * 128]
                                    * win(p)[:, :, lc: lc + 128]
                                )
                        accs.append(jnp.concatenate(cols, axis=2))
                    g = jnp.stack(accs, axis=2).reshape(2, 8 * SUP_A, BLOCK)
                    dst[:, pl.ds(K8 * SUP_A, 8 * SUP_A), :] = g

            mfold(0, fs)
            if mode == "merged2":
                mfold(1, fs2)
                o_ref[...] = fs[:] + fs2[:]
            else:
                o_ref[...] = fs[:]
            return

        def fold2(dst):
            for K8 in range(0, KSUP, 8):
                accs = []
                for a in range(SUP_A):
                    lam = (a - a % NC) * STEP
                    v = xb[slot, a, :, K8: K8 + H, :]
                    wins = {}

                    def win(p):
                        if p not in wins:
                            wins[p] = v[:, p: p + 8, :]
                        return wins[p]

                    cols = [jnp.zeros((2, 8, 128), jnp.float32)
                            for _ in range(BLOCK // 128)]
                    for m in range(PHASES):
                        for j in range(BLOCK // 128):
                            p, lc = divmod(lam + m * BLOCK + j * 128, SUP_L)
                            if mode == "aligned":
                                p, lc = 0, (m * BLOCK + j * 128) % SUP_L
                            cols[j] = cols[j] + (
                                f2d[m, j * 128:(j + 1) * 128]
                                * win(p)[:, :, lc: lc + 128]
                            )
                    accs.append(jnp.concatenate(cols, axis=2))
                g = jnp.stack(accs, axis=2).reshape(2, 8 * SUP_A, BLOCK)
                dst[:, pl.ds(K8 * SUP_A, 8 * SUP_A), :] = g

        fold2(fs)
        if mode in ("aligned", "true"):
            o_ref[...] = fs[:]
            return

        from ska_pst_dsp_tpu.ops import cfft
        dn = (((1,), (0,)), ((), ()))
        fr = fs[:].reshape(2 * TILE_K, BLOCK)
        t1 = cfft._dot1(fr, dh1[:], dl1[:], dn)
        if mode == "gemm1":
            o_ref[...] = t1.reshape(2, TILE_K, BLOCK)
            return
        # second fold into fs2 (imag component stand-in: same data)
        fold2(fs2)
        fi = fs2[:].reshape(2 * TILE_K, BLOCK)
        t2 = cfft._dot1(fi, dh2[:], dl2[:], dn)
        t3 = cfft._dot1(fr + fi, dh3[:], dl3[:], dn)
        re = t1 - t2
        im = t3 - t1 - t2
        if mode == "gemm3":
            o_ref[...] = (re + im).reshape(2, TILE_K, BLOCK)
            return
        sr = (re * BLOCK).reshape(2, TILE_K, BLOCK)
        si = (im * BLOCK).reshape(2, TILE_K, BLOCK)
        rr = rr_ref[:]
        ri = ri_ref[:]
        o_ref[...] = sr * rr - si * ri

    return kern


def run(mode, n_dat=2 ** 23):
    import ml_dtypes

    rng = np.random.default_rng(0)
    n_rows = n_dat // SUP_L
    nbp = (n_rows - NS2) // KSUP + 1
    if mode == "dmaflat":
        x = jax.device_put(
            rng.standard_normal((2, n_rows * SUP_L)).astype(np.float32))
    elif mode == "dmarow8":
        x = jax.device_put(
            rng.standard_normal((2, n_rows // 8, 8 * SUP_L))
            .astype(np.float32))
    else:
        x = jax.device_put(
            rng.standard_normal((2, n_rows, SUP_L)).astype(np.float32))
    f2d = jax.device_put(
        rng.standard_normal((PHASES, BLOCK)).astype(np.float32))
    dmats = [
        jax.device_put(rng.standard_normal((BLOCK, BLOCK))
                       .astype(ml_dtypes.bfloat16))
        for _ in range(6)
    ]
    ramps = [
        jax.device_put(rng.standard_normal((TILE_K, BLOCK))
                       .astype(np.float32))
        for _ in range(2)
    ]

    @functools.partial(jax.jit, static_argnames=())
    def call(x0):
        return pl.pallas_call(
            make_kernel(mode),
            grid=(1, nbp),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2
            + [pl.BlockSpec((PHASES, BLOCK), lambda p, t: (0, 0),
                            memory_space=pltpu.VMEM)]
            + [pl.BlockSpec((BLOCK, BLOCK), lambda p, t: (0, 0),
                            memory_space=pltpu.VMEM)] * 6
            + [pl.BlockSpec((TILE_K, BLOCK), lambda p, t: (0, 0),
                            memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec((2, TILE_K, BLOCK),
                                   lambda p, t: (p, t, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((2, nbp * TILE_K, BLOCK),
                                           jnp.float32),
            scratch_shapes=[
                pltpu.VMEM(
                    (2, SUP_A, 2, NS2 * SUP_L) if mode == "dmaflat"
                    else (2, SUP_A, 2, NS2 // 8, 8 * SUP_L)
                    if mode == "dmarow8"
                    else (2, SUP_A, 2, NS2_PAD, SUP_L),
                    jnp.float32,
                ),
                pltpu.VMEM((2, TILE_K, BLOCK), jnp.float32),
                pltpu.VMEM((2, TILE_K, BLOCK), jnp.float32),
                pltpu.SemaphoreType.DMA((2, SUP_A)),
            ],
        )(x0, x0, f2d, *dmats, *ramps)

    dt = bench._chain_timer(call, (x,), 30)
    print(json.dumps({"exp": f"fold_probe_{mode}", "ms": round(dt * 1e3, 3)}),
          flush=True)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ("gemm1", "gemm3", "full"):
        run(mode)

"""Measure Mosaic dot_general orientations on the chip: standard
((1,),(0,)) vs sublane-contraction ((0,),(0,)) at the ifft epilogue's
shapes. One JSON line per experiment."""
import functools
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))
import bench  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402


def run(mode, reps=100, iters=64):
    import ml_dtypes

    rng = np.random.default_rng(0)
    # ifft-like shapes: inner (128 x 1536) vs (128,128); outer (384 x 512)
    # vs (384, 240)
    a1 = rng.standard_normal((128, 1536)).astype(np.float32)
    b1 = rng.standard_normal((128, 128)).astype(ml_dtypes.bfloat16)
    a2 = rng.standard_normal((384, 512)).astype(np.float32)
    b2 = rng.standard_normal((384, 240)).astype(ml_dtypes.bfloat16)
    a1t = np.ascontiguousarray(a1.T)
    b2t = np.ascontiguousarray(b2.T)

    def kern(a1_ref, b1_ref, a2_ref, b2_ref, o_ref):
        acc = jnp.zeros((8, 128), jnp.float32)
        for _ in range(iters):
            if mode == "dn00":
                # inner: contract sublanes of both -> (1536, 128)
                y1 = jax.lax.dot_general(
                    a1_ref[:].astype(jnp.bfloat16), b1_ref[:],
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # outer: const-first sublane contraction -> (240, 512)
                y2 = jax.lax.dot_general(
                    b2_ref[:], a2_ref[:].astype(jnp.bfloat16),
                    dimension_numbers=(((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + y1[:8, :128] + y2[:8, :128]
            else:
                # standard: (1536, 128) @ (128, 128); (240, 384) @ (384, 512)
                y1 = jax.lax.dot_general(
                    a1_ref[:].astype(jnp.bfloat16), b1_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                y2 = jax.lax.dot_general(
                    a2_ref[:].astype(jnp.bfloat16), b2_ref[:],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = acc + y1[:8, :128] + y2[:8, :128]
        o_ref[...] = acc

    if mode == "dn00":
        args = (a1, b1, a2, b2)
    else:
        # a1t (1536,128) f32 @ b1 (128,128) bf16;
        # b2t (240,384) f32 @ a2->bf16 (384,512)
        args = (a1t, b1, b2t.astype(np.float32),
                a2.astype(ml_dtypes.bfloat16))

    @jax.jit
    def call(x0, x1, x2, x3):
        return pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
        )(x0, x1, x2, x3)

    dt = bench._chain_timer(call, tuple(jnp.asarray(x) for x in args), reps)
    flops = iters * 2 * (128 * 1536 * 128 + 384 * 240 * 512)
    print(json.dumps({
        "exp": f"gemm_{mode}", "us": round(dt * 1e6, 1),
        "tflops": round(flops / dt / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ("dn00", "std"):
        run(mode)

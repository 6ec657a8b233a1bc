"""Test configuration.

Tests run on an 8-virtual-device CPU platform: sharding tests exercise real
multi-chip program structure without TPU hardware, and the numeric
differential tests run against fp64 NumPy oracles. (The environment may pin
JAX_PLATFORMS to the TPU tunnel; tests force CPU — benchmarks and the driver
entrypoints use the real chip.)
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
# Differential tests assert exact-fp32-class agreement with fp64 oracles;
# 'highest' makes cfft.kernel_dot a plain f32 dot on CPU (exact), where the
# hardware default 'high' would run the split-bf16x3 path (~1e-5 relative)
# even under interpret mode.
os.environ.setdefault("SKA_PST_FFT_PRECISION", "highest")
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

# jax may already have been imported (and read the env) via a pytest plugin;
# override the config value directly before any backend initializes.
jax.config.update("jax_platforms", "cpu")

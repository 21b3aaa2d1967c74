"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip semantics are tested without a TPU pod via
``--xla_force_host_platform_device_count`` (the standard JAX trick); all unit
tests therefore run on CPU with 8 virtual devices.
"""

import os

# Force CPU even when the ambient environment selects a TPU platform: unit
# tests rely on the 8-virtual-device trick, which is host-platform only.
# JAX reads JAX_PLATFORMS at import time and a pytest plugin may import jax
# before this conftest, so set the config object too (backend init is lazy,
# so this is still early enough).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
if os.environ.get("SYNERGY_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # This CPU backend's DEFAULT matmul precision is reduced (oneDNN
    # bf16-class: ~6e-3 abs error on a 768-dim contraction vs 3e-7 at
    # float32). Parity oracles compare against torch true-f32 matmuls, so
    # force full precision for the test lane; the library itself keeps the
    # platform default (TPU trains in bf16 by design).
    jax.config.update("jax_default_matmul_precision", "float32")

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

from synergy_tpu.utils import enable_compilation_cache  # noqa: E402

# Repeat test runs are dominated by XLA compiles of the same programs;
# the persistent cache turns those into disk hits. Threshold lowered from
# the library default (10 s) because test programs are small but numerous.
# host_keyed: CPU cache entries are AOT machine code for THIS host — a
# stale entry from a previous (differently-featured) VM deoptimizes one
# collective participant past XLA's hardcoded 40 s rendezvous termination
# timeout and abort()s the process (measured: the round-4/5 parity-lane
# "Fatal Python error: Aborted" repro'd ONLY with the shared cache dir).
enable_compilation_cache(host_keyed=True)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)


@pytest.fixture
def rng():
    return np.random.default_rng(0)

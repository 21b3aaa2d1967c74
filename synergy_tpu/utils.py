"""Small shared utilities (reference utils.py:23-51 for PSNR/str2bool/set_SEED)."""

from __future__ import annotations

import argparse
import os
import random

import jax
import jax.numpy as jnp
import numpy as np


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Peak signal-to-noise ratio for images in [0, 1] (reference utils.py:23-33)."""
    mse = jnp.mean((img1 - img2) ** 2)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(mse))


def str2bool(v) -> bool:
    """argparse-compatible bool coercion (reference utils.py:35-43)."""
    if isinstance(v, bool):
        return v
    if v.lower() in ("yes", "true", "t", "y", "1"):
        return True
    if v.lower() in ("no", "false", "f", "n", "0"):
        return False
    raise argparse.ArgumentTypeError("Boolean value expected.")


def host_cpu_fingerprint() -> str:
    """Short stable hash of this host's CPU feature flags. XLA:CPU cache
    entries are AOT machine code: loading an entry compiled on a previous
    host with different features deoptimizes (or SIGILLs), which measured
    as one collective participant missing the hardcoded 40 s rendezvous
    termination timeout (rendezvous.cc CHECK -> silent abort) in the
    Large-dim parity lane. Keying the CPU cache dir by host identity makes
    foreign-host entries unloadable instead."""
    import hashlib
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    return hashlib.sha1(line.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha1(platform.processor().encode()).hexdigest()[:12]


def enable_compilation_cache(host_keyed: bool = False) -> None:
    """Point JAX's persistent compilation cache at a per-user dir so repeat
    CLI invocations skip the multi-minute XLA compile of the Base train/eval
    steps (the first MMR step compiles for ~4 min cold; ~seconds warm).
    Call from CLI entry points; safe to call more than once.

    host_keyed=True segments the cache by host CPU fingerprint — required
    for CPU-backend runs (the test lanes), whose entries are host machine
    code; TPU entries are compiled device-side, so CLIs on the chip keep
    the shared dir and survive host re-provisioning between rounds."""
    try:
        cache = os.path.join(os.path.expanduser("~"), ".cache", "synergy_tpu",
                             "xla_cache")
        if host_keyed:
            cache += "_" + host_cpu_fingerprint()
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 10)
    except Exception:
        pass  # cache is an optimization, never a requirement


def set_seed(seed: int) -> jax.Array:
    """Seed host RNGs and return a JAX PRNG key (reference utils.py:45-51).

    JAX programs are deterministic by construction given the key; we additionally pin
    python/numpy RNGs because the host data pipeline uses them (augmentation choices,
    template sampling).
    """
    random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)

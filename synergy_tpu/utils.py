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

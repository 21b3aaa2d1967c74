"""Fused-MLP Pallas kernel correctness vs the XLA reference path (interpreter
mode on CPU): forward, all five gradients, activations, padding, and the
MLPBlock routing/param-tree compatibility."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.experimental.pallas import tpu as pltpu

from synergy_tpu.ops.fused_mlp import _erf, fused_mlp, xla_mlp


def _rand(rng, n=200, d_in=128, d_ff=384, d_out=128, dtype=jnp.float32):
    x = jnp.asarray(rng.standard_normal((n, d_in)) * 0.5, dtype)
    w1 = jnp.asarray(rng.standard_normal((d_in, d_ff)) * 0.05, dtype)
    b1 = jnp.asarray(rng.standard_normal((d_ff,)) * 0.1, dtype)
    w2 = jnp.asarray(rng.standard_normal((d_ff, d_out)) * 0.05, dtype)
    b2 = jnp.asarray(rng.standard_normal((d_out,)) * 0.1, dtype)
    return x, w1, b1, w2, b2


def test_erf_polynomial_accuracy():
    """A&S 7.1.26 must stay well inside the 1e-4 HF-parity gate."""
    x = jnp.linspace(-6.0, 6.0, 20001)
    err = jnp.max(jnp.abs(_erf(x) - jax.lax.erf(x)))
    assert float(err) < 1e-6  # 1.5e-7 in exact arithmetic + f32 rounding


@pytest.mark.parametrize("act", ["gelu", "gelu_new", "quick_gelu", "relu"])
def test_fused_forward_matches_xla(rng, act):
    args = _rand(rng)
    ref = xla_mlp(*args, act=act)
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp(*args, act=act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_fused_grads_are_the_xla_grads(rng, act):
    """The differentiated path deliberately lowers to the XLA program
    (docs/BENCHMARKS.md: XLA's fwd+bwd beat the fused-backward prototype),
    so gradients must match the un-fused model bit-for-bit."""
    args = _rand(rng, n=150, d_in=128, d_ff=200, d_out=128)

    def loss(fn, *a):
        return jnp.sum(fn(*a, act=act) ** 2)

    g_ref = jax.grad(lambda *a: loss(xla_mlp, *a), argnums=(0, 1, 2, 3, 4))(*args)
    g = jax.grad(lambda *a: loss(fused_mlp, *a), argnums=(0, 1, 2, 3, 4))(*args)
    for name, a, b in zip(["dx", "dw1", "db1", "dw2", "db2"], g, g_ref):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)


def test_fused_3d_input_and_bf16(rng):
    x, w1, b1, w2, b2 = _rand(rng, n=256, dtype=jnp.bfloat16)
    x3 = x.reshape(2, 128, x.shape[-1])
    ref = xla_mlp(x3, w1, b1, w2, b2, act="gelu")
    with pltpu.force_tpu_interpret_mode():
        out = fused_mlp(x3, w1, b1, w2, b2, act="gelu")
    assert out.dtype == jnp.bfloat16 and out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2)


def test_mlp_block_param_tree_unchanged(rng):
    """MLPBlock declares its own {fc1,fc2}/{kernel,bias} params; they must be
    bit-identical to the nn.Dense layout it replaced (checkpoint compat)."""
    import flax.linen as nn

    from synergy_tpu.models.layers import ACTIVATIONS, MLPBlock

    class DenseTwin(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Dense(384, name="fc1")(x)
            x = ACTIVATIONS["gelu"](x)
            return nn.Dense(128, name="fc2")(x)

    x = jnp.asarray(rng.standard_normal((4, 128)), jnp.float32)
    block = MLPBlock(intermediate_size=384, hidden_size=128, act="gelu")
    p_new = block.init(jax.random.PRNGKey(7), x)["params"]
    p_old = DenseTwin().init(jax.random.PRNGKey(7), x)["params"]
    assert jax.tree_util.tree_structure(p_new) == jax.tree_util.tree_structure(p_old)
    for a, b in zip(jax.tree_util.tree_leaves(p_new),
                    jax.tree_util.tree_leaves(p_old)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    out = block.apply({"params": p_new}, x)  # xla route on CPU
    ref = DenseTwin().apply({"params": p_old}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_mlp_block_fused_route(rng, monkeypatch):
    """Forcing the fused route through MLPBlock gives the same numbers."""
    from synergy_tpu.models.layers import MLPBlock

    x = jnp.asarray(rng.standard_normal((9, 130, 128)), jnp.float32)
    block = MLPBlock(intermediate_size=256, hidden_size=128, act="quick_gelu")
    params = block.init(jax.random.PRNGKey(0), x)["params"]
    monkeypatch.setenv("SYNERGY_FUSED_MLP", "off")
    ref = block.apply({"params": params}, x)
    monkeypatch.setenv("SYNERGY_FUSED_MLP", "on")
    with pltpu.force_tpu_interpret_mode():
        out = block.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-6, rtol=1e-5)

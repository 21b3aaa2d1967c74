"""Shared downstream-eval machinery: classifier heads over exported towers +
a generic jitted fine-tune loop.

Mirrors the reference's ``DownstreamTaskModel`` pattern (reference
DT/FT_image_task.py:111-127 and DT/FT_audio_task.py:129-145): exported tower
+ its stage-1 projection head + a fresh linear classifier. The text variant
reproduces HF's RobertaClassificationHead (dense->tanh->out_proj over the CLS
hidden state), which is what ``AutoModelForSequenceClassification`` attaches
when the reference loads the exported text dir (DT/FT_text_task.py:121).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax

from synergy_tpu.configs import AudioConfig, TextConfig, VisionConfig
from synergy_tpu.models.ast import ASTModel
from synergy_tpu.models.roberta import RobertaModel
from synergy_tpu.models.vit import ViTModel
from synergy_tpu.train import checkpoint as ckpt


class VisionClassifier(nn.Module):
    config: VisionConfig
    num_classes: int
    projection_dim: int
    use_projection: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pixel_values):
        _, pooled = ViTModel(self.config, self.dtype, name="tower")(pixel_values)
        if self.use_projection:
            pooled = nn.Dense(self.projection_dim, use_bias=False,
                              dtype=self.dtype, name="projection")(pooled)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(pooled)


class AudioClassifier(nn.Module):
    config: AudioConfig
    num_classes: int
    projection_dim: int
    use_projection: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_values):
        _, pooled = ASTModel(self.config, self.dtype, name="tower")(input_values)
        if self.use_projection:
            pooled = nn.Dense(self.projection_dim, use_bias=False,
                              dtype=self.dtype, name="projection")(pooled)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="classifier")(pooled)


class TextClassifier(nn.Module):
    """RobertaClassificationHead-style: dense->tanh->out_proj over CLS."""

    config: TextConfig
    num_classes: int
    dtype: jnp.dtype = jnp.float32
    deterministic: bool = True

    @nn.compact
    def __call__(self, input_ids, attention_mask=None):
        lhs, _ = RobertaModel(self.config, self.dtype,
                              deterministic=self.deterministic,
                              name="tower")(input_ids, attention_mask)
        x = lhs[:, 0, :]
        x = nn.Dense(self.config.hidden_size, dtype=self.dtype, name="dense")(x)
        x = jnp.tanh(x)
        return nn.Dense(self.num_classes, dtype=self.dtype,
                        name="out_proj")(x)


def init_from_export(params: Dict[str, Any], ckpt_dir: str, tag: str,
                     modality: str, use_projection: bool = True):
    """Insert the exported tower (+ projection head) into fresh classifier
    params (the C12 load contract). Returns (params, weights_provenance);
    params come back unchanged if no checkpoint exists (random towers —
    still runnable) and the provenance string says so."""
    try:
        tower, head = ckpt.load_tower(ckpt_dir, tag, modality)
    except (FileNotFoundError, OSError):
        print(f"[eval] WARNING: no exported {modality} tower under "
              f"{ckpt_dir}/{tag}; using random init")
        return params, "random-init"
    params = dict(params)
    params["tower"] = tower
    if use_projection and "projection" in params:
        params["projection"] = head
    return params, f"checkpoint:{ckpt_dir}/{tag}"


def softmax_cross_entropy(logits, labels):
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), labels))


def finetune_classifier(
    model: nn.Module,
    params: Dict[str, Any],
    train_arrays: Tuple[np.ndarray, ...],
    train_labels: np.ndarray,
    test_arrays: Tuple[np.ndarray, ...],
    test_labels: np.ndarray,
    epochs: int = 3,
    batch_size: int = 32,
    lr: float = 1e-4,
    accum_steps: int = 1,
    seed: int = 0,
    schedule_milestones: Optional[Tuple[int, ...]] = None,
    log_prefix: str = "[ft]",
    preprocess_fn: Optional[Callable] = None,
    host_batch_fn: Optional[Callable] = None,
    loss: str = "ce",
) -> Dict[str, float]:
    """Plain jitted fine-tune loop (replaces the reference's per-script torch
    loops and the HF Trainer for text). ``preprocess_fn`` runs on-device per
    batch (e.g. uint8 -> normalized pixels). ``host_batch_fn(arrays, rng)``
    runs on the host per TRAIN batch before device transfer — the hook for
    non-jittable per-sample work like waveform augmentation (the reference
    augments inside its Dataset __getitem__, so every epoch sees fresh
    augmentations; FT_audio_task.py:75-82). ``loss='mse'`` enables the
    STS-B-style regression head. Returns final test metrics."""
    lr_sched: Any = lr
    if schedule_milestones:
        steps_per_epoch = max(1, len(train_labels) // batch_size)
        lr_sched = optax.piecewise_constant_schedule(
            lr, {m * steps_per_epoch: 0.1 for m in schedule_milestones})
    tx = optax.adamw(lr_sched)
    if accum_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, opt_state, arrays, labels, key):
        if preprocess_fn is not None:
            arrays = preprocess_fn(arrays, key)

        def loss_fn(p):
            logits = model.apply({"params": p}, *arrays)
            if loss == "mse":
                return jnp.mean((logits[:, 0] - labels.astype(jnp.float32)) ** 2)
            return softmax_cross_entropy(logits, labels)

        loss_v, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), opt_state, loss_v

    @jax.jit
    def eval_step(params, arrays):
        if preprocess_fn is not None:
            arrays = preprocess_fn(arrays, None)
        return model.apply({"params": params}, *arrays)

    n = len(train_labels)
    rng = np.random.default_rng(seed)
    aug_key = jax.random.PRNGKey(seed)
    step_i = 0
    for epoch in range(epochs):
        order = rng.permutation(n)
        losses = []
        for start in range(0, n - batch_size + 1, batch_size):
            idx = order[start: start + batch_size]
            arrays = tuple(a[idx] for a in train_arrays)
            if host_batch_fn is not None:
                arrays = host_batch_fn(
                    arrays, np.random.default_rng(rng.integers(2**63)))
            arrays = tuple(jnp.asarray(a) for a in arrays)
            params, opt_state, loss = train_step(
                params, opt_state, arrays, jnp.asarray(train_labels[idx]),
                jax.random.fold_in(aug_key, step_i))
            step_i += 1
            losses.append(float(loss))
        print(f"{log_prefix} epoch {epoch + 1}/{epochs} "
              f"loss={np.mean(losses):.4f}")

    outs = []
    for start in range(0, len(test_labels), batch_size):
        arrays = tuple(jnp.asarray(a[start: start + batch_size])
                       for a in test_arrays)
        outs.append(np.asarray(eval_step(params, arrays)))
    logits = np.concatenate(outs)[: len(test_labels)]
    if loss == "mse":
        return {"preds": logits[:, 0]}
    preds = logits.argmax(-1)
    acc = float((preds == test_labels[: len(preds)]).mean())
    return {"accuracy": acc * 100.0, "preds": preds}


def topk_accuracy(sim: np.ndarray, label: int, ks=(1, 5)) -> Dict[int, bool]:
    order = np.argsort(-sim)
    return {k: label in order[:k] for k in ks}

"""Train state + the jitted tri-modal contrastive train/eval steps.

Re-design of the reference's training inner loop (reference
main_pretraining.py:159-189): per microbatch, forward three towers, weighted
3-pair InfoNCE ``alpha*IT + beta*TA + gamma*AI`` (:166-167), gradient
accumulation over ``accum_steps`` microbatches (:79-80, :172-177), AdamW
(:139). Implemented as one jitted step over globally-sharded batches;
``optax.MultiSteps`` reproduces the accumulate-then-apply schedule.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import struct

from synergy_tpu.configs import CLIPConfig, TrainConfig
from synergy_tpu.losses import tri_clip_loss
from synergy_tpu.models.tri_clip import TriCLIP


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads):
        fused = getattr(self.tx, "fused_apply", None)
        if fused is not None:
            # one elementwise pass per leaf (no materialized update tree);
            # bit-identical to the optax path — see train/optim.py
            new_params, new_opt_state = fused(grads, self.opt_state,
                                              self.params)
        else:
            updates, new_opt_state = self.tx.update(grads, self.opt_state,
                                                    self.params)
            new_params = optax.apply_updates(self.params, updates)
        return self.replace(step=self.step + 1, params=new_params,
                            opt_state=new_opt_state)


def make_optimizer(train_cfg: TrainConfig) -> optax.GradientTransformation:
    if train_cfg.accum_steps > 1:
        # MultiSteps drives the inner transformation through the generic
        # update/apply_updates API, so the fused apply cannot engage inside
        # it; the accumulate-then-apply schedule keeps the plain pairing
        tx = optax.adamw(train_cfg.learning_rate,
                         weight_decay=train_cfg.weight_decay)
        return optax.MultiSteps(tx, every_k_schedule=train_cfg.accum_steps)
    if callable(train_cfg.learning_rate):  # schedules: plain optax path
        return optax.adamw(train_cfg.learning_rate,
                           weight_decay=train_cfg.weight_decay)
    from synergy_tpu.train.optim import fused_adamw

    return fused_adamw(train_cfg.learning_rate,
                       weight_decay=train_cfg.weight_decay)


def create_train_state(rng: jax.Array, model: TriCLIP, train_cfg: TrainConfig,
                       sample_batch: Dict[str, jnp.ndarray],
                       params: Optional[Any] = None) -> TrainState:
    if params is None:
        # jit: eager (op-by-op) Flax init takes minutes at Base scale; one
        # compiled program also lands in the persistent compilation cache
        params = jax.jit(model.init)(
            rng, sample_batch["pixel_values"], sample_batch["input_ids"],
            sample_batch["attention_mask"], sample_batch["input_values"],
        )["params"]
    tx = make_optimizer(train_cfg)
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      opt_state=tx.init(params), tx=tx)


def loss_fn(params, model: TriCLIP, batch, weights: Tuple[float, float, float],
            num_groups: int):
    out = model.apply(
        {"params": params}, batch["pixel_values"], batch["input_ids"],
        batch["attention_mask"], batch["input_values"])
    it, ta, ai = tri_clip_loss(
        out["image_embeds"], out["text_embeds"], out["audio_embeds"],
        out["logit_scale_IT"], out["logit_scale_TA"], out["logit_scale_AI"],
        num_groups=num_groups)
    alpha, beta, gamma = weights
    it, ta, ai = alpha * it, beta * ta, gamma * ai
    total = it + ta + ai
    return total, {"loss": total, "IT": it, "TA": ta, "AI": ai}


def device_preprocess(batch: Dict[str, jnp.ndarray], rng: Optional[jax.Array],
                      clip_cfg: CLIPConfig) -> Dict[str, jnp.ndarray]:
    """Fuse the augmentation tail + fbank into the device step. Input batch
    carries raw host tensors (pixel_rgb HWC as uint8 or [0,1] float, wave at
    16 kHz); output
    carries model-ready pixel_values / input_values. With ``rng=None`` the
    deterministic eval image chain is used."""
    from synergy_tpu.data.audio import log_mel_fbank
    from synergy_tpu.data.image import normalize, resize, train_transform

    image_size = clip_cfg.vision.image_size
    out = dict(batch)
    if "pixel_rgb" in out:
        imgs = out.pop("pixel_rgb")
        if imgs.dtype == jnp.uint8:
            # raw uint8 from the loader (4x fewer H2D bytes); identical
            # values to the old host-side f32/255 conversion
            imgs = imgs.astype(jnp.float32) / 255.0
        if rng is not None:
            keys = jax.random.split(rng, imgs.shape[0])
            out["pixel_values"] = jax.vmap(
                lambda k, im: train_transform(k, im, image_size))(keys, imgs)
        else:
            if imgs.shape[1] != image_size:
                imgs = jax.vmap(lambda im: resize(im, (image_size, image_size)))(imgs)
            out["pixel_values"] = jnp.transpose(normalize(imgs), (0, 3, 1, 2))
    if "wave" in out:
        wave = out.pop("wave")
        if wave.dtype == jnp.int16:
            # int16 PCM wire (opt-in, TriModalLoader wave_dtype="int16")
            wave = wave.astype(jnp.float32) / 32768.0
        fbank = jax.vmap(lambda w: log_mel_fbank(w))(wave)
        # follow the audio tower's input geometry (tiny configs use a crop)
        out["input_values"] = fbank[:, : clip_cfg.audio.max_length,
                                    : clip_cfg.audio.num_mel_bins]
    return out


def make_train_step(model: TriCLIP, train_cfg: TrainConfig, num_groups: int = 1,
                    preprocess: bool = False):
    weights = (train_cfg.alpha, train_cfg.beta, train_cfg.gamma)

    def train_step(state: TrainState, batch, rng=None):
        if preprocess:
            batch = device_preprocess(batch, rng, model.config)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, model, batch, weights, num_groups)
        return state.apply_gradients(grads), metrics

    return train_step


def make_eval_step(model: TriCLIP, train_cfg: TrainConfig, num_groups: int = 1,
                   preprocess: bool = False):
    weights = (train_cfg.alpha, train_cfg.beta, train_cfg.gamma)

    def eval_step(params, batch):
        if preprocess:
            batch = device_preprocess(batch, None, model.config)
        _, metrics = loss_fn(params, model, batch, weights, num_groups)
        return metrics

    return eval_step

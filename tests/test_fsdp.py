"""FSDP (ZeRO-3) sharding mode on the 8-virtual-device CPU mesh.

The reference's only strategy is DDP with fully-replicated state (reference
main_pretraining.py:61-67,138); FSDP is a TPU-native upgrade: params + Adam
moments shard over 'data' (parallel/mesh.py:_augment_fsdp) and GSPMD inserts
the per-use all-gathers and grad reduce-scatters. These tests pin (a) the
spec policy, (b) that per-device param bytes actually drop by the DP degree,
and (c) that one train step matches the replicated-DP step numerically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from synergy_tpu.configs import CLIPConfig, TrainConfig
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.parallel.mesh import (
    batch_sharding, create_mesh, opt_state_shardings, param_partition_specs,
    param_shardings,
)
from synergy_tpu.train.state import create_train_state, make_train_step


def _path_map(tree):
    return {"/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in p): v
            for p, v in jax.tree_util.tree_leaves_with_path(tree)}


def test_fsdp_spec_policy():
    """Policy on Base-scale shapes: largest free divisible axis shards over
    'data'; TP-taken axes are respected; indivisible axes (the 50265 vocab
    rows) are skipped; small leaves stay replicated."""
    params = {
        "attn": {"query": {"kernel": jnp.zeros((768, 768)),
                           "bias": jnp.zeros((768,))}},
        "mlp": {"fc1": {"kernel": jnp.zeros((768, 3072))},
                "fc2": {"kernel": jnp.zeros((3072, 768))}},
        "word_embeddings": {"embedding": jnp.zeros((50265, 768))},
        "ln": {"scale": jnp.zeros((768,))},
        # scan-stacked: leading 12-long layer axis must not be chosen
        "stacked": {"mlp": {"fc1": {"kernel": jnp.zeros((12, 768, 3072))}}},
    }
    specs = _path_map(param_partition_specs(params, tensor_parallel=True,
                                            fsdp_size=4))
    # TP takes fc1 cols -> FSDP takes the rows
    assert specs["mlp/fc1/kernel"] == P("data", "model")
    assert specs["mlp/fc2/kernel"] == P("model", "data")
    # square kernel: TP cols, FSDP rows
    assert specs["attn/query/kernel"] == P("data", "model")
    # vocab rows 50265 % 4 != 0 -> embedding cols shard instead
    assert specs["word_embeddings/embedding"] == P(None, "data")
    # stacked: largest axis is 3072 (TP) -> 768 is the largest free one
    assert specs["stacked/mlp/fc1/kernel"] == P(None, "data", "model")
    # small leaves replicated under FSDP (bias is TP-sharded by rule,
    # but gains no extra 'data' axis)
    assert specs["ln/scale"] == P()
    # without TP, fc1's largest axis goes to 'data'
    no_tp = _path_map(param_partition_specs(params, tensor_parallel=False,
                                            fsdp_size=4))
    assert no_tp["mlp/fc1/kernel"] == P(None, "data")
    assert no_tp["ln/scale"] == P()


@pytest.mark.slow
def test_fsdp_step_matches_replicated_dp():
    """FSDP (dp=4 x tp=2, threshold lowered so the tiny config actually
    shards) must (a) place strictly fewer param bytes per device than
    replicated DP and (b) produce the same loss and gradients. Gradients, not
    post-Adam params: Adam normalizes per element, so f32 reduction-order
    noise on near-zero grads flips update signs (same rationale as
    test_train.py::test_sharded_train_step_matches_single_device)."""
    cfg = CLIPConfig.tiny()
    tcfg = TrainConfig(per_device_batch=1, accum_steps=1, learning_rate=1e-3)
    model = TriCLIP(cfg)
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (8, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.text.vocab_size, (8, 8)), jnp.int32),
        "attention_mask": jnp.ones((8, 8), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (8, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }
    mesh = create_mesh((4, 2))

    from synergy_tpu.train.state import loss_fn

    def grads_of(params):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, model, batch_placed, (1.0, 1.0, 1.0), 1)
        return metrics["loss"], grads

    def run(fsdp):
        state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch)
        kw = dict(fsdp=fsdp, fsdp_min_size=128) if fsdp else {}
        p_sh = param_shardings(mesh, state.params, **kw)
        o_sh = opt_state_shardings(mesh, state.opt_state, state.params, **kw)
        state = state.replace(params=jax.device_put(state.params, p_sh),
                              opt_state=jax.device_put(state.opt_state, o_sh))
        shard_bytes = sum(
            leaf.addressable_shards[0].data.nbytes
            for leaf in jax.tree_util.tree_leaves(state.params)
            if hasattr(leaf, "addressable_shards"))
        with mesh:
            loss, grads = jax.jit(grads_of)(state.params)
            step = jax.jit(make_train_step(model, tcfg), donate_argnums=(0,))
            new_state, _ = step(state, batch_placed)
        return new_state, float(loss), jax.device_get(grads), shard_bytes

    batch_placed = {k: jax.device_put(v, batch_sharding(mesh))
                    for k, v in batch.items()}
    _, rep_loss, rep_grads, rep_bytes = run(fsdp=False)
    fsdp_state, fsdp_loss, fsdp_grads, fsdp_bytes = run(fsdp=True)

    # ZeRO point: some param leaves hold < full bytes per device. The tiny
    # config's indivisible leaves stay replicated, so assert a >25% drop.
    assert fsdp_bytes < 0.75 * rep_bytes, (fsdp_bytes, rep_bytes)
    assert fsdp_loss == pytest.approx(rep_loss, abs=2e-5)

    # relative: embedding grads reach ~1e5 magnitude, where f32
    # reduction-order noise is ~1e0
    def rel_diff(a, b):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        return float(np.max(np.abs(a - b)) / max(1.0, np.max(np.abs(a))))

    diffs = jax.tree_util.tree_map(rel_diff, rep_grads, fsdp_grads)
    assert max(jax.tree_util.tree_leaves(diffs)) < 1e-5

    # Adam moments mirror their param's FSDP spec (ZeRO's main target)
    p_specs = {k: v.sharding.spec
               for k, v in _path_map(fsdp_state.params).items()}
    mirrored = 0
    for path, leaf in _path_map(fsdp_state.opt_state).items():
        if not hasattr(leaf, "sharding"):
            continue
        for p, spec in p_specs.items():
            if getattr(leaf, "shape", None) is not None and (
                    path == p or path.endswith("/" + p)):
                assert leaf.sharding.spec == spec, (path, leaf.sharding.spec)
                if any(ax is not None for ax in spec):
                    mirrored += 1
                break
    assert mirrored >= 4, mirrored


@pytest.mark.slow
def test_fsdp_checkpoint_roundtrip(tmp_path):
    """Resume keeps ZeRO placement: an Orbax save of FSDP-sharded state
    restores bit-identically into an FSDP-sharded blank template, and the
    restored leaves keep their NamedSharding (pretrain.py restores AFTER
    device_put-ing the sharded blank state, so this is the real resume path)."""
    from synergy_tpu.train import checkpoint as ckpt

    cfg = CLIPConfig.tiny()
    tcfg = TrainConfig(per_device_batch=1, accum_steps=1, learning_rate=1e-3)
    model = TriCLIP(cfg)
    rng = np.random.default_rng(1)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (8, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.text.vocab_size, (8, 8)), jnp.int32),
        "attention_mask": jnp.ones((8, 8), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (8, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }
    mesh = create_mesh((4, 2))
    kw = dict(fsdp=True, fsdp_min_size=128)

    def place(state):
        return state.replace(
            params=jax.device_put(
                state.params, param_shardings(mesh, state.params, **kw)),
            opt_state=jax.device_put(
                state.opt_state,
                opt_state_shardings(mesh, state.opt_state, state.params, **kw)))

    state = place(create_train_state(jax.random.PRNGKey(0), model, tcfg, batch))
    with mesh:
        state, _ = jax.jit(make_train_step(model, tcfg))(
            state, {k: jax.device_put(v, batch_sharding(mesh))
                    for k, v in batch.items()})
    ckpt.save_state(str(tmp_path), "base_prompt", state)

    blank = place(create_train_state(jax.random.PRNGKey(7), model, tcfg, batch))
    restored = ckpt.restore_state(str(tmp_path), "base_prompt", blank)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(
            jnp.asarray(a, jnp.float32) - jnp.asarray(b, jnp.float32)))),
        jax.device_get(state.params), jax.device_get(restored.params))
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    sharded = [l for l in jax.tree_util.tree_leaves(restored.params)
               if hasattr(l, "sharding")
               and any(ax is not None for ax in l.sharding.spec)]
    assert sharded, "restore dropped the FSDP shardings"


@pytest.mark.slow
def test_elastic_restore_across_mesh_shapes(tmp_path):
    """Pod-reshape resume: a checkpoint saved under one mesh/sharding config
    restores bit-identically into a DIFFERENT one (the blank template carries
    the new shardings; Orbax reshards on read). Covers the two real
    migrations — scaling DP out (dp=4 tp=2 FSDP -> dp=8 tp=1 replicated) and
    trading DP for TP (-> dp=2 tp=4 FSDP) — and proves the restored state
    trains: one step on the new mesh with a finite loss."""
    from synergy_tpu.train import checkpoint as ckpt

    cfg = CLIPConfig.tiny()
    tcfg = TrainConfig(per_device_batch=1, accum_steps=1, learning_rate=1e-3)
    model = TriCLIP(cfg)
    rng = np.random.default_rng(2)
    batch = {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (8, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32),
        "input_ids": jnp.asarray(
            rng.integers(4, cfg.text.vocab_size, (8, 8)), jnp.int32),
        "attention_mask": jnp.ones((8, 8), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (8, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }

    def place(state, mesh, **kw):
        return state.replace(
            params=jax.device_put(
                state.params, param_shardings(mesh, state.params, **kw)),
            opt_state=jax.device_put(
                state.opt_state,
                opt_state_shardings(mesh, state.opt_state, state.params, **kw)))

    # train one step on the SOURCE mesh so moments are non-trivial, then save
    src_mesh = create_mesh((4, 2))
    src_kw = dict(fsdp=True, fsdp_min_size=128)
    state = place(create_train_state(jax.random.PRNGKey(0), model, tcfg, batch),
                  src_mesh, **src_kw)
    with src_mesh:
        state, _ = jax.jit(make_train_step(model, tcfg))(
            state, {k: jax.device_put(v, batch_sharding(src_mesh))
                    for k, v in batch.items()})
    ckpt.save_state(str(tmp_path), "base_prompt", state)
    want = jax.device_get(state.params)

    for shape, kw in (((8, 1), {}), ((2, 4), dict(fsdp=True,
                                                  fsdp_min_size=128))):
        dst_mesh = create_mesh(shape)
        blank = place(create_train_state(jax.random.PRNGKey(9), model, tcfg,
                                         batch), dst_mesh, **kw)
        restored = ckpt.restore_state(str(tmp_path), "base_prompt", blank)
        got = jax.device_get(restored.params)
        diffs = jax.tree_util.tree_map(
            lambda a, b: float(np.max(np.abs(
                np.asarray(a, np.float32) - np.asarray(b, np.float32)))),
            want, got)
        assert max(jax.tree_util.tree_leaves(diffs)) == 0.0, shape
        assert int(restored.step) == 1
        # the restored leaves live on the DESTINATION mesh with its specs
        leaf = restored.params["text"]["encoder"]["layer_0"]["mlp"]["fc1"]["kernel"]
        assert leaf.sharding.mesh.shape == dict(
            zip(("data", "model"), shape)), shape
        with dst_mesh:
            restored, metrics = jax.jit(make_train_step(model, tcfg))(
                restored, {k: jax.device_put(v, batch_sharding(dst_mesh))
                           for k, v in batch.items()})
        assert np.isfinite(float(metrics["loss"])), shape

"""Training-stack tests on the 8-virtual-device CPU mesh: sharded train step,
gradient accumulation, local-vs-global negatives, checkpoint round-trip, and
the pretrain CLI end-to-end in synthetic mode."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from synergy_tpu.configs import CLIPConfig, TrainConfig
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.parallel.mesh import (
    batch_sharding, create_mesh, param_partition_specs, param_shardings,
)
from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.train.state import (
    create_train_state, make_train_step,
)


def _tiny_batch(cfg, batch=8, seq=8, rng=None):
    rng = rng or np.random.default_rng(0)
    return {
        "pixel_values": jnp.asarray(rng.standard_normal(
            (batch, 3, cfg.vision.image_size, cfg.vision.image_size)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(4, cfg.text.vocab_size, (batch, seq)), jnp.int32),
        "attention_mask": jnp.ones((batch, seq), jnp.int32),
        "input_values": jnp.asarray(rng.standard_normal(
            (batch, cfg.audio.max_length, cfg.audio.num_mel_bins)), jnp.float32),
    }


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = CLIPConfig.tiny()
    tcfg = TrainConfig(per_device_batch=1, accum_steps=1, learning_rate=1e-3)
    model = TriCLIP(cfg)
    batch = _tiny_batch(cfg)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch)
    return cfg, tcfg, model, batch, state


@pytest.mark.slow
def test_mesh_and_partition_specs(tiny_setup):
    cfg, tcfg, model, batch, state = tiny_setup
    mesh = create_mesh((4, 2))
    assert mesh.shape == {"data": 4, "model": 2}
    specs = param_partition_specs(state.params)
    flat = jax.tree_util.tree_leaves_with_path(specs)
    joined = {"/".join(str(getattr(k, "key", k)) for k in path): spec
              for path, spec in flat}
    # fc1 column-parallel, fc2 row-parallel (unrolled default: 2D kernels)
    fc1 = [s for p, s in joined.items() if "fc1/kernel" in p]
    fc2 = [s for p, s in joined.items() if "fc2/kernel" in p]
    assert all(s == P(None, "model") for s in fc1) and fc1
    assert all(s == P("model", None) for s in fc2) and fc2
    proj = [s for p, s in joined.items() if "_projection/kernel" in p]
    assert all(s == P(None, "model") for s in proj) and proj
    # scan-stacked layer params get a leading None prepended
    scan_model = TriCLIP(CLIPConfig.tiny(), scan_layers=True)
    scan_params = jax.jit(scan_model.init)(
        jax.random.PRNGKey(0), batch["pixel_values"], batch["input_ids"],
        batch["attention_mask"], batch["input_values"])["params"]
    sspecs = param_partition_specs(scan_params)
    sflat = {"/".join(str(getattr(k, "key", k)) for k in path): spec
             for path, spec in jax.tree_util.tree_leaves_with_path(sspecs)}
    sfc1 = [s for p, s in sflat.items() if "fc1/kernel" in p]
    assert all(s == P(None, None, "model") for s in sfc1) and sfc1


@pytest.mark.slow
def test_sharded_train_step_matches_single_device(tiny_setup):
    """DP+TP sharded loss/grads must match the unsharded computation.

    Compares gradients (not post-Adam params): Adam normalizes per element,
    so f32 reduction-order noise on near-zero grads would flip update signs
    and mask real sharding bugs.
    """
    from synergy_tpu.train.state import loss_fn

    cfg, tcfg, model, batch, state = tiny_setup
    grad_fn = jax.jit(lambda p, b: jax.value_and_grad(loss_fn, has_aux=True)(
        p, model, b, (1.0, 1.0, 1.0), 1))

    (loss_s, _), grads_s = grad_fn(state.params, batch)

    mesh = create_mesh((4, 2))
    with mesh:
        p_sh = param_shardings(mesh, state.params)
        sh_params = jax.device_put(state.params, p_sh)
        sh_batch = {k: jax.device_put(v, batch_sharding(mesh))
                    for k, v in batch.items()}
        (loss_m, _), grads_m = grad_fn(sh_params, sh_batch)

    assert abs(float(loss_s) - float(loss_m)) < 1e-4
    # absolute-or-relative: attention key-bias grads are mathematically zero
    # (softmax shift invariance) and carry only f32 noise ~1e-8.
    ok = jax.tree_util.tree_map(
        lambda a, b: bool(jnp.max(jnp.abs(a - b)) <=
                          jnp.maximum(1e-6, 1e-3 * jnp.max(jnp.abs(a)))),
        grads_s, grads_m)
    assert all(jax.tree_util.tree_leaves(ok))


@pytest.mark.slow
def test_local_negatives_differ_from_global(tiny_setup):
    cfg, tcfg, model, batch, state = tiny_setup
    step_g = make_train_step(model, tcfg, num_groups=1)
    step_l = make_train_step(model, tcfg, num_groups=4)
    _, mg = jax.jit(step_g)(state, batch)
    _, ml = jax.jit(step_l)(state, batch)
    # local negatives see 2-sample matrices -> much smaller loss
    assert float(ml["loss"]) < float(mg["loss"])


@pytest.mark.slow
def test_grad_accumulation_semantics(tiny_setup):
    """With MultiSteps(k), params change only every k microbatches."""
    cfg, _, model, batch, _ = tiny_setup
    tcfg = TrainConfig(per_device_batch=1, accum_steps=2, learning_rate=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch)
    step = jax.jit(make_train_step(model, tcfg))
    p0 = state.params
    state, _ = step(state, batch)
    d1 = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, state.params)))
    assert d1 == 0.0  # first microbatch only accumulates
    state, _ = step(state, batch)
    d2 = max(jax.tree_util.tree_leaves(jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), p0, state.params)))
    assert d2 > 0.0  # second applies


@pytest.mark.slow
def test_checkpoint_roundtrip(tmp_path, tiny_setup):
    cfg, tcfg, model, batch, state = tiny_setup
    tag = ckpt.size_tag(True, False)
    assert tag == "base_prompt"
    ckpt.save_state(str(tmp_path), tag, state)
    # per-tower export exists (C12 contract)
    for m in ("vision", "text", "audio"):
        tower, head = ckpt.load_tower(str(tmp_path), tag, m)
        assert "kernel" in head
    blank = create_train_state(jax.random.PRNGKey(1), model, tcfg, batch)
    restored = ckpt.restore_state(str(tmp_path), tag, blank)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, restored.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0
    rebuilt = ckpt.load_tri_clip_params(str(tmp_path), tag)
    assert float(rebuilt["logit_scale_IT"]) == pytest.approx(2.6592)


def test_checkpoint_async_roundtrip(tmp_path, tiny_setup):
    """async_save returns before the files are committed; wait_for_saves is
    the barrier after which the full contract (state + export) is on disk."""
    cfg, tcfg, model, batch, state = tiny_setup
    tag = ckpt.size_tag(True, False)
    ckpt.save_state(str(tmp_path), tag, state, async_save=True)
    ckpt.wait_for_saves()
    for m in ("vision", "text", "audio"):
        _, head = ckpt.load_tower(str(tmp_path), tag, m)
        assert "kernel" in head
    blank = create_train_state(jax.random.PRNGKey(1), model, tcfg, batch)
    restored = ckpt.restore_state(str(tmp_path), tag, blank)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, restored.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


def test_checkpoint_retention(tmp_path, tiny_setup):
    """keep=N prunes to the newest N step checkpoints (and meta sidecars) —
    without it a long --checkpoint_every run accumulates ~3.6 GB of f32
    state per save at Base scale. Resume must still work from the survivor."""
    cfg, tcfg, model, batch, state = tiny_setup
    tag = ckpt.size_tag(True, False)

    def steps_on_disk():
        p = tmp_path / tag / "state"
        return sorted(int(d.name) for d in p.iterdir() if d.name.isdigit())

    for s in (1, 2, 3):
        ckpt.save_state(str(tmp_path), tag, state, step=s, export=False,
                        keep=2)
        ckpt.save_meta(str(tmp_path), tag, s, {"epoch": s, "min_loss": 1.0})
    assert steps_on_disk() == [2, 3]
    assert not (tmp_path / tag / "meta_1.json").exists()
    assert (tmp_path / tag / "meta_3.json").exists()

    # async path: prunes to keep-1 before scheduling, so after commit the
    # count is exactly keep again
    ckpt.save_state(str(tmp_path), tag, state, step=4, export=False,
                    async_save=True, keep=2)
    ckpt.wait_for_saves()
    assert steps_on_disk() == [3, 4]

    blank = create_train_state(jax.random.PRNGKey(1), model, tcfg, batch)
    restored = ckpt.restore_state(str(tmp_path), tag, blank)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, restored.params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0


@pytest.mark.slow
def test_pretrain_cli_synthetic(tmp_path):
    """Drive the real CLI main() end-to-end on the CPU mesh."""
    from synergy_tpu.train.pretrain import main

    state = main([
        "--tiny", "true", "--synthetic", "true", "--synthetic_size", "16",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--accum_steps", "1", "--ckpt_dir", str(tmp_path / "ck"),
        "--dtype", "float32",
    ])
    assert int(state.step) >= 1
    assert ckpt.latest_step(str(tmp_path / "ck"), "base_prompt") is not None


@pytest.mark.slow
def test_lr_schedule_counts_optimizer_updates(tiny_setup):
    """A callable learning rate routes through the plain optax path (the
    fused apply has no schedule hook) and counts APPLIED updates: with a
    schedule that is 0 at update 0, the first apply must leave the params
    bit-identical (AdamW update = lr * m_hat/..., wd=0), and a later apply
    at nonzero lr must move them."""
    import optax

    cfg, _, model, batch, _ = tiny_setup
    sched = optax.warmup_cosine_decay_schedule(
        init_value=0.0, peak_value=1e-3, warmup_steps=2, decay_steps=10)
    tcfg = TrainConfig(per_device_batch=1, accum_steps=1, learning_rate=sched)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch)
    assert getattr(state.tx, "fused_apply", None) is None
    step = jax.jit(make_train_step(model, tcfg))
    before = jax.device_get(state.params)
    state, _ = step(state, batch)
    after0 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), before, after0)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0  # lr(0) == 0
    state, _ = step(state, batch)
    after1 = jax.device_get(state.params)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(a - b))), after0, after1)
    assert max(jax.tree_util.tree_leaves(diffs)) > 0.0  # lr(1) == peak/2


@pytest.mark.slow
def test_pretrain_cli_cosine_schedule(tmp_path, capsys):
    """--lr_schedule cosine drives the CLI end-to-end and reports the lr."""
    from synergy_tpu.train.pretrain import main

    state = main([
        "--tiny", "true", "--synthetic", "true", "--synthetic_size", "16",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--accum_steps", "1", "--ckpt_dir", str(tmp_path / "ck"),
        "--dtype", "float32", "--lr_schedule", "cosine",
        "--warmup_steps", "1",
    ])
    assert int(state.step) >= 1
    out = capsys.readouterr().out
    assert "cosine lr: warmup 1 of 2 optimizer updates" in out
    assert " lr=" in out


def test_opt_state_sharding_mirrors_params(tiny_setup):
    """TP mode must shard the Adam moments (and MultiSteps accumulators) with
    the same specs as their params — replicating them multiplies optimizer
    HBM by the TP degree on exactly the config TP exists for."""
    from synergy_tpu.parallel.mesh import opt_state_shardings

    cfg, _, model, batch, _ = tiny_setup
    tcfg = TrainConfig(per_device_batch=1, accum_steps=2, learning_rate=1e-3)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch)
    mesh = create_mesh((4, 2))
    p_sh = param_shardings(mesh, state.params)
    o_sh = opt_state_shardings(mesh, state.opt_state, state.params)
    placed = jax.device_put(state.opt_state, o_sh)

    # collect NamedShardings by path string
    def flat(tree, with_shape=False):
        out = {}
        for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
            key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                           for k in path)
            out[key] = leaf
        return out

    params_spec = {p: s.spec for p, s in flat(p_sh).items()}
    sharded_params = {p for p, s in params_spec.items()
                      if any(ax is not None for ax in s)}
    assert sharded_params, "tiny config must have TP-sharded params"

    moments = 0
    for path, leaf in flat(placed).items():
        if not hasattr(leaf, "sharding"):
            continue
        for p, spec in params_spec.items():
            if path == p or path.endswith("/" + p):
                assert leaf.sharding.spec == spec, (path, leaf.sharding.spec)
                if p in sharded_params:
                    moments += 1
                break
        else:
            # non-param leaf (counter / schedule state): replicated
            assert all(ax is None for ax in leaf.sharding.spec), path
    # mu + nu + MultiSteps acc for each sharded param = 3 hits minimum
    assert moments >= 3 * len(sharded_params), (moments, len(sharded_params))


@pytest.mark.slow
@pytest.mark.parity
def test_large_tp_step_on_virtual_mesh():
    """BASELINE config #5's future: ONE Large-config (ViT-L/14 + RoBERTa-large
    + AST) scan_layers train step on the 8-device CPU mesh with model=2,
    proving the TP path compiles AND executes at real dims — opt-state
    shardings mirror param shardings and the loss is finite. Heaviest test in
    the suite (Large fwd+bwd on one CPU core); opt-in via -m parity."""
    from synergy_tpu.parallel.mesh import opt_state_shardings, shard_batch

    cfg = CLIPConfig.large()
    tcfg = TrainConfig(per_device_batch=1, accum_steps=1, learning_rate=1e-4)
    model = TriCLIP(cfg, scan_layers=True)
    rng = np.random.default_rng(0)
    batch = _tiny_batch(cfg, batch=8, seq=32, rng=rng)
    state = create_train_state(jax.random.PRNGKey(0), model, tcfg, batch)

    mesh = create_mesh((4, 2))
    p_sh = param_shardings(mesh, state.params)
    o_sh = opt_state_shardings(mesh, state.opt_state, state.params)

    # opt-state shardings mirror their param's spec (replicating Adam moments
    # would multiply optimizer HBM by the TP degree exactly on Large)
    p_specs = {}
    for path, s in jax.tree_util.tree_leaves_with_path(p_sh):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        p_specs[key] = s.spec
    sharded = {p for p, s in p_specs.items()
               if any(ax is not None for ax in s)}
    assert sharded, "Large + model=2 must shard params over the model axis"
    mirrored = 0
    for path, s in jax.tree_util.tree_leaves_with_path(o_sh):
        key = "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                       for k in path)
        for p, spec in p_specs.items():
            if key == p or key.endswith("/" + p):
                assert s.spec == spec, (key, s.spec, spec)
                if p in sharded:
                    mirrored += 1
                break
    assert mirrored >= 2 * len(sharded)  # mu + nu at minimum

    state = state.replace(params=jax.device_put(state.params, p_sh),
                          opt_state=jax.device_put(state.opt_state, o_sh))
    with mesh:
        step = jax.jit(make_train_step(model, tcfg), donate_argnums=(0,))
        new_state, metrics = step(state, shard_batch(mesh, batch))
        loss = float(metrics["loss"])
    assert np.isfinite(loss), loss
    assert int(new_state.step) == 1


def test_prune_pins_best_step(tmp_path, tiny_setup):
    """--export_mode final defers the tower export to end of training, so the
    best-val Orbax step must survive interleaved periodic pruning."""
    cfg, tcfg, model, batch, state = tiny_setup
    tag = ckpt.size_tag(True, False)
    for s in (1, 2, 3, 4):
        ckpt.save_state(str(tmp_path), tag, state, step=s, export=False,
                        keep=2, pin_step=1)
    p = tmp_path / tag / "state"
    steps = sorted(int(d.name) for d in p.iterdir() if d.name.isdigit())
    assert steps == [1, 3, 4]  # newest 2 plus the pinned best step

    # export_from_step materializes the C12 contract from the pinned step
    ckpt.export_from_step(str(tmp_path), tag, state, step=1)
    export = tmp_path / tag / "export"
    for m in ("vision", "text", "audio"):
        assert (export / m / "tower.msgpack").exists()
    assert (export / "logit_scales.msgpack").exists()


@pytest.mark.slow
def test_pretrain_cli_export_mode_final(tmp_path):
    """--export_mode final writes the per-modality export exactly once, at
    the end of training, from the best-val step."""
    import os

    from synergy_tpu.train.pretrain import main

    main([
        "--tiny", "true", "--synthetic", "true", "--synthetic_size", "16",
        "--epochs", "2", "--steps_per_epoch", "2", "--batch_size", "8",
        "--accum_steps", "1", "--ckpt_dir", str(tmp_path / "ck"),
        "--dtype", "float32", "--export_mode", "final",
        "--keep_checkpoints", "1",
    ])
    export = tmp_path / "ck" / "base_prompt" / "export"
    for m in ("vision", "text", "audio"):
        assert (export / m / "tower.msgpack").exists(), m
        assert (export / m / "projection_head.msgpack").exists(), m

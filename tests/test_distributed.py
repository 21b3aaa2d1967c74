"""True multi-process distributed tests.

The unit suite simulates multi-chip with 8 virtual devices in ONE process;
these tests exercise the actual multi-process path the reference reaches via
NCCL rendezvous (reference main_pretraining.py:61-67, 285): two OS processes,
each owning 2 virtual CPU devices, joined by ``jax.distributed.initialize``
through ``parallel.distributed.maybe_initialize_distributed``. Collectives
then cross a real process boundary, and ``mesh.shard_batch`` must assemble
per-process local batches into one global array (DistributedSampler
semantics).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, {repo!r})

import functools
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from synergy_tpu.parallel.distributed import maybe_initialize_distributed, is_primary
from synergy_tpu.parallel.mesh import batch_sharding, create_mesh, shard_batch

assert maybe_initialize_distributed(), "init did not engage"
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4 and jax.local_device_count() == 2
pid = jax.process_index()
assert is_primary() == (pid == 0)

mesh = create_mesh((-1, 1))

# 1) cross-process collective: global sum over a process-sharded array
local = np.arange(6, dtype=np.float32).reshape(2, 3) + 10 * pid
garr = jax.make_array_from_process_local_data(batch_sharding(mesh), local, (4, 3))

@functools.partial(jax.jit, out_shardings=NamedSharding(mesh, P()))
def global_sum(x):
    return jnp.sum(x, axis=0)

np.testing.assert_allclose(np.asarray(global_sum(garr)),
                           np.arange(6).reshape(2, 3).sum(0) * 2.0 + 20)

# 2) one tiny TriCLIP train step over the 2-process mesh via shard_batch
from synergy_tpu.configs import CLIPConfig, TrainConfig
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.train.state import create_train_state, make_train_step

cfg = CLIPConfig.tiny()
tcfg = TrainConfig(per_device_batch=2, accum_steps=1, learning_rate=1e-3)
rng = np.random.default_rng(0)
gb = {{
    "pixel_values": rng.standard_normal(
        (8, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32),
    "input_ids": rng.integers(4, cfg.text.vocab_size, (8, 8)).astype(np.int32),
    "attention_mask": np.ones((8, 8), np.int32),
    "input_values": rng.standard_normal(
        (8, cfg.audio.max_length, cfg.audio.num_mel_bins)).astype(np.float32),
}}
model = TriCLIP(cfg)
state = create_train_state(
    jax.random.PRNGKey(0), model, tcfg,
    {{k: jnp.asarray(v) for k, v in gb.items()}})
local_batch = {{k: v[pid * 4:(pid + 1) * 4] for k, v in gb.items()}}
with mesh:
    sharded = shard_batch(mesh, local_batch)
    assert all(v.shape[0] == 8 for v in sharded.values())  # global view
    step = jax.jit(make_train_step(model, tcfg))
    new_state, metrics = step(state, sharded)
print("LOSS", float(metrics["loss"]), flush=True)

# 3) eval pass over the sharded test-loader pattern (each process feeds its
# batch/n_proc slice; pretrain.py's final test loop uses exactly this shape)
from synergy_tpu.train.state import make_eval_step
with mesh:
    ev = jax.jit(make_eval_step(model, tcfg))
    eval_metrics = ev(new_state.params, sharded)
print("EVAL", float(eval_metrics["loss"]), flush=True)

# 4) checkpoint from ALL processes: Orbax multihost save is a collective;
# process 0 additionally writes the per-tower export
from synergy_tpu.train import checkpoint as ckpt
with mesh:
    ckpt.save_state({ckpt_dir!r}, "base_prompt", new_state)
print("SAVED", flush=True)

# 5) FSDP across the process boundary: the 'data' axis spans both
# processes, so the ZeRO all-gathers + grad reduce-scatters are real
# cross-process collectives. Each process owns only its local param
# shards (placed via make_array_from_callback from the identical
# deterministic init); the step loss must match the replicated step 2.
from synergy_tpu.parallel.mesh import opt_state_shardings, param_shardings

def put_tree(tree, shardings):
    def put(x, sh):
        x = np.asarray(jax.device_get(x))
        return jax.make_array_from_callback(
            x.shape, sh, lambda idx: x[idx])
    return jax.tree_util.tree_map(put, tree, shardings)

fs_kw = dict(fsdp=True, fsdp_min_size=128)
state_f = create_train_state(
    jax.random.PRNGKey(0), model, tcfg,
    {{k: jnp.asarray(v) for k, v in gb.items()}})
with mesh:
    state_f = state_f.replace(
        params=put_tree(state_f.params,
                        param_shardings(mesh, state_f.params, **fs_kw)),
        opt_state=put_tree(
            state_f.opt_state,
            opt_state_shardings(mesh, state_f.opt_state, state_f.params,
                                **fs_kw)))
    local_bytes = sum(
        s.data.nbytes
        for leaf in jax.tree_util.tree_leaves(state_f.params)
        if hasattr(leaf, "addressable_shards")
        for s in leaf.addressable_shards)
    full_bytes = 2 * sum(  # 2 local devices, replicated = full per device
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(state_f.params)
        if hasattr(leaf, "nbytes"))
    assert local_bytes < full_bytes, (local_bytes, full_bytes)
    new_f, mf = jax.jit(make_train_step(model, tcfg))(state_f, sharded)
print("FSDPLOSS", float(mf["loss"]), flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_collectives_and_train_step(tmp_path):
    worker = tmp_path / "worker.py"
    ckpt_dir = str(tmp_path / "ck")
    worker.write_text(_WORKER.format(repo=REPO, ckpt_dir=ckpt_dir))
    port = _free_port()
    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   COORDINATOR_ADDRESS=f"localhost:{port}",
                   NUM_PROCESSES="2", PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, str(worker)], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out}"

    losses = [float(next(l for l in out.splitlines() if l.startswith("LOSS"))
                    .split()[1]) for out in outs]
    # both processes observe the same replicated global loss
    assert abs(losses[0] - losses[1]) < 1e-6
    evals = [float(next(l for l in out.splitlines() if l.startswith("EVAL"))
                   .split()[1]) for out in outs]
    assert abs(evals[0] - evals[1]) < 1e-6
    assert all("SAVED" in out for out in outs)
    # FSDP step over the cross-process 'data' axis reproduces the
    # replicated-DP loss (same params, same batch)
    fsdp_losses = [float(next(l for l in out.splitlines()
                              if l.startswith("FSDPLOSS")).split()[1])
                   for out in outs]
    assert abs(fsdp_losses[0] - fsdp_losses[1]) < 1e-6
    assert abs(fsdp_losses[0] - losses[0]) < 1e-4

    # and it matches a single-process run over the same global batch (the
    # pytest process has 8 virtual devices; use 4 to mirror the mesh)
    import jax
    import jax.numpy as jnp
    from synergy_tpu.configs import CLIPConfig, TrainConfig
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.parallel.mesh import create_mesh, shard_batch
    from synergy_tpu.train.state import create_train_state, make_train_step

    cfg = CLIPConfig.tiny()
    tcfg = TrainConfig(per_device_batch=2, accum_steps=1, learning_rate=1e-3)
    rng = np.random.default_rng(0)
    gb = {
        "pixel_values": rng.standard_normal(
            (8, 3, cfg.vision.image_size, cfg.vision.image_size)).astype(np.float32),
        "input_ids": rng.integers(4, cfg.text.vocab_size, (8, 8)).astype(np.int32),
        "attention_mask": np.ones((8, 8), np.int32),
        "input_values": rng.standard_normal(
            (8, cfg.audio.max_length, cfg.audio.num_mel_bins)).astype(np.float32),
    }
    model = TriCLIP(cfg)
    state = create_train_state(
        jax.random.PRNGKey(0), model, tcfg,
        {k: jnp.asarray(v) for k, v in gb.items()})
    mesh = create_mesh((4, 1), devices=jax.devices()[:4])
    from synergy_tpu.train.state import make_eval_step

    with mesh:
        sp_state, metrics = jax.jit(make_train_step(model, tcfg))(
            state, shard_batch(mesh, gb))
        sp_eval = jax.jit(make_eval_step(model, tcfg))(
            sp_state.params, shard_batch(mesh, gb))
    assert abs(losses[0] - float(metrics["loss"])) < 1e-4
    # the 2-process post-step eval loss matches the single-process run
    assert abs(evals[0] - float(sp_eval["loss"])) < 1e-4

    # the collective save produced a loadable export + Orbax state (written
    # once, by process 0)
    from synergy_tpu.train import checkpoint as ckpt

    ckpt_dir = str(tmp_path / "ck")
    tri_params = ckpt.load_tri_clip_params(ckpt_dir, "base_prompt")
    assert "vision" in tri_params and "logit_scale_IT" in tri_params
    assert ckpt.latest_step(ckpt_dir, "base_prompt") is not None
    # Orbax state and the msgpack export are two independent save paths of
    # the SAME worker state — they must agree bitwise. (Do NOT compare
    # against the parent's own single-process step: first-step Adam updates
    # are ~lr*sign(g), so cross-partitioning reduction-order noise on
    # near-zero gradients legitimately flips elements by 2*lr.)
    restored = ckpt.restore_state(ckpt_dir, "base_prompt", sp_state)
    diffs = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a, np.float32)
                                         - np.asarray(b, np.float32)))),
        {k: jax.device_get(restored.params[k]) for k in tri_params},
        tri_params)
    assert max(jax.tree_util.tree_leaves(diffs)) == 0.0

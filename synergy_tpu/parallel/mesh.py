"""Device mesh + sharding rules (the reference's L5 distributed runtime,
re-designed for TPU).

The reference's parallelism is single-node DDP over NCCL with implicit
gradient all-reduce (reference main_pretraining.py:61-67,124-138,285). Here:

  * a ``jax.sharding.Mesh`` over all chips with axes ('data', 'model');
  * the batch is sharded on 'data' — under jit/GSPMD the gradient psum and
    the InfoNCE all-gather ride ICI automatically;
  * optional tensor parallelism on 'model': attention/MLP kernels are sharded
    head-/column-wise via path-based partition rules (useful for the Large
    config; 'model'=1 degenerates to pure DP and matches the reference's
    strategy inventory, SURVEY §2.3);
  * optional FSDP (ZeRO-3 style): params + Adam moments additionally sharded
    over 'data' on their largest free axis — GSPMD all-gathers params at use
    and reduce-scatters grads, so per-chip state HBM drops by the DP degree
    (the lever that lets the Large config train on small-HBM chips).
"""

from __future__ import annotations

import re
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(shape: Sequence[int] = (-1, 1),
                axes: Sequence[str] = ("data", "model"),
                devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    shape = list(shape)
    if -1 in shape:
        known = int(np.prod([s for s in shape if s != -1]))
        shape[shape.index(-1)] = n // known
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, tuple(axes))


# (path regex, PartitionSpec) — first match wins; default = replicated.
# Kernels are (in, out): column-parallel out for q/k/v/fc1, row-parallel in
# for out/fc2 (Megatron-style pairing keeps activations local between them).
_TP_RULES: Tuple[Tuple[str, P], ...] = (
    (r".*attn/(query|key|value)/kernel$", P(None, "model")),
    (r".*attn/(query|key|value)/bias$", P("model")),
    (r".*attn/out/kernel$", P("model", None)),
    (r".*mlp/fc1/kernel$", P(None, "model")),
    (r".*mlp/fc1/bias$", P("model")),
    (r".*mlp/fc2/kernel$", P("model", None)),
    (r".*word_embeddings/embedding$", P(None, None)),
    (r".*_projection/kernel$", P(None, "model")),
)


def _path_str(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in path)


# Leaves below this element count stay replicated under FSDP: gathering a
# LayerNorm scale or a bias per step costs more latency than its bytes.
_FSDP_MIN_SIZE = 2 ** 15


def _augment_fsdp(spec: P, shape, data_size: int,
                  min_size: int = _FSDP_MIN_SIZE) -> P:
    """Shard the largest still-replicated, divisible axis over 'data'.

    'Largest axis' naturally avoids scan-stacked layer axes (a 12-long
    leading axis never beats a 768/3072 feature axis) and skips axes whose
    dim is not divisible by the DP degree (e.g. the 50265 vocab rows — the
    768 embedding columns shard instead)."""
    if int(np.prod(shape)) < min_size:
        return spec
    full = list(spec) + [None] * (len(shape) - len(spec))
    free = [i for i, ax in enumerate(full)
            if ax is None and shape[i] % data_size == 0]
    if not free:
        return spec
    full[max(free, key=lambda i: shape[i])] = "data"
    return P(*full)


def param_partition_specs(params, tensor_parallel: bool = True,
                          fsdp_size: int = 0,
                          fsdp_min_size: int = _FSDP_MIN_SIZE):
    """PartitionSpec pytree for a param tree. TP rules first (replicated
    unless a rule hits); with ``fsdp_size`` > 1 every large leaf is then
    additionally sharded over 'data' (ZeRO-3: GSPMD inserts the per-use
    all-gather and the grad reduce-scatter automatically)."""

    def spec_for(path, leaf):
        spec = P()
        if tensor_parallel:
            s = _path_str(path)
            for pattern, rule in _TP_RULES:
                if re.match(pattern, s):
                    if leaf.ndim == len(rule) + 1:
                        # scan-stacked layer params carry a leading layer axis
                        spec = P(None, *rule)
                    elif len(rule) <= leaf.ndim:
                        spec = rule
                    break
        if fsdp_size > 1 and hasattr(leaf, "shape"):
            spec = _augment_fsdp(spec, leaf.shape, fsdp_size, fsdp_min_size)
        return spec

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(mesh: Mesh, params, tensor_parallel: Optional[bool] = None,
                    fsdp: bool = False, fsdp_min_size: int = _FSDP_MIN_SIZE):
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get("model", 1) > 1
    specs = param_partition_specs(
        params, tensor_parallel,
        fsdp_size=mesh.shape.get("data", 1) if fsdp else 0,
        fsdp_min_size=fsdp_min_size)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def opt_state_shardings(mesh: Mesh, opt_state, params,
                        tensor_parallel: Optional[bool] = None,
                        fsdp: bool = False,
                        fsdp_min_size: int = _FSDP_MIN_SIZE):
    """Sharding pytree for an optimizer state: leaves that mirror a param
    (Adam m/v moments, MultiSteps grad accumulators — identified by param
    path suffix + identical shape) take that param's PartitionSpec; scalars
    and counters are replicated. Without this, TP mode replicates the Adam
    moments (2x params) on every model-axis device, defeating the memory
    point of sharding the params (and FSDP mode would replicate ZeRO's main
    target — the moments are 2/3 of the f32 state)."""
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get("model", 1) > 1
    specs = param_partition_specs(
        params, tensor_parallel,
        fsdp_size=mesh.shape.get("data", 1) if fsdp else 0,
        fsdp_min_size=fsdp_min_size)
    by_path = {}
    for (path, leaf), (_, spec) in zip(
            jax.tree_util.tree_leaves_with_path(params),
            jax.tree_util.tree_leaves_with_path(specs)):
        by_path[_path_str(path)] = (spec, getattr(leaf, "shape", None))

    def spec_for(path, leaf):
        s = _path_str(path)
        shape = getattr(leaf, "shape", None)
        for p_path, (spec, p_shape) in by_path.items():
            if shape == p_shape and (s == p_path or s.endswith("/" + p_path)):
                return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(
        spec_for, opt_state, is_leaf=lambda x: hasattr(x, "shape"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis sharding over 'data' for every batch leaf."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch onto the mesh, sharded over 'data'.

    Single-process: a plain ``device_put``. Multi-process (a pod, or the
    2-process CPU harness in tests/test_distributed.py): each process holds
    only its LOCAL slice of the global batch — the reference's
    DistributedSampler semantics (reference main_pretraining.py:124-128) —
    and the slices are assembled into one global jax.Array whose data axis
    spans every process's devices."""
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        def put(x):
            global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
            return jax.make_array_from_process_local_data(
                sharding, np.asarray(x), global_shape)

        return jax.tree_util.tree_map(put, batch)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)

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
    strategy inventory, SURVEY §2.3).
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


def param_partition_specs(params, tensor_parallel: bool = True):
    """PartitionSpec pytree for a param tree; replicated unless a TP rule hits."""

    def spec_for(path, leaf):
        if not tensor_parallel:
            return P()
        s = _path_str(path)
        for pattern, spec in _TP_RULES:
            if re.match(pattern, s):
                if leaf.ndim == len(spec) + 1:
                    # scan-stacked layer params carry a leading layer axis
                    return P(None, *spec)
                if len(spec) <= leaf.ndim:
                    return spec
                return P()
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def param_shardings(mesh: Mesh, params, tensor_parallel: Optional[bool] = None):
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get("model", 1) > 1
    specs = param_partition_specs(params, tensor_parallel)
    return jax.tree_util.tree_map(lambda s: NamedSharding(mesh, s), specs)


def opt_state_shardings(mesh: Mesh, opt_state, params,
                        tensor_parallel: Optional[bool] = None):
    """Sharding pytree for an optimizer state: leaves that mirror a param
    (Adam m/v moments, MultiSteps grad accumulators — identified by param
    path suffix + identical shape) take that param's PartitionSpec; scalars
    and counters are replicated. Without this, TP mode replicates the Adam
    moments (2x params) on every model-axis device, defeating the memory
    point of sharding the params."""
    if tensor_parallel is None:
        tensor_parallel = mesh.shape.get("model", 1) > 1
    specs = param_partition_specs(params, tensor_parallel)
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

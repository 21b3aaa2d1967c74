"""Checkpointing: Orbax full train state + the per-modality export contract.

The reference's C12 contract (reference main_pretraining.py:31-59): on best
validation loss, rank 0 writes (a) one monolithic checkpoint
``CLIP_model_{size}_{captiontype}.tar`` and (b) a per-modality export — each
tower saved standalone next to its ``projection_head`` — which every
downstream FT/ZS script loads (reference DT/FT_image_task.py:115-120,
DT/FT_audio_task.py:133-138, DT/FT_text_task.py:645-651). We reproduce both:

  synergy_ckpt/{tag}/state/      Orbax: full TrainState (resume-capable —
                                 an upgrade over the reference's save-only)
  synergy_ckpt/{tag}/export/vision/{tower.msgpack, projection_head.msgpack}
  synergy_ckpt/{tag}/export/text/...   export/audio/...
  synergy_ckpt/{tag}/export/logit_scales.msgpack
"""

from __future__ import annotations

import atexit
import os
from typing import Any, Dict, Optional

import jax
import numpy as np
from flax import serialization


def size_tag(is_base: bool, is_captioned: bool) -> str:
    """Mirrors the reference's '{size}_{captiontype}' naming
    (main_pretraining.py:36-41)."""
    size = "base" if is_base else "large"
    des = "caption" if is_captioned else "prompt"
    return f"{size}_{des}"


def _write(path: str, tree: Any):
    # temp file + os.replace: a crash mid-write (the async export runs on a
    # daemon thread) can never leave a truncated msgpack at the final path
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tree = jax.tree_util.tree_map(np.asarray, tree)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(tree))
    os.replace(tmp, path)


def _read(path: str, target: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def export_towers(ckpt_dir: str, tag: str, params: Dict[str, Any]):
    """Per-modality export (the C12 contract)."""
    base = os.path.join(ckpt_dir, tag, "export")
    for modality in ("vision", "text", "audio"):
        _write(os.path.join(base, modality, "tower.msgpack"), params[modality])
        _write(os.path.join(base, modality, "projection_head.msgpack"),
               params[f"{modality}_projection"])
    _write(os.path.join(base, "logit_scales.msgpack"), {
        "IT": params["logit_scale_IT"],
        "TA": params["logit_scale_TA"],
        "AI": params["logit_scale_AI"],
    })


def load_tower(ckpt_dir: str, tag: str, modality: str):
    base = os.path.join(ckpt_dir, tag, "export", modality)
    tower = _read(os.path.join(base, "tower.msgpack"))
    head = _read(os.path.join(base, "projection_head.msgpack"))
    return tower, head


def load_logit_scales(ckpt_dir: str, tag: str) -> Dict[str, np.ndarray]:
    return _read(os.path.join(ckpt_dir, tag, "export", "logit_scales.msgpack"))


_async_ckptr = None
_async_export_thread = None


def _host_params(params):
    """Bring params to host for the msgpack export. Multi-process: a leaf may
    be sharded across processes (model-axis TP, or GSPMD choosing a sharded
    layout for a train-step output), making it non-fully-addressable; those
    trees are resharded to fully-replicated with a jitted identity on their
    own mesh — a collective, so ALL processes must call this together.
    DP-replicated trees pass through at device_get cost only."""
    try:
        return jax.device_get(params)
    except (RuntimeError, ValueError):
        pass
    from jax.sharding import NamedSharding, PartitionSpec

    mesh = next(leaf.sharding.mesh
                for leaf in jax.tree_util.tree_leaves(params)
                if hasattr(leaf, "sharding") and not leaf.is_fully_addressable)
    replicate = jax.jit(lambda t: t,
                        out_shardings=NamedSharding(mesh, PartitionSpec()))
    return jax.device_get(replicate(params))


def save_meta(ckpt_dir: str, tag: str, step: int, meta: Dict[str, Any]):
    """Loop-position sidecar (epoch, best val loss, rng key) for exact resume.

    Lives next to — not inside — the Orbax step directory so Orbax item
    discovery never sees it. Written atomically (temp + os.replace)."""
    import json

    path = os.path.join(ckpt_dir, tag, f"meta_{int(step)}.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as f:
        json.dump(meta, f)
    os.replace(tmp, path)


def load_meta(ckpt_dir: str, tag: str, step: int) -> Optional[Dict[str, Any]]:
    import json

    path = os.path.join(ckpt_dir, tag, f"meta_{int(step)}.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def _prune_old_steps(ckpt_dir: str, tag: str, keep: int,
                     pin: Optional[int] = None):
    """Delete all but the newest ``keep`` step checkpoints (and their meta
    sidecars). Resume uses the LATEST step and the best-validation towers
    live in the per-modality export files, so pruning old steps never loses
    either contract — without it a long run with --checkpoint_every
    accumulates ~3.6 GB of f32 state per save at Base scale.

    ``pin`` exempts one step from pruning — the deferred-export mode
    (pretrain --export_mode final) materializes the tower export from the
    best-validation step at the END of training, so that step must survive
    any interleaved periodic saves."""
    import shutil

    path = os.path.join(ckpt_dir, tag, "state")
    if not os.path.isdir(path):
        return
    steps = sorted(int(d) for d in os.listdir(path) if d.isdigit())
    # keep <= 0 deletes every committed step (the async path prunes to
    # keep-1 BEFORE scheduling its new save, so keep=1 arrives here as 0)
    for s in steps[:-keep] if keep > 0 else steps:
        if pin is not None and s == pin:
            continue
        shutil.rmtree(os.path.join(path, str(s)), ignore_errors=True)
        meta = os.path.join(ckpt_dir, tag, f"meta_{s}.json")
        if os.path.exists(meta):
            os.remove(meta)


def save_state(ckpt_dir: str, tag: str, state, step: Optional[int] = None,
               async_save: bool = False, export: bool = True,
               keep: Optional[int] = None, pin_step: Optional[int] = None):
    """Full train state via Orbax (also exports the towers).

    Multi-process pods: the Orbax save is a collective with cross-process
    barriers — call this from ALL processes (gate only the logging on
    ``is_primary()``); Orbax coordinates per-replica writes and only the
    export files are written by process 0.

    ``async_save=True`` returns as soon as the device->host copy is done:
    the Orbax commit and the per-modality msgpack export proceed in the
    background so the train loop is not stalled by disk I/O (the reference
    blocks training for the full torch.save, main_pretraining.py:222-227).
    Call :func:`wait_for_saves` before process exit / reading the files
    (also registered via atexit as a crash-exit backstop).

    ``export=False`` skips the per-modality export — used by preemption/
    periodic saves so they never overwrite the best-validation towers the
    downstream scripts load (the C12 contract tracks best val loss only).

    ``keep=N`` prunes to the newest N step checkpoints after this save
    commits (process 0 only; None keeps everything).
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(ckpt_dir, tag, "state"))
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    dest = os.path.join(path, str(step if step is not None else int(state.step)))
    if async_save:
        global _async_ckptr, _async_export_thread
        if _async_ckptr is None:
            _async_ckptr = ocp.StandardCheckpointer()
            atexit.register(wait_for_saves)
        wait_for_saves()  # one in-flight save at a time (overwrite safety)
        # prune BEFORE scheduling: every older step is already committed
        # (the wait above), and the new dest is never a prune candidate
        if keep is not None and jax.process_index() == 0:
            _prune_old_steps(ckpt_dir, tag, keep - 1, pin=pin_step)
        _async_ckptr.save(dest, target, force=True)
        if not export:
            return
        host_params = _host_params(state.params)  # sync D2H, async disk

        if jax.process_index() == 0:
            import threading

            _async_export_thread = threading.Thread(
                target=export_towers, args=(ckpt_dir, tag, host_params),
                daemon=True)
            _async_export_thread.start()
        return
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(dest, target, force=True)
    ckptr.wait_until_finished()
    if keep is not None and jax.process_index() == 0:
        _prune_old_steps(ckpt_dir, tag, keep, pin=pin_step)
    if not export:
        return
    host_params = _host_params(state.params)
    if jax.process_index() == 0:
        export_towers(ckpt_dir, tag, host_params)


def export_from_step(ckpt_dir: str, tag: str, state,
                     step: Optional[int] = None) -> int:
    """Materialize the per-modality export (C12 contract) from a committed
    Orbax step instead of live device state — the deferred-export path
    (pretrain --export_mode final). Eager mode pays a synchronous
    device->host copy of the full param tree on EVERY best-val epoch; this
    pays it once, at the end of training, from disk.

    Restores the params subtree ONLY, straight to host numpy: no optimizer
    state is read from disk and no device memory is touched — at the end of
    a Large final-mode run the live state (~9 GB params+moments) is still
    resident, and a second full-TrainState device restore would OOM 16 GB
    HBM. ``state`` may be a TrainState or a bare params tree/template
    (abstract ShapeDtypeStructs work — only the tree structure is used)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir, tag)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}/{tag}")
    path = os.path.abspath(os.path.join(ckpt_dir, tag, "state", str(step)))
    item = {"params": state.params if hasattr(state, "params") else state}
    with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as pc:
        restored = pc.restore(path, args=ocp.args.PyTreeRestore(
            item=item,
            restore_args=jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), item),
            partial_restore=True))
    if jax.process_index() == 0:
        export_towers(ckpt_dir, tag, restored["params"])
    return int(step)


def wait_for_saves():
    """Barrier for outstanding async saves (no-op when none are pending)."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()
    if _async_export_thread is not None and _async_export_thread.is_alive():
        _async_export_thread.join()


def latest_step(ckpt_dir: str, tag: str) -> Optional[int]:
    path = os.path.join(ckpt_dir, tag, "state")
    if not os.path.isdir(path):
        return None
    steps = [int(d) for d in os.listdir(path) if d.isdigit()]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, tag: str, state, step: Optional[int] = None):
    """Resume support (absent in the reference — SURVEY §5 checkpoint/resume)."""
    import orbax.checkpoint as ocp

    if step is None:
        step = latest_step(ckpt_dir, tag)
        if step is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}/{tag}")
    path = os.path.abspath(os.path.join(ckpt_dir, tag, "state", str(step)))
    ckptr = ocp.StandardCheckpointer()
    target = {"params": state.params, "opt_state": state.opt_state,
              "step": state.step}
    try:
        restored = ckptr.restore(path, target)
        # step as a HOST scalar: Orbax restores it committed to one device;
        # under a mesh that clashes with the sharded params in the next
        # jitted step ("incompatible devices") — uncommitted auto-places
        return state.replace(params=restored["params"],
                             opt_state=restored["opt_state"],
                             step=np.asarray(restored["step"]))
    except ValueError:
        # optimizer config changed (e.g. different accum_steps wraps the
        # opt state differently): restore params+step, fresh optimizer
        with ocp.Checkpointer(ocp.PyTreeCheckpointHandler()) as pc:
            restored = pc.restore(
                path, args=ocp.args.PyTreeRestore(
                    item={"params": state.params, "step": state.step},
                    partial_restore=True))
        print("[checkpoint] optimizer state mismatch; restored params only")
        return state.replace(params=restored["params"],
                             step=np.asarray(restored["step"]))


def load_tri_clip_params(ckpt_dir: str, tag: str) -> Dict[str, Any]:
    """Rebuild full TriCLIP params from the per-tower export (how main_MMR
    re-assembles the stage-1 model, reference main_MMR.py:87-109)."""
    params: Dict[str, Any] = {}
    for modality in ("vision", "text", "audio"):
        tower, head = load_tower(ckpt_dir, tag, modality)
        params[modality] = tower
        params[f"{modality}_projection"] = head
    scales = load_logit_scales(ckpt_dir, tag)
    params["logit_scale_IT"] = scales["IT"]
    params["logit_scale_TA"] = scales["TA"]
    params["logit_scale_AI"] = scales["AI"]
    return params

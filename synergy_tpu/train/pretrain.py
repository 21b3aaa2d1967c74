"""Stage-1 tri-modal contrastive pretraining CLI.

TPU-native counterpart of ``python main_pretraining.py`` (reference
main_pretraining.py:265-292), preserving its flags:
  --SEED --WORLD_SIZE --PORT --IS_BASE --IS_CAPTIONED --epochs
  --seq_max_length --learning_rate --alpha --beta --gamma
WORLD_SIZE/PORT are accepted for CLI parity but the process/NCCL model they
configured is replaced wholesale: one process drives a ``jax.sharding.Mesh``
over all local chips; add ``jax.distributed.initialize()`` for multi-host.

Extra flags (ours): --train_csv/--valid_csv/--test_csv, --synthetic,
--ckpt_dir, --vocab_dir, --steps_per_epoch, --local_negatives (reference
rank-local InfoNCE parity mode), --mesh_model (tensor-parallel axis size),
--fsdp (ZeRO-3 state sharding), --resume, --lr_schedule/--warmup_steps
(warmup+cosine; constant is the reference default), --checkpoint_every /
--keep_checkpoints (periodic saves + retention), --tb_dir/--log_file/
--profile_dir (observability).

Preemption safety (``--preempt_save``, default on): SIGTERM — what a TPU VM
maintenance event or a batch scheduler delivers — finishes the in-flight
step, writes a full resume checkpoint (state + epoch/best-val/rng sidecar,
WITHOUT touching the best-validation tower export downstream scripts load)
and exits 0; ``--resume true`` then continues from the interrupted epoch
with the best-val gate intact. The reference has no recovery story at all
(raw mp.spawn, SURVEY §5 failure detection).

Usage:
  python -m synergy_tpu.train.pretrain --IS_BASE true --synthetic true \
      --epochs 1 --steps_per_epoch 4 --batch_size 8
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import signal
import threading
import time
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax

from synergy_tpu.configs import CLIPConfig, TrainConfig
from synergy_tpu.data.pipeline import (
    CSVTriModalDataset, SyntheticTriModalDataset, TriModalLoader, get_tokenizer,
    prefetch,
)
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.parallel.distributed import (
    is_primary, maybe_initialize_distributed,
)
from synergy_tpu.parallel.mesh import (
    create_mesh, opt_state_shardings, param_shardings, shard_batch,
)
from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.train.state import (
    create_train_state, make_eval_step, make_train_step,
)
from synergy_tpu.utils import enable_compilation_cache, set_seed, str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Synergy-TPU stage-1 pretraining")
    # reference flags (main_pretraining.py:265-281)
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--WORLD_SIZE", type=int, default=None,
                   help="accepted for reference parity; mesh uses all devices")
    p.add_argument("--PORT", type=str, default="12355", help="unused on TPU")
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--epochs", type=int, default=32)
    p.add_argument("--seq_max_length", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=5e-6)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    p.add_argument("--lr_schedule", choices=("constant", "cosine"),
                   default="constant",
                   help="'constant' is the reference regime "
                        "(main_pretraining.py:139); 'cosine' adds linear "
                        "warmup over --warmup_steps optimizer updates then "
                        "cosine decay to 0 over the run")
    p.add_argument("--warmup_steps", type=int, default=0,
                   help="linear-warmup optimizer updates (cosine schedule)")
    # ours
    p.add_argument("--train_csv", type=str, default="vgg_sound_train_captioned.csv")
    p.add_argument("--valid_csv", type=str, default="vgg_sound_test_captioned.csv")
    p.add_argument("--test_csv", type=str, default="vgg_sound_test_captioned.csv")
    p.add_argument("--synthetic", type=str2bool, default=False)
    p.add_argument("--synthetic_size", type=int, default=256)
    p.add_argument("--synthetic_class_images", type=str2bool, default=False,
                   help="synthetic triplets draw images/tones from the "
                        "split-invariant per-CLASS tables (the synthetic-vgg "
                        "zero-shot world) instead of per-sample noise")
    p.add_argument("--batch_size", type=int, default=None,
                   help="global batch; default reference per-device x devices")
    p.add_argument("--accum_steps", type=int, default=None)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--local_negatives", type=str2bool, default=False)
    p.add_argument("--mesh_model", type=int, default=1)
    p.add_argument("--fsdp", type=str2bool, default=False,
                   help="ZeRO-3: shard params + Adam moments over the 'data' "
                        "axis (per-chip state HBM / DP degree; GSPMD inserts "
                        "the all-gathers and grad reduce-scatters)")
    p.add_argument("--resume", type=str2bool, default=False)
    p.add_argument("--dtype", type=str, default="bfloat16")
    p.add_argument("--scan_layers", type=str2bool, default=False,
                   help="scan-over-layers towers: several-fold faster "
                        "compiles and lower activation memory for ~20%% "
                        "step-time cost (docs/BENCHMARKS.md)")
    p.add_argument("--tiny", type=str2bool, default=False,
                   help="tiny config (smoke tests)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="write a jax.profiler trace for epoch 0 here "
                        "(view with TensorBoard)")
    p.add_argument("--checkpoint_every", type=int, default=None,
                   help="also checkpoint every N epochs (recovery story; the "
                        "reference only saved on best validation loss)")
    p.add_argument("--wave_wire", choices=("float32", "int16"),
                   default="float32",
                   help="int16 ships the waveform as PCM (half the bytes of "
                        "the batch's biggest buffer; ~3e-5 quantization on "
                        "augmented waves). float32 = reference numerics")
    p.add_argument("--export_mode", choices=("eager", "final"),
                   default="eager",
                   help="eager (reference behavior): write the per-modality "
                        "tower export on every best-val epoch — costs a "
                        "synchronous device->host copy of the full param "
                        "tree each time. final: defer the export to the end "
                        "of training, materialized once from the best-val "
                        "Orbax step (pinned from pruning); on preemption "
                        "the export appears when the resumed run finishes")
    p.add_argument("--keep_checkpoints", type=int, default=None,
                   help="retain only the newest N step checkpoints (each is "
                        "~3.6 GB of f32 state at Base scale); resume uses "
                        "the latest step and the best-val tower export is "
                        "separate, so pruning loses neither. Default: keep "
                        "all")
    p.add_argument("--tb_dir", type=str, default=None,
                   help="write TensorBoard scalar events (per-epoch train/"
                        "val losses + throughput) via the dependency-free "
                        "writer in synergy_tpu.tensorboard")
    p.add_argument("--log_file", type=str, default=None,
                   help="append per-epoch metrics as JSONL here")
    p.add_argument("--preempt_save", type=str2bool, default=True,
                   help="on SIGTERM, finish the in-flight step, write a "
                        "resume checkpoint and exit 0 (TPU-VM maintenance "
                        "events / batch schedulers); --resume continues")
    return p.parse_args(argv)


def build_datasets(args):
    if args.synthetic or not os.path.exists(args.train_csv):
        if not args.synthetic:
            print(f"[pretrain] {args.train_csv} not found -> synthetic data")
        train = SyntheticTriModalDataset(args.synthetic_size, args.IS_CAPTIONED,
                                         seed=args.SEED,
                                         class_images=args.synthetic_class_images)
        valid = SyntheticTriModalDataset(max(32, args.synthetic_size // 8),
                                         args.IS_CAPTIONED, seed=args.SEED + 1,
                                         class_images=args.synthetic_class_images)
    else:
        train = CSVTriModalDataset(args.train_csv, args.IS_CAPTIONED,
                                   augment_audio=True, seed=args.SEED)
        valid = CSVTriModalDataset(args.valid_csv, args.IS_CAPTIONED,
                                   augment_audio=False, seed=args.SEED + 1)
    return train, valid


def main(argv=None):
    args = parse_args(argv)
    # distributed init MUST precede anything that initializes the XLA
    # backend (set_seed builds a PRNGKey; jax.distributed.initialize raises
    # after any backend touch) — caught by test_preempt.py's 2-process case
    maybe_initialize_distributed()
    enable_compilation_cache()
    key = set_seed(args.SEED)

    n_dev = jax.device_count()
    if args.WORLD_SIZE is not None and args.WORLD_SIZE != n_dev:
        # reference semantics: --WORLD_SIZE = number of data-parallel workers
        # (main_pretraining.py:285). On TPU the mesh spans every visible chip,
        # so a mismatch usually means the user expected a different slice.
        print(f"[pretrain] note: --WORLD_SIZE {args.WORLD_SIZE} != "
              f"{n_dev} visible devices; the mesh uses all {n_dev} "
              "(WORLD_SIZE is informational on TPU)")
    clip_cfg = (CLIPConfig.tiny() if args.tiny
                else (CLIPConfig.base() if args.IS_BASE else CLIPConfig.large()))
    per_dev = 35 if args.IS_BASE else 14  # main_pretraining.py:79
    accum = args.accum_steps or (4 if args.IS_BASE else 8)
    batch = args.batch_size or per_dev * n_dev
    batch = max(n_dev, (batch // n_dev) * n_dev)
    train_cfg = TrainConfig(
        seed=args.SEED, epochs=args.epochs, per_device_batch=batch // n_dev,
        accum_steps=accum, seq_max_length=args.seq_max_length,
        learning_rate=args.learning_rate, alpha=args.alpha, beta=args.beta,
        gamma=args.gamma, is_base=args.IS_BASE, is_captioned=args.IS_CAPTIONED,
        global_negatives=not args.local_negatives)

    mesh = create_mesh((-1, args.mesh_model))
    dp = mesh.shape["data"]
    print(f"[pretrain] devices={n_dev} mesh=data:{dp} x model:{mesh.shape['model']} "
          f"global_batch={batch} accum={accum} negatives="
          f"{'local(x' + str(dp) + ')' if args.local_negatives else 'global'}")

    tokenizer = get_tokenizer(args.vocab_dir)
    train_ds, valid_ds = build_datasets(args)
    # each process loads only its slice of the global batch (multi-process
    # pods; single-process: shard=(0,1) and local batch == global batch)
    n_proc = jax.process_count()
    if batch % n_proc:
        raise ValueError(
            f"global batch {batch} must divide evenly over "
            f"{n_proc} processes (each feeds batch/n_proc rows)")
    shard = (jax.process_index(), n_proc)
    train_loader = TriModalLoader(train_ds, tokenizer, batch // n_proc,
                                  args.seq_max_length, seed=args.SEED,
                                  shard=shard, wave_dtype=args.wave_wire)
    valid_loader = TriModalLoader(valid_ds, tokenizer, batch // n_proc,
                                  args.seq_max_length, shuffle=False,
                                  seed=args.SEED, shard=shard)

    lr_sched = None
    if args.lr_schedule == "cosine":
        # schedule counts OPTIMIZER UPDATES: under MultiSteps the inner
        # transformation (and its schedule) steps once per accum_steps
        # microbatches, so decay spans the applied-update horizon
        steps_per_epoch = len(train_loader)
        if args.steps_per_epoch:
            steps_per_epoch = min(steps_per_epoch, args.steps_per_epoch)
        total_applies = max(1, args.epochs * steps_per_epoch // accum)
        warmup = min(args.warmup_steps, max(0, total_applies - 1))
        lr_sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0, peak_value=args.learning_rate,
            warmup_steps=warmup, decay_steps=total_applies, end_value=0.0)
        train_cfg = dataclasses.replace(train_cfg, learning_rate=lr_sched)
        print(f"[pretrain] cosine lr: warmup {warmup} of "
              f"{total_applies} optimizer updates, peak {args.learning_rate}")

    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = TriCLIP(clip_cfg, dtype=dtype, scan_layers=args.scan_layers)
    num_groups = dp if args.local_negatives else 1

    img_sz = clip_cfg.vision.image_size
    sample = {
        "pixel_values": jnp.zeros((batch, 3, img_sz, img_sz)),
        "input_ids": jnp.ones((batch, args.seq_max_length), jnp.int32),
        "attention_mask": jnp.ones((batch, args.seq_max_length), jnp.int32),
        "input_values": jnp.zeros((batch, clip_cfg.audio.max_length,
                                   clip_cfg.audio.num_mel_bins)),
    }
    state = create_train_state(key, model, train_cfg, sample)

    # shard: params per partition rules, opt state mirrors the params (Adam
    # moments follow their param's spec; counters replicated), batch on 'data'
    p_shardings = param_shardings(mesh, state.params, fsdp=args.fsdp)
    state = state.replace(
        params=jax.device_put(state.params, p_shardings),
        opt_state=jax.device_put(
            state.opt_state,
            opt_state_shardings(mesh, state.opt_state, state.params,
                                fsdp=args.fsdp)),
    )

    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    start_epoch = 0
    min_loss = float("inf")
    best_step = None  # Orbax step holding the best-val state (export pin)
    aug_key = jax.random.PRNGKey(args.SEED + 1234)
    resume_step = ckpt.latest_step(args.ckpt_dir, tag) if args.resume else None
    if resume_step is not None:
        state = ckpt.restore_state(args.ckpt_dir, tag, state)
        meta = ckpt.load_meta(args.ckpt_dir, tag, resume_step)
        if meta:  # loop position: epoch to (re)start, best-val gate, rng
            start_epoch = int(meta.get("epoch", 0))
            min_loss = float(meta.get("min_loss", float("inf")))
            if meta.get("best_step") is not None:
                best_step = int(meta["best_step"])
            if "aug_key" in meta:
                aug_key = jnp.asarray(meta["aug_key"], jnp.uint32)
        print(f"[pretrain] resumed from step {int(state.step)} "
              f"(epoch {start_epoch}, best val "
              f"{min_loss if min_loss != float('inf') else 'n/a'})")

    train_step = jax.jit(make_train_step(model, train_cfg, num_groups,
                                         preprocess=True),
                         donate_argnums=(0,))
    eval_step = jax.jit(make_eval_step(model, train_cfg, num_groups,
                                       preprocess=True))
    def put(batch_np: Dict[str, np.ndarray]):
        # single-process: device_put; multi-process pod: assembles each
        # process's local slice into one global array (mesh.shard_batch)
        return shard_batch(mesh, batch_np)

    preempted = threading.Event()
    if args.preempt_save:
        def _on_sigterm(signum, frame):
            print("[pretrain] SIGTERM: finishing in-flight step, writing "
                  "resume checkpoint", flush=True)
            preempted.set()
        try:
            signal.signal(signal.SIGTERM, _on_sigterm)
        except ValueError:  # not the main thread (in-process test harness)
            pass

    def _meta(next_epoch: int) -> dict:
        return {"epoch": int(next_epoch), "min_loss": float(min_loss),
                "best_step": best_step,
                "aug_key": np.asarray(aug_key).tolist()}

    tb = None
    if args.tb_dir and is_primary():
        from synergy_tpu.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tb_dir)

    with mesh:
        for epoch in range(start_epoch, args.epochs):
            train_loader.set_epoch(epoch)
            t0 = time.time()
            metrics_list = []
            profiling = args.profile_dir and epoch == start_epoch
            if profiling:
                jax.profiler.start_trace(args.profile_dir)
            for step_idx, batch_np in enumerate(prefetch(iter(train_loader))):
                if args.steps_per_epoch and step_idx >= args.steps_per_epoch:
                    break
                aug_key, step_key = jax.random.split(aug_key)
                with jax.profiler.StepTraceAnnotation("train", step_num=step_idx):
                    state, metrics = train_step(state, put(batch_np), step_key)
                metrics_list.append(metrics)
                if args.preempt_save and n_proc > 1:
                    # SIGTERM may reach only some processes; agree globally
                    # every step so nobody blocks in the next collective
                    from jax.experimental import multihost_utils

                    if bool(multihost_utils.process_allgather(
                            np.asarray(preempted.is_set())).any()):
                        preempted.set()
                if preempted.is_set():
                    break
            if preempted.is_set():
                if profiling:
                    jax.profiler.stop_trace()
                # full state, no tower export (the export stays the
                # best-validation one); the interrupted epoch restarts on
                # resume — a bounded redo, no loader-position bookkeeping
                ckpt.wait_for_saves()  # don't race an in-flight async save
                ckpt.save_state(args.ckpt_dir, tag, state, export=False)
                ckpt.save_meta(args.ckpt_dir, tag, int(state.step),
                               _meta(next_epoch=epoch))
                print(f"[pretrain] preempted at epoch {epoch + 1} step "
                      f"{int(state.step)}; resume with --resume true")
                if tb is not None:
                    tb.close()
                return state
            if profiling:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), metrics_list[-1])
                jax.profiler.stop_trace()
            if not metrics_list:
                raise RuntimeError(
                    f"empty training epoch: dataset has {len(train_ds)} rows "
                    f"but the global batch is {batch} (drop_last), so no full "
                    f"batch forms — pass --batch_size <= {len(train_ds)}"
                    + (" or raise --synthetic_size" if args.synthetic else ""))
            means = {k: float(np.mean([np.asarray(m[k]) for m in metrics_list]))
                     for k in metrics_list[0]}
            dt = time.time() - t0
            tps = len(metrics_list) * batch / dt
            lr_note = ""
            if lr_sched is not None:
                lr_note = f" lr={float(lr_sched(int(state.step) // accum)):.2e}"
            print(f"[pretrain] epoch {epoch + 1}/{args.epochs} "
                  f"loss={means['loss']:.4f} IT={means['IT']:.4f} "
                  f"TA={means['TA']:.4f} AI={means['AI']:.4f} "
                  f"({dt:.1f}s, {tps:.0f} triplets/s){lr_note}")

            # validation (reference main_pretraining.py:192-227)
            val_metrics = []
            for v_idx, batch_np in enumerate(iter(valid_loader)):
                if args.steps_per_epoch and v_idx >= max(1, args.steps_per_epoch // 4):
                    break
                val_metrics.append(eval_step(state.params, put(batch_np)))
            if val_metrics:
                val_loss = float(np.mean([np.asarray(m["loss"]) for m in val_metrics]))
                print(f"[pretrain]   val_loss={val_loss:.4f}")
                if val_loss < min_loss:
                    # all processes save (Orbax multihost save is a collective
                    # with cross-process barriers; val_loss is a global metric
                    # so the condition agrees on every process); async:
                    # training resumes while Orbax commits + the tower export
                    # writes in the background
                    min_loss = val_loss
                    best_step = int(state.step)
                    # pin the best-val Orbax step from pruning only in
                    # deferred-export mode, where it must survive until the
                    # end-of-training export_from_step; in eager mode the
                    # tower export is written NOW, so --keep_checkpoints
                    # keeps its advertised "newest N" semantics
                    pin = best_step if args.export_mode == "final" else None
                    ckpt.save_state(args.ckpt_dir, tag, state, async_save=True,
                                    export=args.export_mode == "eager",
                                    keep=args.keep_checkpoints,
                                    pin_step=pin)
                    ckpt.save_meta(args.ckpt_dir, tag, int(state.step),
                                   _meta(next_epoch=epoch + 1))
                    if is_primary():
                        print(f"[pretrain]   saved checkpoint -> "
                              f"{args.ckpt_dir}/{tag}")
            if args.checkpoint_every and (epoch + 1) % args.checkpoint_every == 0:
                # full state only (export=False): the per-modality export
                # stays the best-validation one; --resume picks up whichever
                # state step is newest (best-val or periodic)
                ckpt.save_state(
                    args.ckpt_dir, tag, state, async_save=True, export=False,
                    keep=args.keep_checkpoints,
                    pin_step=(best_step if args.export_mode == "final"
                              else None))
                ckpt.save_meta(args.ckpt_dir, tag, int(state.step),
                               _meta(next_epoch=epoch + 1))
            if args.log_file and is_primary():
                import json as _json

                rec = dict(epoch=epoch + 1, **means,
                           triplets_per_sec=round(tps, 2))
                if val_metrics:
                    rec["val_loss"] = val_loss
                with open(args.log_file, "a") as f:
                    f.write(_json.dumps(rec) + "\n")
            if tb is not None:
                for k in ("loss", "IT", "TA", "AI"):
                    tb.add_scalar(f"train/{k}", means[k], epoch + 1)
                tb.add_scalar("perf/triplets_per_sec", tps, epoch + 1)
                if val_metrics:
                    tb.add_scalar("val/loss", val_loss, epoch + 1)
                tb.flush()

        ckpt.wait_for_saves()  # barrier: files complete before downstream use
        if (args.export_mode == "final" and best_step is not None
                and not preempted.is_set()):
            t0 = time.perf_counter()
            ckpt.export_from_step(args.ckpt_dir, tag, state, step=best_step)
            if is_primary():
                print(f"[pretrain] deferred export: towers from best-val "
                      f"step {best_step} ({time.perf_counter() - t0:.1f}s)")

        # final test loop (reference main_pretraining.py:231-260)
        if args.synthetic or not os.path.exists(args.test_csv):
            test_ds = SyntheticTriModalDataset(
                max(32, args.synthetic_size // 8), args.IS_CAPTIONED,
                seed=args.SEED + 2)
        else:
            test_ds = CSVTriModalDataset(args.test_csv, args.IS_CAPTIONED,
                                         augment_audio=False, seed=args.SEED + 2)
        # sharded like train/valid: each process feeds its batch/n_proc slice
        # (an unsharded loader would make shard_batch assemble an n_proc-times
        # duplicated global batch on pods — duplicate rows are false negatives
        # for the contrastive eval)
        test_loader = TriModalLoader(test_ds, tokenizer, batch // n_proc,
                                     args.seq_max_length, shuffle=False,
                                     seed=args.SEED, shard=shard)
        test_metrics = []
        for t_idx, batch_np in enumerate(iter(test_loader)):
            if args.steps_per_epoch and t_idx >= max(1, args.steps_per_epoch // 4):
                break
            test_metrics.append(eval_step(state.params, put(batch_np)))
        if test_metrics:
            test_loss = float(np.mean([np.asarray(m["loss"]) for m in test_metrics]))
            print(f"[pretrain] test_loss={test_loss:.4f}")
            if tb is not None:
                tb.add_scalar("test/loss", test_loss, args.epochs)
    if tb is not None:
        tb.close()
    return state


if __name__ == "__main__":
    main()

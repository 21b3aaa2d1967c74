"""Stage-2 Missing-Modality Reconstruction (MMR) training CLI.

TPU-native counterpart of ``python main_MMR.py`` (reference main_MMR.py),
preserving flags ``--SEED --IS_BASE --IS_CAPTIONED --MM {img,txt,aud} --IDX
--epochs --seq_max_length --learning_rate --alpha --beta --gamma`` and the
reference's training regime: batch 32 (main_MMR.py:52), AdamW lr 1e-3, and —
deliberately — **single fixed-batch overfitting** (the reference hoists
``next(iter(train_loader))`` above the epoch loop, main_MMR.py:122-144, for
its per-category reconstruction demos). ``--single_batch false`` enables a
conventional multi-batch loop: every epoch iterates fresh batches and the
frozen-tower features are recomputed per batch (jitted), still without
gradients through the towers.

TPU-first structural changes:
  * frozen towers run ONCE (features are constant across the overfit loop —
    the reference recomputes them under no_grad every epoch);
  * only wrapper params are optimized (the reference freezes via no_grad);
  * jitted train step; SSIM/MSE/L1/CE losses from losses.py.
Final report: PSNR+SSIM (img/aud) or token accuracy (txt) + 16 deploy renders
(main_MMR.py:176-210).
"""

from __future__ import annotations

import argparse
import os
import random as pyrandom
import time
import jax
import jax.numpy as jnp
import numpy as np
import optax

from synergy_tpu.configs import CLIPConfig, ReconstructionConfig
from synergy_tpu.data.pipeline import (
    CSVTriModalDataset, SyntheticTriModalDataset, TriModalLoader, get_tokenizer,
)
from synergy_tpu.losses import (
    mmr_audio_loss, mmr_image_loss, mmr_text_loss, resize_bicubic,
)
from synergy_tpu.models.mmr import ImgAud2Txt, ImgTxt2Aud, TxtAud2Img
from synergy_tpu.models.tri_clip import TriCLIP
from synergy_tpu.ops.ssim import ssim as ssim_fn
from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.train.deploy import deploy
from synergy_tpu.utils import enable_compilation_cache, psnr as psnr_fn
from synergy_tpu.utils import set_seed, str2bool

CATE_IDX = [[39, 74], [75, 83, 99], [42, 62, 225], [21, 24, 20]]  # main_MMR.py:49


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="STEP 2: MMR training")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=True)
    p.add_argument("--MM", type=str, default="img", choices=["img", "txt", "aud"])
    p.add_argument("--IDX", type=int, default=0)
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--seq_max_length", type=int, default=None,
                   help="tokenization length; defaults to the decoder's "
                        "text_length (reference config.py:138 keeps them equal)")
    p.add_argument("--learning_rate", type=float, default=1e-3)
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--beta", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=1.0)
    # ours
    p.add_argument("--train_csv", type=str, default="vgg_sound_train_captioned.csv")
    p.add_argument("--synthetic", type=str2bool, default=False)
    p.add_argument("--synthetic_class_images", type=str2bool, default=False,
                   help="draw the synthetic batch from the per-CLASS pattern "
                        "world (the one stage-1 synthetic pretraining learns "
                        "to separate) instead of instance-level patterns — "
                        "the regime for testing trained-tower conditioning")
    p.add_argument("--batch_size", type=int, default=32)  # main_MMR.py:52
    p.add_argument("--single_batch", type=str2bool, default=True)
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--vocab_dir", type=str, default=None)
    p.add_argument("--out_dir", type=str, default="inference")
    p.add_argument("--deploy_samples", type=int, default=16)
    p.add_argument("--tiny", type=str2bool, default=False)
    p.add_argument("--tb_dir", type=str, default=None,
                   help="TensorBoard scalar events (loss + MSE/SSIM or acc "
                        "per logged epoch) via synergy_tpu.tensorboard")
    p.add_argument("--dtype", type=str, default="float32")
    return p.parse_args(argv)


def tiny_recon_config() -> ReconstructionConfig:
    clip = CLIPConfig.tiny()
    return ReconstructionConfig(
        clip=clip, projection_dim=clip.projection_dim,
        vision_length=clip.vision.seq_len, text_length=8,
        audio_length=clip.audio.seq_len,
        img_tokens=8, txt_tokens=8, aud_tokens=8,
        encoder_dim=clip.projection_dim, encoder_bottleneck_dim=16,
        img_size=32,
        img_decoder_layer_info=((2, 64, 4, 4), (2, 32, 8, 8), (2, 16, 16, 16)),
        decoder_dim=32, decoder_depth=1, decoder_heads=2,
        aud_size=(32, 8),
        aud_decoder_layer_info=((2, 64, 4, 1), (2, 32, 8, 2), (2, 16, 16, 4)),
    )


def frozen_tower_features(model: TriCLIP, params, batch, mm: str):
    """Run the two present-modality towers once; stop_gradient == the
    reference's torch.no_grad (model.py:650,724,790)."""
    outs = model.apply(
        {"params": params}, batch["pixel_values"], batch["input_ids"],
        batch["attention_mask"], batch["input_values"],
        method=TriCLIP.encode_towers)
    (img_lhs, img_pool), (txt_lhs, txt_pool), (aud_lhs, aud_pool) = outs
    sg = jax.lax.stop_gradient
    if mm == "aud":   # image+text -> audio; pooler features (model.py:669-670)
        return sg(img_pool), sg(txt_pool)
    if mm == "img":   # text+audio -> image; avg-pooled lhs (model.py:737-740)
        return sg(txt_lhs), sg(aud_lhs)
    return sg(img_lhs), sg(aud_lhs)  # img+aud -> text (model.py:803-806)


def build_wrapper(recon_cfg: ReconstructionConfig, mm: str, dtype):
    if mm == "aud":
        return ImgTxt2Aud(recon_cfg, dtype, deterministic=True)
    if mm == "img":
        return TxtAud2Img(recon_cfg, dtype, deterministic=True)
    return ImgAud2Txt(recon_cfg, dtype, deterministic=False)  # BN in train mode


def save_mrl(out_base: str, w_params, w_stats) -> str:
    """Write the MRL wrapper artifact: one msgpack dict holding params AND
    batch_stats — the txt decoder's BatchNorm running stats (models/mmr.py
    BatchNorm) are part of the trained model; a params-only save silently
    reloads them at init (mean 0 / var 1) and corrupts eval-mode recon."""
    import numpy as _np

    from flax import serialization

    os.makedirs(out_base, exist_ok=True)
    path = os.path.join(out_base, "MRL_model.msgpack")
    blob = {"params": w_params, "batch_stats": dict(w_stats)}
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(
            jax.tree_util.tree_map(_np.asarray, blob)))
    return path


def load_mrl(out_base: str, params_template, stats_template):
    """Load an MRL artifact. Accepts the current {params, batch_stats} dict
    and the legacy (round-2) params-only format, where batch_stats fall back
    to the provided template (harmless for img/aud wrappers, which carry no
    BatchNorm)."""
    from flax import serialization

    with open(os.path.join(out_base, "MRL_model.msgpack"), "rb") as f:
        raw = f.read()
    try:
        blob = serialization.from_bytes(
            {"params": params_template, "batch_stats": dict(stats_template)},
            raw)
        return blob["params"], blob["batch_stats"]
    except (ValueError, KeyError):
        return serialization.from_bytes(params_template, raw), stats_template


def make_loader(args, recon_cfg, tokenizer, seq_len: int):
    """Step23-style loader (reference Dataset_Step23 filters VGGSound
    categories by CATE_IDX; synthetic mode reuses its label structure). In
    single-batch mode the dataset holds exactly one batch; in multi-batch
    mode it holds several and drop_last keeps shapes static."""
    if args.synthetic or not os.path.exists(args.train_csv):
        size = args.batch_size if args.single_batch else args.batch_size * 4
        ds = SyntheticTriModalDataset(size, args.IS_CAPTIONED, seed=args.SEED,
                                      class_images=args.synthetic_class_images)
    else:
        cate = CATE_IDX[args.IDX] if os.path.exists("vgg_category.json") else None
        ds = CSVTriModalDataset(args.train_csv, args.IS_CAPTIONED,
                                augment_audio=False, seed=args.SEED,
                                category_idx=cate)
    return TriModalLoader(ds, tokenizer, args.batch_size, seq_len,
                          seed=args.SEED, drop_last=not args.single_batch)


def make_preprocessor(clip_cfg):
    """Jitted host-batch -> model-batch preprocessing (image chain + fbank).
    One compiled program per batch shape: eager dispatch here costs seconds
    per step through a remote-TPU tunnel (op-by-op round trips)."""
    from synergy_tpu.train.state import device_preprocess

    @jax.jit
    def prep(raw):
        return device_preprocess(raw, None, clip_cfg)

    return lambda raw: prep({k: jnp.asarray(v) for k, v in raw.items()})


def main(argv=None):
    args = parse_args(argv)
    enable_compilation_cache()
    key = set_seed(args.SEED)
    model_sz = "base" if args.IS_BASE else "large"
    text_des = "caption" if args.IS_CAPTIONED else "prompt"
    hyper = {"img": args.alpha, "txt": args.beta, "aud": args.gamma}[args.MM]

    recon_cfg = (tiny_recon_config() if args.tiny else
                 (ReconstructionConfig.base() if args.IS_BASE
                  else ReconstructionConfig.large()))
    clip_cfg = recon_cfg.clip
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    tokenizer = get_tokenizer(args.vocab_dir)
    # the text decoder reconstructs exactly text_length tokens
    # (reference config.py:138: text_length == seq_max_length)
    seq_len = args.seq_max_length or recon_cfg.text_length
    if args.MM == "txt" and seq_len != recon_cfg.text_length:
        raise ValueError(
            f"--seq_max_length {seq_len} must equal the text decoder's "
            f"text_length {recon_cfg.text_length} when --MM txt")
    tri = TriCLIP(clip_cfg, dtype=dtype)
    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    loader = make_loader(args, recon_cfg, tokenizer, seq_len)
    if len(loader) == 0:
        why = ("multi-batch mode (--single_batch false) drops partial "
               "batches, so at least one full batch of rows is required"
               if not args.single_batch else "the dataset loaded zero rows")
        raise SystemExit(
            f"[mmr] loader yields zero batches ({len(loader.ds)} rows, "
            f"--batch_size {loader.batch_size}): {why}")
    prep = make_preprocessor(clip_cfg)
    batch = prep(next(iter(loader)))
    try:
        tri_params = ckpt.load_tri_clip_params(args.ckpt_dir, tag)
        print(f"[mmr] loaded stage-1 towers from {args.ckpt_dir}/{tag}")
    except (FileNotFoundError, OSError):
        print("[mmr] WARNING: no stage-1 checkpoint found; random towers")
        tri_params = jax.jit(tri.init)(
            key, batch["pixel_values"], batch["input_ids"],
            batch["attention_mask"], batch["input_values"])["params"]

    feats_fn = jax.jit(lambda p, b: frozen_tower_features(tri, p, b, args.MM))
    feats = feats_fn(tri_params, batch)

    wrapper = build_wrapper(recon_cfg, args.MM, dtype)
    init_rngs = {"params": key, "dropout": jax.random.fold_in(key, 1)}
    variables = jax.jit(wrapper.init)(init_rngs, *feats)
    w_params = variables["params"]
    w_stats = variables.get("batch_stats", {})

    tx = optax.adamw(args.learning_rate)
    opt_state = tx.init(w_params)

    label_key = {"img": "pixel_values", "aud": "input_values",
                 "txt": "input_ids"}[args.MM]
    loss_fn_mm = {
        "img": lambda recon, lab: mmr_image_loss(recon, lab, alpha=0.75),
        "aud": lambda recon, lab: mmr_audio_loss(recon, lab, alpha=0.75),
        "txt": mmr_text_loss,
    }[args.MM]
    label = batch[label_key]

    def step(params, stats, opt_state, feats, label, dropout_key):
        def inner(p):
            out, updates = wrapper.apply(
                {"params": p, "batch_stats": stats}, *feats,
                mutable=["batch_stats"], rngs={"dropout": dropout_key})
            loss, m1, m2 = loss_fn_mm(out, label)
            return loss * hyper, (m1, m2, updates.get("batch_stats", stats))

        (loss, (m1, m2, new_stats)), grads = jax.value_and_grad(
            inner, has_aux=True)(params)
        upd, new_opt = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, upd), new_stats, new_opt, loss, m1, m2

    # donate params/stats/opt-state: halves step memory AND keeps the big
    # output buffers device-resident (measured: non-donated txt steps cost
    # seconds each through a remote-TPU tunnel when metrics are fetched —
    # the ~700 MB of fresh param/opt buffers ride along with the sync)
    step = jax.jit(step, donate_argnums=(0, 1, 2))

    tb = None
    if args.tb_dir:
        from synergy_tpu.tensorboard import SummaryWriter

        tb = SummaryWriter(args.tb_dir)

    def log_epoch(e, loss, m1, m2):
        if (e + 1) % max(1, args.epochs // 10) == 0:
            if args.MM == "txt":
                print(f"[mmr] epoch {e + 1}/{args.epochs} "
                      f"loss={float(loss):.4f} acc={float(m1):.4f}")
            else:
                print(f"[mmr] epoch {e + 1}/{args.epochs} "
                      f"loss={float(loss):.4f} MSE={float(m1):.4f} "
                      f"SSIM={1 - float(m2):.4f}")
            if tb is not None:
                tb.add_scalar(f"mmr_{args.MM}/loss", float(loss), e + 1)
                if args.MM == "txt":
                    tb.add_scalar(f"mmr_{args.MM}/acc", float(m1), e + 1)
                else:
                    tb.add_scalar(f"mmr_{args.MM}/mse", float(m1), e + 1)
                    tb.add_scalar(f"mmr_{args.MM}/ssim", 1 - float(m2), e + 1)
                tb.flush()

    t0 = time.time()
    t_first = None
    n_steps = 0
    for e in range(args.epochs):
        if args.single_batch:
            # reference regime (main_MMR.py:122-144): same batch every epoch,
            # frozen features computed once before the loop
            w_params, w_stats, opt_state, loss, m1, m2 = step(
                w_params, w_stats, opt_state, feats, label,
                jax.random.fold_in(key, 100 + e))
            n_steps += 1
        else:
            # conventional loop: fresh batches, frozen features recomputed
            # per batch (jitted) — the towers still see no gradients
            loader.set_epoch(e)
            for i, raw in enumerate(loader):
                b = prep(raw)
                feats = feats_fn(tri_params, b)
                label = b[label_key]
                w_params, w_stats, opt_state, loss, m1, m2 = step(
                    w_params, w_stats, opt_state, feats, label,
                    jax.random.fold_in(key, 100 + e * 10007 + i))
                n_steps += 1
        if e == 0:
            jax.block_until_ready(loss)
            t_first = time.time() - t0
        log_epoch(e, loss, m1, m2)
    total = time.time() - t0
    steady = (total - t_first) / max(1, n_steps - 1)
    print(f"[mmr] trained {args.epochs} epochs ({n_steps} steps) in {total:.1f}s "
          f"(compile+first epoch {t_first:.1f}s, then {steady * 1e3:.0f} ms/step)")
    if tb is not None:
        tb.close()

    # save wrapper (MRL contract, main_MMR.py:30-37)
    out_base = os.path.join(args.out_dir, f"{model_sz}_{text_des}", args.MM)
    save_mrl(out_base, w_params, w_stats)

    # final inference + metrics + deploy renders (main_MMR.py:176-210)
    infer = build_wrapper(recon_cfg, args.MM, dtype)
    if args.MM == "txt":
        infer = ImgAud2Txt(recon_cfg, dtype, deterministic=True)  # BN eval mode
    recon = infer.apply({"params": w_params, "batch_stats": w_stats}, *feats)
    rng = pyrandom.Random(args.SEED)
    result = {"params": w_params}
    if args.MM == "img":
        lab = resize_bicubic(label, recon.shape[-2:])
        p = float(psnr_fn(recon, lab))
        s = float(ssim_fn(recon, lab, data_range=1.0))
        print(f"psnr_score : {p:.3f} | ssim_score : {s:.4f}")
        result.update(psnr=p, ssim=s, mse=float(jnp.mean((recon - lab) ** 2)),
                      label_var=float(jnp.var(lab)))
    elif args.MM == "aud":
        lab = resize_bicubic(label[:, None], recon.shape[-2:])[:, 0]
        p = float(psnr_fn(recon[:, None], lab[:, None]))
        s = float(ssim_fn(recon[:, None], lab[:, None], data_range=1.0))
        print(f"psnr_score : {p:.3f} | ssim_score : {s:.4f}")
        result.update(psnr=p, ssim=s, mse=float(jnp.mean((recon - lab) ** 2)),
                      label_var=float(jnp.var(lab)))
    else:
        lab = label
        acc = float(jnp.mean((jnp.argmax(recon, -1) == label).astype(jnp.float32)))
        print(f"accuracy : {acc:.4f} | bleu : {0:.4f}")
        result.update(accuracy=acc)
    for _ in range(args.deploy_samples):
        deploy(args.MM, model_sz, text_des, np.asarray(recon), np.asarray(lab),
               tokenizer, idx=rng.randint(0, recon.shape[0] - 1), cate=args.IDX,
               out_root=args.out_dir)
    return result


if __name__ == "__main__":
    main()

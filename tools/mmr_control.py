"""Reference torch-stack control for the MMR single-batch regimes.

Runs the reference's OWN wrapper (``TXT_AUD_2_IMG`` / ``IMG_TXT_2_AUD``,
imported from /root/reference/model.py via tests/reference_shim) on the
IDENTICAL batch and IDENTICAL frozen-tower features our ``train.mmr`` CLI
uses, so the only varying factor between "ours" and "reference" rows in
docs/BENCHMARKS.md is the trainable decoder stack + optimizer — not the
data and not the conditioning.

The frozen towers live in OUR stack (random init seed-matched to train/mmr,
or a trained stage-1 checkpoint via --ckpt_dir); their outputs are exported
once and injected into the reference wrapper through constant dummy encoders
(the wrapper ctor takes encoder instances, reference model.py:611-697, and
only ever reads outputs[0]/outputs[1] under torch.no_grad).

Training regime mirrors main_MMR.py:112-146 (AdamW(lr), one fixed batch,
full-batch step per epoch); the final PSNR/SSIM report mirrors
main_MMR.py:176-210 (reference utils.PSNR + pytorch_msssim.ssim).

Usage (CPU; torch is CPU-only in this image):
  JAX_PLATFORMS=cpu python tools/mmr_control.py --MM aud --epochs 768 \
      --learning_rate 7.5e-4 [--ckpt_dir synergy_ckpt] [--class_images true]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="Reference MMR torch control")
    p.add_argument("--MM", choices=["img", "aud"], default="aud")
    p.add_argument("--SEED", type=int, default=17)
    p.add_argument("--IS_CAPTIONED", default=True)
    p.add_argument("--epochs", type=int, default=768)
    p.add_argument("--learning_rate", type=float, default=7.5e-4)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--ckpt_dir", type=str, default=None,
                   help="stage-1 checkpoint for TRAINED frozen towers; "
                        "omit for random towers (seed-matched to train/mmr)")
    p.add_argument("--class_images", type=str, default="false")
    p.add_argument("--feats_npz", type=str, default=None,
                   help="skip the JAX feature step: load feats/labels from "
                        "an .npz produced by --export_npz")
    p.add_argument("--export_npz", type=str, default=None,
                   help="compute feats/labels, save to .npz, and exit "
                        "(lets the feature step run on the TPU host)")
    return p.parse_args(argv)


def compute_features(args):
    """Ours: batch + frozen features exactly as train/mmr.py builds them."""
    import jax

    from synergy_tpu.configs import ReconstructionConfig
    from synergy_tpu.data.pipeline import get_tokenizer
    from synergy_tpu.models.tri_clip import TriCLIP
    from synergy_tpu.train import checkpoint as ckpt
    from synergy_tpu.train.mmr import (
        frozen_tower_features, make_loader, make_preprocessor,
    )
    from synergy_tpu.utils import set_seed

    key = set_seed(args.SEED)
    recon_cfg = ReconstructionConfig.base()
    clip_cfg = recon_cfg.clip
    tokenizer = get_tokenizer(None)
    loader_args = argparse.Namespace(
        synthetic=True, train_csv="/nonexistent", IS_CAPTIONED=True,
        SEED=args.SEED, batch_size=args.batch_size, single_batch=True,
        IDX=0, synthetic_class_images=args.class_images.lower() == "true")
    loader = make_loader(loader_args, recon_cfg, tokenizer,
                         recon_cfg.text_length)
    prep = make_preprocessor(clip_cfg)
    batch = prep(next(iter(loader)))

    tri = TriCLIP(clip_cfg)
    towers = "random"
    if args.ckpt_dir:
        tri_params = ckpt.load_tri_clip_params(
            args.ckpt_dir, ckpt.size_tag(True, True))
        towers = f"trained:{args.ckpt_dir}"
        print(f"[control] loaded stage-1 towers from {args.ckpt_dir}")
    else:
        tri_params = jax.jit(tri.init)(
            key, batch["pixel_values"], batch["input_ids"],
            batch["attention_mask"], batch["input_values"])["params"]
        print("[control] random frozen towers (seed-matched to train/mmr)")
    f1, f2 = jax.jit(
        lambda p, b: frozen_tower_features(tri, p, b, args.MM))(
        tri_params, batch)
    label_key = {"img": "pixel_values", "aud": "input_values"}[args.MM]
    return (np.asarray(f1, np.float32), np.asarray(f2, np.float32),
            np.asarray(batch[label_key], np.float32), towers)


def main(argv=None):
    args = parse_args(argv)
    if args.feats_npz:
        z = np.load(args.feats_npz, allow_pickle=True)
        f1, f2, label = z["f1"], z["f2"], z["label"]
        towers = str(z["towers"])
    else:
        f1, f2, label, towers = compute_features(args)
        if args.export_npz:
            np.savez(args.export_npz, f1=f1, f2=f2, label=label,
                     towers=towers)
            print(f"[control] features exported to {args.export_npz}")
            return None

    import torch

    from reference_shim import load_reference

    ref_model, ref_config = load_reference()
    torch.manual_seed(args.SEED)
    cfg = ref_config.ReconstructionConfig_BASE

    class DummyEncoder(torch.nn.Module):
        """Constant stand-in returning OUR tower's outputs; the wrapper only
        reads outputs[0] (lhs) / outputs[1] (pooled) under no_grad."""

        def __init__(self, lhs=None, pooled=None):
            super().__init__()
            self.out = (None if lhs is None else torch.from_numpy(lhs),
                        None if pooled is None else torch.from_numpy(pooled))

        def forward(self, *a, **kw):
            return self.out

    b = label.shape[0]
    if args.MM == "img":
        # TXT_AUD_2_IMG consumes avg-pooled LAST HIDDEN STATES
        # (reference model.py:737-740); f1/f2 are txt_lhs / aud_lhs
        model = ref_model.TXT_AUD_2_IMG(
            cfg, DummyEncoder(lhs=f1), DummyEncoder(lhs=f2))
        ids = torch.zeros((b, f1.shape[1]), dtype=torch.long)
        mask = torch.ones_like(ids)
        aud_in = torch.zeros((b, 1024, 128))
        fwd_args = (ids, mask, aud_in)
    else:
        # IMG_TXT_2_AUD consumes POOLER outputs (reference model.py:669-670);
        # f1/f2 are img_pool / txt_pool
        model = ref_model.IMG_TXT_2_AUD(
            cfg, DummyEncoder(pooled=f1), DummyEncoder(pooled=f2))
        img_in = torch.zeros((b, 3, 224, 224))
        ids = torch.zeros((b, 32), dtype=torch.long)
        mask = torch.ones_like(ids)
        fwd_args = (img_in, ids, mask)

    label_t = torch.from_numpy(label)
    opt = torch.optim.AdamW(model.parameters(), lr=args.learning_rate)
    n_params = sum(p.numel() for p in model.parameters() if p.requires_grad)
    print(f"[control] reference {type(model).__name__}, {n_params / 1e6:.1f}M "
          f"trainable params, towers={towers}, epochs={args.epochs}, "
          f"lr={args.learning_rate}")

    t0 = time.time()
    for e in range(args.epochs):  # main_MMR.py:127-146, one fixed batch
        model.train()
        opt.zero_grad()
        loss, m1, m2 = model(*fwd_args, label=label_t, alpha=0.75)
        loss.backward()
        opt.step()
        if (e + 1) % max(1, args.epochs // 10) == 0:
            print(f"[control] epoch {e + 1}/{args.epochs} "
                  f"loss={loss.item():.4f} MSE={m1.item():.4f} "
                  f"SSIM={1 - m2.item():.4f} ({time.time() - t0:.0f}s)",
                  flush=True)

    # final report, main_MMR.py:176-210
    from pytorch_msssim import ssim  # the shim installed by load_reference
    from torchvision import transforms

    model.eval()
    with torch.no_grad():
        recon = model(*fwd_args, label=None)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "reference_utils", "/root/reference/utils.py")
    ref_utils = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_utils)
    PSNR = ref_utils.PSNR()
    if args.MM == "img":
        resize = transforms.Compose([transforms.Resize(size=(128, 128))])
        lab = resize(label_t)
        p = float(PSNR(recon, lab))
        s = float(ssim(recon, lab, data_range=1.0, size_average=True))
    else:
        resize = transforms.Compose([transforms.Resize(size=(256, 64))])
        lab = resize(label_t.unsqueeze(1)).squeeze(1)
        p = float(PSNR(recon.unsqueeze(1), lab.unsqueeze(1)))
        s = float(ssim(recon.unsqueeze(1), lab.unsqueeze(1),
                       data_range=1.0, size_average=True))
    mse = float(torch.mean((recon - lab) ** 2))
    lvar = float(torch.var(lab))
    out = {"mm": args.MM, "towers": towers, "epochs": args.epochs,
           "lr": args.learning_rate, "psnr": round(p, 3),
           "ssim": round(s, 4), "mse": round(mse, 4),
           "label_var": round(lvar, 4)}
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()

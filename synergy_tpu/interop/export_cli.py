"""CLI: export a trained checkpoint to the reference's torch/HF artifacts.

The inverse of ``interop.port_cli``: reads this framework's per-tower export
(``{ckpt_dir}/{tag}/export``, the C12 contract written after every
best-validation save) and writes

  * ``CLIP_model_{size}_{des}.tar`` — the reference's monolithic torch
    checkpoint (main_pretraining.py:45-47), consumable by its ZS/MMR scripts;
  * optionally (``--hf_dirs DIR``) per-modality HF ``save_pretrained``
    directories + ``projection_head.tar`` — the per-tower artifact its
    FT scripts load (DT/FT_image_task.py:115, DT/FT_audio_task.py:133,
    DT/FT_text_task.py:645).

Usage:
  python -m synergy_tpu.interop.export_cli --ckpt_dir synergy_ckpt \
      --IS_BASE true --IS_CAPTIONED false --out CLIP_model_base_prompt.tar \
      [--hf_dirs exported_hf/]
"""

from __future__ import annotations

import argparse

import numpy as np

from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.utils import str2bool


def _assemble_params(ckpt_dir: str, tag: str):
    params = {}
    for modality in ("vision", "text", "audio"):
        tower, head = ckpt.load_tower(ckpt_dir, tag, modality)
        params[modality] = tower
        params[f"{modality}_projection"] = head
    scales = ckpt.load_logit_scales(ckpt_dir, tag)
    params["logit_scale_IT"] = scales["IT"]
    params["logit_scale_TA"] = scales["TA"]
    params["logit_scale_AI"] = scales["AI"]
    return params


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Export a trained checkpoint to reference torch/HF "
                    "artifacts")
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    p.add_argument("--out", type=str, default=None,
                   help="output .tar path (default CLIP_model_{tag}.tar)")
    p.add_argument("--hf_dirs", type=str, default=None,
                   help="also write per-modality HF save_pretrained dirs "
                        "+ projection_head.tar under this directory")
    return p.parse_args(argv)


def main(argv=None):
    from synergy_tpu.interop import export_hf

    args = parse_args(argv)
    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    params = _assemble_params(args.ckpt_dir, tag)
    out = args.out or f"CLIP_model_{tag}.tar"
    export_hf.export_reference_checkpoint(params, out)
    import jax

    n = sum(np.asarray(x).size for x in jax.tree_util.tree_leaves(params))
    print(f"[export] {args.ckpt_dir}/{tag}/export ({n / 1e6:.0f}M params) "
          f"-> {out}")
    if args.hf_dirs:
        paths = export_hf.export_hf_tower_dirs(params, args.hf_dirs,
                                               is_base=args.IS_BASE)
        for modality, d in paths.items():
            print(f"[export]   {modality} -> {d}")
    return out


if __name__ == "__main__":
    main()

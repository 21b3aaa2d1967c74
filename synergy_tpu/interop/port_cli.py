"""Checkpoint migration CLI: reference torch artifacts -> synergy-tpu export.

Two input formats, matching the two artifacts the reference's save_model
writes (main_pretraining.py:31-59):

  (a) the monolithic ``CLIP_model_{size}_{captiontype}.tar``:

      python -m synergy_tpu.interop.port_cli \
          --checkpoint CLIP_model_base_prompt.tar \
          --ckpt_dir synergy_ckpt --IS_BASE true --IS_CAPTIONED false

  (b) the per-tower HF ``save_pretrained`` directories (each with its
      sibling ``projection_head.tar``):

      python -m synergy_tpu.interop.port_cli \
          --hf_vision_dir CLIP_image_model_base/prompt \
          --hf_text_dir   CLIP_text_model_base/prompt \
          --hf_audio_dir  CLIP_audio_model_base/prompt \
          --ckpt_dir synergy_ckpt --IS_BASE true --IS_CAPTIONED false

After converting, the downstream CLIs (eval/zs_*, eval/ft_*, train/mmr,
serve) load it via --ckpt_dir exactly as if it had been trained here.
"""

from __future__ import annotations

import argparse

import numpy as np

from synergy_tpu.interop.hf_port import (
    load_reference_checkpoint, port_tri_clip_from_dirs,
)
from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.utils import str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Port a reference Tri_CLIP torch checkpoint")
    p.add_argument("--checkpoint", type=str, default=None,
                   help="path to CLIP_model_*.tar (torch.save format)")
    p.add_argument("--hf_vision_dir", type=str, default=None,
                   help="HF save_pretrained dir for the vision tower")
    p.add_argument("--hf_text_dir", type=str, default=None,
                   help="HF save_pretrained dir for the text tower")
    p.add_argument("--hf_audio_dir", type=str, default=None,
                   help="HF save_pretrained dir for the audio tower")
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    dirs = (args.hf_vision_dir, args.hf_text_dir, args.hf_audio_dir)
    if args.checkpoint:
        params = load_reference_checkpoint(args.checkpoint)
        source = args.checkpoint
    elif all(dirs):
        params = port_tri_clip_from_dirs(*dirs)
        source = ", ".join(dirs)
    else:
        raise SystemExit(
            "provide either --checkpoint or all three of "
            "--hf_vision_dir/--hf_text_dir/--hf_audio_dir")
    n = sum(np.asarray(x).size for x in _leaves(params))
    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    ckpt.export_towers(args.ckpt_dir, tag, params)
    print(f"[port] {source} ({n / 1e6:.0f}M params) "
          f"-> {args.ckpt_dir}/{tag}/export")
    return params


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()

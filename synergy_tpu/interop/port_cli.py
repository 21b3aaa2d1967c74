"""Checkpoint migration CLI: reference torch checkpoint -> synergy-tpu export.

A reference user converts their trained ``CLIP_model_{size}_{captiontype}.tar``
(written by reference main_pretraining.py:31-59) into the per-modality export
every synergy-tpu eval/MMR/serving entry point consumes:

  python -m synergy_tpu.interop.port_cli \
      --checkpoint CLIP_model_base_prompt.tar \
      --ckpt_dir synergy_ckpt --IS_BASE true --IS_CAPTIONED false

After converting, the downstream CLIs (eval/zs_*, eval/ft_*, train/mmr,
serve) load it via --ckpt_dir exactly as if it had been trained here.
"""

from __future__ import annotations

import argparse

import numpy as np

from synergy_tpu.interop.hf_port import load_reference_checkpoint
from synergy_tpu.train import checkpoint as ckpt
from synergy_tpu.utils import str2bool


def parse_args(argv=None):
    p = argparse.ArgumentParser(
        description="Port a reference Tri_CLIP torch checkpoint")
    p.add_argument("--checkpoint", type=str, required=True,
                   help="path to CLIP_model_*.tar (torch.save format)")
    p.add_argument("--ckpt_dir", type=str, default="synergy_ckpt")
    p.add_argument("--IS_BASE", type=str2bool, default=True)
    p.add_argument("--IS_CAPTIONED", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    params = load_reference_checkpoint(args.checkpoint)
    n = sum(np.asarray(x).size for x in _leaves(params))
    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    ckpt.export_towers(args.ckpt_dir, tag, params)
    print(f"[port] {args.checkpoint} ({n / 1e6:.0f}M params) "
          f"-> {args.ckpt_dir}/{tag}/export")
    return params


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()

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
    p.add_argument("--from_orbax_step", type=int, default=None,
                   help="first (re)materialize the per-modality export from "
                        "this Orbax step (use after a --export_mode final "
                        "run that was preempted and never resumed; -1 = "
                        "latest step)")
    p.add_argument("--tiny", type=str2bool, default=False,
                   help="the checkpoint was trained with pretrain --tiny "
                        "(only affects --from_orbax_step's restore template)")
    return p.parse_args(argv)


def main(argv=None):
    from synergy_tpu.interop import export_hf

    args = parse_args(argv)
    tag = ckpt.size_tag(args.IS_BASE, args.IS_CAPTIONED)
    if args.from_orbax_step is not None:
        import jax
        import jax.numpy as jnp

        from synergy_tpu.configs import CLIPConfig
        from synergy_tpu.models.tri_clip import TriCLIP

        if args.tiny:
            cfg = CLIPConfig.tiny()
        else:
            cfg = CLIPConfig.base() if args.IS_BASE else CLIPConfig.large()
        model = TriCLIP(cfg)
        batch = {
            "pixel_values": jnp.zeros((1, 3, cfg.vision.image_size,
                                       cfg.vision.image_size)),
            "input_ids": jnp.ones((1, 8), jnp.int32),
            "attention_mask": jnp.ones((1, 8), jnp.int32),
            "input_values": jnp.zeros((1, cfg.audio.max_length,
                                       cfg.audio.num_mel_bins)),
        }
        # abstract params template: export_from_step only needs the tree
        # structure, so eval_shape (no compute, no device memory) replaces
        # what used to be a jitted full-model init + throwaway opt tree —
        # minutes and a param-sized device buffer at Large scale
        abstract = jax.eval_shape(
            model.init, jax.random.PRNGKey(0), batch["pixel_values"],
            batch["input_ids"], batch["attention_mask"],
            batch["input_values"])
        step = (None if args.from_orbax_step < 0 else args.from_orbax_step)
        got = ckpt.export_from_step(args.ckpt_dir, tag, abstract["params"],
                                    step=step)
        print(f"[export] materialized export from Orbax step {got}")
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

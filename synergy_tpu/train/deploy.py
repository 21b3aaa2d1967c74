"""Reconstruction sample renderer.

Supplies the reference's missing ``inference_MMR.deploy`` (imported at
reference main_MMR.py:23 but absent from the repo; call sites
main_MMR.py:180,192,203 fix its signature:
``deploy(MM, model_sz, text_des, recon, label, txt_processor, idx, cate)``).
Writes side-by-side recon/label renders under
``inference/{model_sz}_{text_des}/{MM}/``.
"""

from __future__ import annotations

import os

import numpy as np


def _to_image(arr: np.ndarray) -> "np.ndarray":
    """(3,H,W) or (H,W) float -> uint8 HWC/HW, min-max scaled."""
    a = np.asarray(arr, np.float32)
    lo, hi = a.min(), a.max()
    a = (a - lo) / (hi - lo + 1e-8)
    a = (a * 255).astype(np.uint8)
    if a.ndim == 3:
        a = a.transpose(1, 2, 0)
    return a


def deploy(MM: str, model_sz: str, text_des: str, recon, label,
           txt_processor=None, idx: int = 0, cate: int = 0,
           out_root: str = "inference") -> str:
    """Render one sample; returns the written path."""
    from PIL import Image

    out_dir = os.path.join(out_root, f"{model_sz}_{text_des}", MM)
    os.makedirs(out_dir, exist_ok=True)
    recon = np.asarray(recon)
    label = np.asarray(label)

    if MM == "txt":
        pred_ids = recon[idx].argmax(axis=-1)
        lab_ids = label[idx]
        if txt_processor is not None:
            pred = txt_processor.decode(pred_ids.tolist())
            lab = txt_processor.decode(lab_ids.tolist())
        else:
            pred, lab = str(pred_ids.tolist()), str(lab_ids.tolist())
        path = os.path.join(out_dir, f"sample_c{cate}_i{idx}.txt")
        with open(path, "w") as f:
            f.write(f"label: {lab}\nrecon: {pred}\n")
        return path

    r = _to_image(recon[idx])
    l = _to_image(label[idx])
    if r.ndim == 2:  # audio spectrogram: stack as grayscale
        canvas = np.concatenate([l, np.zeros((l.shape[0], 4), np.uint8), r], axis=1)
        img = Image.fromarray(canvas, mode="L")
    else:
        canvas = np.concatenate(
            [l, np.zeros((l.shape[0], 4, 3), np.uint8), r], axis=1)
        img = Image.fromarray(canvas)
    path = os.path.join(out_dir, f"sample_c{cate}_i{idx}.png")
    img.save(path)
    return path

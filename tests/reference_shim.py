"""Import the reference's own model.py as a numerical oracle.

``/root/reference/model.py`` fails to import only because four of its pinned
deps are absent here (torchvision, torchaudio, pytorch_msssim, piqa). This
module installs minimal, faithful sys.modules shims for exactly the surface
the reference exercises and loads the reference module so tests can compare
our Flax MMR stack / Tri_CLIP against the reference's *actual code* rather
than a hand-mirrored torch composition.

Shimmed surface (verified against the reference's usage):
  * ``torchvision.transforms.Compose`` / ``Resize(interpolation=BICUBIC)``
    applied to float tensors (reference model.py:629-632, 703-706) —
    implemented via ``F.interpolate(mode="bicubic", antialias=False)``,
    torchvision's tensor path for this call.
  * ``pytorch_msssim.ssim`` (reference model.py:637, 711) — a faithful
    reimplementation of VainF/pytorch-msssim's ``ssim``: per-channel
    separable gaussian window (11, 1.5), VALID padding, K=(0.01, 0.03).
    Note this shim is our own code; the ssim *math* is additionally pinned
    by tests/test_mmr.py's primitive-level oracles. What the reference
    import buys is the architecture: decoder wiring, CBAM gates, fusion,
    loss composition.
  * ``torchaudio`` / ``piqa`` — imported by the reference but never used in
    model.py; empty placeholder modules.

``load_reference()`` returns (model module, config module). Tri_CLIP's
``from_pretrained`` calls are NOT patched here — wrapper classes take
constructed encoder instances, and the Tri_CLIP oracle patches
``from_pretrained`` per-test to return config-built random-init HF models
(the hub is unreachable in this environment).
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import sys
import types


def _module(name: str) -> types.ModuleType:
    """A placeholder module with a valid __spec__ (transformers probes
    importlib.util.find_spec on e.g. torchaudio, which raises on a spec-less
    sys.modules entry)."""
    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return mod

import torch
import torch.nn.functional as F

REFERENCE_DIR = "/root/reference"


# ---------------------------------------------------------------------------
# torchvision shim (transforms.Compose / transforms.Resize on tensors)
# ---------------------------------------------------------------------------

class _Resize:
    def __init__(self, size, interpolation=None, **_kw):
        self.size = tuple(size) if isinstance(size, (tuple, list)) else (
            size, size)

    def __call__(self, x):
        return F.interpolate(x, size=self.size, mode="bicubic",
                             align_corners=False, antialias=False)


class _Compose:
    def __init__(self, transforms):
        self.transforms = transforms

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x


# ---------------------------------------------------------------------------
# pytorch_msssim shim (VainF/pytorch-msssim `ssim`, eval-path only)
# ---------------------------------------------------------------------------

def _gauss_1d(size: int, sigma: float) -> torch.Tensor:
    coords = torch.arange(size, dtype=torch.float)
    coords -= size // 2
    g = torch.exp(-(coords ** 2) / (2 * sigma ** 2))
    return (g / g.sum()).reshape(1, 1, size)


def _gaussian_filter(x: torch.Tensor, win: torch.Tensor) -> torch.Tensor:
    """Separable depthwise gaussian blur, VALID padding (B, C, H, W)."""
    c = x.shape[1]
    out = F.conv2d(x, win.transpose(2, -1), stride=1, padding=0, groups=c)
    out = F.conv2d(out, win.transpose(3, -1), stride=1, padding=0, groups=c)
    return out


def _msssim_ssim(X, Y, data_range=255, size_average=True, win_size=11,
                 win_sigma=1.5, win=None, K=(0.01, 0.03),
                 nonnegative_ssim=False):
    if win is None:
        win = _gauss_1d(win_size, win_sigma)
        win = win.repeat([X.shape[1]] + [1] * (len(X.shape) - 1))
    k1, k2 = K
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    win = win.to(X.device, dtype=X.dtype)
    mu1 = _gaussian_filter(X, win)
    mu2 = _gaussian_filter(Y, win)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    sigma1_sq = _gaussian_filter(X * X, win) - mu1_sq
    sigma2_sq = _gaussian_filter(Y * Y, win) - mu2_sq
    sigma12 = _gaussian_filter(X * Y, win) - mu1_mu2
    cs_map = (2 * sigma12 + c2) / (sigma1_sq + sigma2_sq + c2)
    ssim_map = ((2 * mu1_mu2 + c1) / (mu1_sq + mu2_sq + c1)) * cs_map
    ssim_per_channel = torch.flatten(ssim_map, 2).mean(-1)
    if nonnegative_ssim:
        ssim_per_channel = torch.relu(ssim_per_channel)
    if size_average:
        return ssim_per_channel.mean()
    return ssim_per_channel.mean(1)


def install_shims() -> None:
    if "torchvision" not in sys.modules:
        tv = _module("torchvision")
        tf = _module("torchvision.transforms")
        tf.Resize = _Resize
        tf.Compose = _Compose
        tv.transforms = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tf
    if "pytorch_msssim" not in sys.modules:
        pm = _module("pytorch_msssim")
        pm.ssim = _msssim_ssim
        pm.ms_ssim = None
        pm.SSIM = type("SSIM", (), {})
        pm.MS_SSIM = type("MS_SSIM", (), {})
        sys.modules["pytorch_msssim"] = pm
    for name in ("torchaudio", "piqa"):
        if name not in sys.modules:
            sys.modules[name] = _module(name)


def _load(module_name: str, filename: str):
    if module_name in sys.modules:
        return sys.modules[module_name]
    spec = importlib.util.spec_from_file_location(
        module_name, f"{REFERENCE_DIR}/{filename}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[module_name] = mod
    spec.loader.exec_module(mod)
    return mod


def load_reference():
    """Returns (reference model module, reference config module)."""
    install_shims()
    ref_config = _load("reference_config", "config.py")
    ref_model = _load("reference_model", "model.py")
    return ref_model, ref_config

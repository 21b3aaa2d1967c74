"""Compute ops: attention (XLA/Pallas dispatch), flash-attention kernels,
SSIM, torch-semantics bicubic resize, pixel shuffle."""

from synergy_tpu.ops.attention import (  # noqa: F401
    dot_product_attention, mask_to_bias, xla_attention,
)
from synergy_tpu.ops.pixel_shuffle import (  # noqa: F401
    pixel_shuffle_nchw, pixel_shuffle_nhwc,
)
from synergy_tpu.ops.resize import resize_bicubic_torch  # noqa: F401
from synergy_tpu.ops.ssim import ssim  # noqa: F401

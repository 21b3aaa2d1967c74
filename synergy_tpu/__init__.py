"""Synergy-TPU: a TPU-native tri-modal (vision/text/audio) contrastive framework.

A from-scratch JAX/Flax/Pallas/pjit rebuild of the capabilities of
JoSangYeon/Synergy-CLIP: tri-modal CLIP pretraining (3-pair InfoNCE),
missing-modality reconstruction (MMR), and the downstream fine-tune / zero-shot
evaluation suites — designed SPMD-first over `jax.sharding.Mesh`.
"""

__version__ = "0.1.0"

from synergy_tpu import configs  # noqa: F401

"""Construct randomly-initialized HF torch towers at our config dims.

The real pretrained weights are unreachable here (no hub); architecture
parity is a weights-independent property, so oracle tests build HF modules
from config (same constructors as tests/test_parity_base.py) and port their
random weights.
"""

from __future__ import annotations

import torch


def build_hf_vision(cfg, seed: int = 0):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    torch.manual_seed(seed)
    v = cfg.vision
    return CLIPVisionModel(CLIPVisionConfig(
        hidden_size=v.hidden_size, intermediate_size=v.intermediate_size,
        num_hidden_layers=v.num_hidden_layers,
        num_attention_heads=v.num_attention_heads,
        image_size=v.image_size, patch_size=v.patch_size,
        layer_norm_eps=v.layer_norm_eps)).eval()


def build_hf_text(cfg, seed: int = 1):
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRoberta

    torch.manual_seed(seed)
    t = cfg.text
    # layer_norm_eps must mirror the real roberta-base checkpoint (1e-5);
    # RobertaConfig() defaults to BERT's 1e-12 (see test_parity_base.py)
    return HFRoberta(RobertaConfig(
        vocab_size=t.vocab_size, hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        max_position_embeddings=t.max_position_embeddings,
        type_vocab_size=t.type_vocab_size, pad_token_id=t.pad_token_id,
        layer_norm_eps=t.layer_norm_eps,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)).eval()


def build_hf_audio(cfg, seed: int = 2):
    from transformers import ASTConfig
    from transformers import ASTModel as HFAst

    torch.manual_seed(seed)
    a = cfg.audio
    return HFAst(ASTConfig(
        hidden_size=a.hidden_size, intermediate_size=a.intermediate_size,
        num_hidden_layers=a.num_hidden_layers,
        num_attention_heads=a.num_attention_heads,
        patch_size=a.patch_size, frequency_stride=a.frequency_stride,
        time_stride=a.time_stride, max_length=a.max_length,
        num_mel_bins=a.num_mel_bins, layer_norm_eps=a.layer_norm_eps,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)).eval()

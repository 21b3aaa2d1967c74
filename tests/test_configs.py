"""Config-tree parity with the reference hyperparameters (reference config.py)."""

from synergy_tpu.configs import (
    AudioConfig, CLIPConfig, ReconstructionConfig, TextConfig, TrainConfig,
    VisionConfig,
)


def test_vision_base_large():
    b, l = VisionConfig.base(), VisionConfig.large()
    assert (b.hidden_size, b.num_hidden_layers, b.patch_size) == (768, 12, 16)
    assert (l.hidden_size, l.num_hidden_layers, l.patch_size) == (1024, 24, 14)
    assert b.seq_len == 197 and l.seq_len == 257  # config.py:137,327


def test_text_base_large():
    b, l = TextConfig.base(), TextConfig.large()
    assert b.vocab_size == l.vocab_size == 50265
    assert b.max_position_embeddings == 514
    assert (b.bos_token_id, b.pad_token_id, b.eos_token_id) == (0, 1, 2)
    assert l.hidden_size == 1024 and l.num_hidden_layers == 24


def test_audio_base_large():
    b, l = AudioConfig.base(), AudioConfig.large()
    # Base 12-12 stride -> 852 tokens; Large 10-10 -> 1214 (config.py:139,329).
    assert b.seq_len == 852 and l.seq_len == 1214
    # AST tower stays 768d/12L even in the Large config (config.py:273-289).
    assert l.hidden_size == 768 and l.num_hidden_layers == 12


def test_clip_config():
    b, l = CLIPConfig.base(), CLIPConfig.large()
    assert b.projection_dim == 768 and l.projection_dim == 1024
    assert b.logit_scale_init_value == 2.6592  # config.py:112
    assert hash(b) != hash(l)  # frozen/hashable for static jit args


def test_recon_config():
    b, l = ReconstructionConfig.base(), ReconstructionConfig.large()
    assert b.img_decoder_layer_info[0] == (2, 1024, 4, 4)
    assert b.img_decoder_layer_info[-1] == (2, 64, 64, 64)
    assert l.img_decoder_layer_info[0] == (2, 2048, 2, 2)
    assert b.aud_size == (256, 64) and b.decoder_dim == 512 and l.decoder_dim == 768
    assert (b.vision_length, b.text_length, b.audio_length) == (197, 32, 852)
    assert (l.vision_length, l.text_length, l.audio_length) == (257, 32, 1214)


def test_train_config_defaults():
    base = TrainConfig.for_size(True)
    large = TrainConfig.for_size(False)
    # main_pretraining.py:79-80: batch 35/accum 4 Base; 14/8 Large.
    assert (base.per_device_batch, base.accum_steps) == (35, 4)
    assert (large.per_device_batch, large.accum_steps) == (14, 8)
    assert base.learning_rate == 5e-6

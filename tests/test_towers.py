"""Tower fidelity gate: ported weights must reproduce HF torch outputs <=1e-4
(BASELINE.md "embedding fidelity"). HF models are constructed from configs
with random init (no network), weights are ported via interop/hf_port.py, and
last_hidden_state + pooler_output are compared on fixed inputs.

Small-dim configs keep CPU runtime low while exercising every architectural
detail (norm placement, activations, position-id conventions, pooling).
"""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from synergy_tpu.configs import AudioConfig, TextConfig, VisionConfig
from synergy_tpu.interop import hf_port
from synergy_tpu.models.ast import ASTModel
from synergy_tpu.models.roberta import RobertaModel
from synergy_tpu.models.vit import ViTModel

TOL = 1e-4


def _assert_close(ours, ref, what):
    err = np.abs(np.asarray(ours) - ref.detach().numpy()).max()
    assert err <= TOL, f"{what}: max err {err}"


@pytest.mark.parametrize("hidden,layers,heads", [(64, 2, 4)])
def test_vit_parity(hidden, layers, heads, rng):
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=layers, num_attention_heads=heads,
        image_size=64, patch_size=16)
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionConfig(hidden_size=hidden, intermediate_size=hidden * 4,
                       num_hidden_layers=layers, num_attention_heads=heads,
                       image_size=64, patch_size=16)
    model = ViTModel(cfg)
    params = hf_port.port_vision(hf)
    pixels = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(pixels))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(pixels))
    _assert_close(lhs, ref.last_hidden_state, "vit last_hidden_state")
    _assert_close(pooled, ref.pooler_output, "vit pooler_output")


def test_roberta_parity(rng):
    from transformers import RobertaConfig
    from transformers import RobertaModel as HFRoberta

    hf_cfg = RobertaConfig(
        vocab_size=512, hidden_size=64, intermediate_size=256,
        num_hidden_layers=2, num_attention_heads=4,
        max_position_embeddings=66, type_vocab_size=1,
        pad_token_id=1, bos_token_id=0, eos_token_id=2,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = HFRoberta(hf_cfg).eval()
    cfg = TextConfig(vocab_size=512, hidden_size=64, intermediate_size=256,
                     num_hidden_layers=2, num_attention_heads=4,
                     max_position_embeddings=66,
                     attention_dropout=0.0, hidden_dropout=0.0)
    model = RobertaModel(cfg)
    params = hf_port.port_text(hf)
    ids = rng.integers(4, 512, size=(3, 12)).astype(np.int64)
    ids[:, 0] = 0
    mask = np.ones_like(ids)
    mask[0, 8:] = 0
    ids[0, 8:] = 1  # pad
    with torch.no_grad():
        ref = hf(input_ids=torch.from_numpy(ids),
                 attention_mask=torch.from_numpy(mask))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(ids),
                              jnp.asarray(mask))
    # padded positions may legitimately differ; compare non-pad tokens
    ours_lhs = np.asarray(lhs) * mask[..., None]
    ref_lhs = ref.last_hidden_state.numpy() * mask[..., None]
    assert np.abs(ours_lhs - ref_lhs).max() <= TOL
    _assert_close(pooled, ref.pooler_output, "roberta pooler")


def test_vit_parity_scan_mode(rng):
    """The scanned-layer path (stacked params + dots-saveable remat) must
    match HF exactly, like the unrolled path."""
    from transformers import CLIPVisionConfig, CLIPVisionModel

    hf_cfg = CLIPVisionConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=3,
        num_attention_heads=4, image_size=64, patch_size=16)
    torch.manual_seed(0)
    hf = CLIPVisionModel(hf_cfg).eval()
    cfg = VisionConfig(hidden_size=64, intermediate_size=256,
                       num_hidden_layers=3, num_attention_heads=4,
                       image_size=64, patch_size=16)
    model = ViTModel(cfg, scan_layers=True)
    params = hf_port.port_vision(hf, scan_layers=True)
    assert params["encoder"]["layers"]["mlp"]["fc1"]["kernel"].shape[0] == 3
    pixels = rng.standard_normal((2, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(pixel_values=torch.from_numpy(pixels))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(pixels))
    _assert_close(lhs, ref.last_hidden_state, "scan vit lhs")
    _assert_close(pooled, ref.pooler_output, "scan vit pooled")


def test_roberta_position_ids():
    from synergy_tpu.models.roberta import create_position_ids

    ids = jnp.asarray([[0, 5, 6, 2, 1, 1], [0, 7, 2, 1, 1, 1]])
    pos = create_position_ids(ids, 1)
    np.testing.assert_array_equal(
        np.asarray(pos), [[2, 3, 4, 5, 1, 1], [2, 3, 4, 1, 1, 1]])


def test_ast_parity(rng):
    from transformers import ASTConfig
    from transformers import ASTModel as HFAst

    hf_cfg = ASTConfig(
        hidden_size=64, intermediate_size=256, num_hidden_layers=2,
        num_attention_heads=4, patch_size=16, frequency_stride=12,
        time_stride=12, max_length=128, num_mel_bins=64,
        attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = HFAst(hf_cfg).eval()
    cfg = AudioConfig(hidden_size=64, intermediate_size=256,
                      num_hidden_layers=2, num_attention_heads=4,
                      patch_size=16, frequency_stride=12, time_stride=12,
                      max_length=128, num_mel_bins=64)
    assert cfg.seq_len == hf.embeddings.position_embeddings.shape[1]
    model = ASTModel(cfg)
    params = hf_port.port_audio(hf)
    fbank = rng.standard_normal((2, 128, 64)).astype(np.float32)
    with torch.no_grad():
        ref = hf(input_values=torch.from_numpy(fbank))
    lhs, pooled = model.apply({"params": params}, jnp.asarray(fbank))
    _assert_close(lhs, ref.last_hidden_state, "ast last_hidden_state")
    _assert_close(pooled, ref.pooler_output, "ast pooler_output")


def test_exact_gelu_matches_autodiff():
    """ACTIVATIONS['gelu_xjvp'] (Large text/audio towers only) is GELU with
    an analytic custom JVP (Φ(x)+x·φ(x)), so the compiled backward avoids
    XLA's erfc-select predicate residuals (docs/BENCHMARKS.md Large
    profile); primal AND gradient must stay numerically equal to autodiff
    through jax.nn.gelu(approximate=False), which 'gelu' (Base) uses."""
    import jax

    from synergy_tpu.configs import AudioConfig, CLIPConfig, TextConfig
    from synergy_tpu.models.layers import ACTIVATIONS, exact_gelu

    # routing: the analytic JVP is a measured WIN on Large and a measured
    # REGRESSION on Base, so only the Large text/audio configs select it
    assert ACTIVATIONS["gelu_xjvp"] is exact_gelu
    assert TextConfig.large().hidden_act == "gelu_xjvp"
    assert AudioConfig.large().hidden_act == "gelu_xjvp"
    assert TextConfig.base().hidden_act == "gelu"
    assert AudioConfig.base().hidden_act == "gelu"
    assert CLIPConfig.large().vision.hidden_act == "quick_gelu"

    x = jnp.asarray(
        np.concatenate([
            np.linspace(-12.0, 12.0, 4001),
            np.array([0.0, -1e-8, 1e-8, -30.0, 30.0]),
        ]), jnp.float32)

    # abs tol 1e-5, not ulp-exact: jax.nn.gelu's erfc-stabilized lowering
    # resolves the deep tail (gelu(-12) ~ -2e-32) where plain f32 erf
    # saturates to -1, so exact_gelu returns ~1e-6 there instead; and at
    # x=30 the erf path is ~2 ulp off. Both are far below bf16 resolution
    # (the training dtype) and were measured as loss-neutral on-chip.
    ref = jax.nn.gelu(x, approximate=False)
    ours = exact_gelu(x)
    assert np.abs(np.asarray(ours - ref)).max() <= 1e-5

    g_ref = jax.grad(lambda v: jnp.sum(jax.nn.gelu(v, approximate=False)))(x)
    g_ours = jax.grad(lambda v: jnp.sum(exact_gelu(v)))(x)
    assert np.all(np.isfinite(np.asarray(g_ours)))
    assert np.abs(np.asarray(g_ours - g_ref)).max() <= 1e-5

    # second-order path (jax.hessian users): custom JVP must stay
    # differentiable
    h = jax.grad(jax.grad(lambda v: exact_gelu(v)))(jnp.float32(0.7))
    h_ref = jax.grad(jax.grad(
        lambda v: jax.nn.gelu(v, approximate=False)))(jnp.float32(0.7))
    assert abs(float(h - h_ref)) <= 1e-6


def test_layernorm_impls_match_flax():
    """models/layers.LayerNorm (env-routable fusion-boundary twin of
    nn.LayerNorm; SYNERGY_LN_IMPL in {flax, saved, barrier}) must keep the
    exact {scale, bias} param tree and flax numerics for every impl —
    outputs AND all three grads — in f32 and bf16. The 'saved' custom VJP
    additionally changes WHAT the backward recomputes (it saves (x, mean,
    rstd)), so its grads are pinned at f32 tolerance, not bit equality."""
    import os

    import flax.linen as nn
    import jax

    from synergy_tpu.models.layers import LayerNorm

    rng = np.random.default_rng(3)
    x32 = jnp.asarray(rng.standard_normal((4, 17, 96)) * 3, jnp.float32)

    ref = nn.LayerNorm(epsilon=1e-5)
    vref = ref.init(jax.random.PRNGKey(0), x32)

    def loss(mod, v, x):
        y = mod.apply(v, x)
        return jnp.sum(jnp.sin(y.astype(jnp.float32)))

    lref, (gpref, gxref) = (
        loss(ref, vref, x32),
        jax.grad(lambda v, x: loss(ref, v, x), argnums=(0, 1))(vref, x32))

    prev = os.environ.get("SYNERGY_LN_IMPL")
    try:
        for impl in ("flax", "saved", "barrier"):
            os.environ["SYNERGY_LN_IMPL"] = impl
            ours = LayerNorm(epsilon=1e-5)
            v = ours.init(jax.random.PRNGKey(0), x32)
            assert jax.tree_util.tree_structure(v) == \
                jax.tree_util.tree_structure(vref), impl
            l, (gp, gx) = (
                loss(ours, v, x32),
                jax.grad(lambda v_, x_: loss(ours, v_, x_),
                         argnums=(0, 1))(v, x32))
            assert abs(float(l - lref)) <= 1e-4, (impl, float(l - lref))
            for a, b in zip(jax.tree_util.tree_leaves((gp, gx)),
                            jax.tree_util.tree_leaves((gpref, gxref))):
                assert np.abs(np.asarray(a - b)).max() <= 4e-5, impl

            # bf16 activations (the training dtype): forward bit-equal to
            # flax's (f32 stats, cast at the end)
            x16 = x32.astype(jnp.bfloat16)
            ours16 = LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16)
            y16 = ours16.apply(v, x16)
            yref16 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.bfloat16).apply(
                vref, x16)
            assert y16.dtype == jnp.bfloat16
            assert np.array_equal(np.asarray(y16, np.float32),
                                  np.asarray(yref16, np.float32)), impl
    finally:
        if prev is None:
            os.environ.pop("SYNERGY_LN_IMPL", None)
        else:
            os.environ["SYNERGY_LN_IMPL"] = prev


def test_ln_impl_config_routing():
    """Large configs route the per-layer LNs to the 'barrier' impl (measured
    -4% Large step time, tools/exp_ln.py — docs/BENCHMARKS.md); the param
    tree and numerics must be unchanged vs the default flax path, and the
    SYNERGY_LN_IMPL env var (A/B harness) must override config routing."""
    import os

    import jax

    from synergy_tpu.configs import CLIPConfig
    from synergy_tpu.models.layers import EncoderLayer

    assert CLIPConfig.large().vision.ln_impl == "barrier"
    assert CLIPConfig.large().audio.ln_impl == "barrier"
    assert CLIPConfig.base().vision.ln_impl is None  # flax default

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal((2, 9, 64)), jnp.float32)
    kw = dict(num_heads=4, head_dim=16, intermediate_size=128, act="gelu")
    ref = EncoderLayer(**kw)
    v = ref.init(jax.random.PRNGKey(0), x)
    y_ref = ref.apply(v, x)

    routed = EncoderLayer(**kw, ln_impl="barrier")
    v2 = routed.init(jax.random.PRNGKey(0), x)
    assert jax.tree_util.tree_structure(v2) == jax.tree_util.tree_structure(v)
    y = routed.apply(v, x)
    assert np.abs(np.asarray(y - y_ref)).max() <= 1e-5

    prev = os.environ.get("SYNERGY_LN_IMPL")
    try:
        os.environ["SYNERGY_LN_IMPL"] = "flax"  # env overrides config
        y3 = routed.apply(v, x)
        assert np.array_equal(np.asarray(y3), np.asarray(y_ref))
    finally:
        if prev is None:
            os.environ.pop("SYNERGY_LN_IMPL", None)
        else:
            os.environ["SYNERGY_LN_IMPL"] = prev

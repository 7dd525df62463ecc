"""Model-family parity vs independent HuggingFace implementations.

Extends tests/test_parity_hf.py (tiny Llama) across the reference's
flagship families — the role of uzu's per-model golden traces
(workspace/data/responses/*.json, parameters/loader.rs:216-258):

- Qwen3: GQA + per-head QK RMS-norm
- Gemma2: (1+w) norms, post-mixer/post-mlp norms, attention + final logit
  soft caps, sliding-window layers, sqrt(D) embedding scale, GELU-tanh
- Qwen3Next (Qwen3.5-class hybrid): Gated DeltaNet mixers (conv + delta
  rule + gated per-head RMSNorm) interleaved with gated full attention
  (sigmoid output gate, QK norm, partial rotary)
- Quantized parity: our INT8 engine vs HF running the DEQUANTIZED weights

Same weights, same inputs; logits must match tightly at every position.

Mamba2 is NOT HF-comparable by design: the reference's SSD kernel
(backends/cpu/kernel/ssm/ssd_update.rs:56) uses decay = exp(-dt) with no
A_log parameter and no gated pre-out norm, while HF's Mamba2 class has
both — our mixer matches the reference (pinned vs the per-token scan in
test_ssm.py), so an HF comparison would test a different model family.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from uzu_tpu import LanguageModel  # noqa: E402
from uzu_tpu.config.model import (  # noqa: E402
    AttentionConfig,
    DecoderConfig,
    DeltaNetConfig,
    DenseMLPConfig,
    FullPrecisionSpec,
    GELU,
    GenerationConfig,
    IntSpec,
    LanguageModelConfig,
    Layout,
    LinearConfig,
    NormalizationConfig,
    SeparableCausalConvConfig,
    SiLU,
    TiedEmbeddingConfig,
    TransformerConfig,
    TransformerLayerConfig,
    UnscaledRoPEConfig,
    UpcastMode,
)
from uzu_tpu.tools.synth import ModelBuilder, llama_config, qwen3_config  # noqa: E402

FP_OI = FullPrecisionSpec(layout=Layout.OUTPUT_INPUT)
FP_IO = FullPrecisionSpec(layout=Layout.INPUT_OUTPUT)


def _gen_cfg():
    return GenerationConfig(
        stop_token_ids=(0,), temperature=None, top_k=None, top_p=None,
        min_p=None, banned_tokens=None, repetition_penalty=None,
        presence_penalty=None, frequency_penalty=None,
        suffix_repetition_length=None,
    )


def _rms(eps, offset=None, upcast=UpcastMode.ONLY_NORMALIZATION):
    return NormalizationConfig(epsilon=eps, scale_offset=offset,
                               upcast_mode=upcast, subtract_mean=False,
                               has_biases=False)


def hf_logits(hf, tokens):
    with torch.no_grad():
        out = hf(torch.tensor(np.asarray(tokens), dtype=torch.long)[None, :])
    return out.logits[0].float().numpy()


def assert_parity(hf, lm, vocab, n=14, rtol=2e-3, atol=2e-3):
    tokens = (np.arange(n) * 11 + 3) % vocab
    ref = hf_logits(hf, tokens)
    # per-position logits via token-at-a-time prefill
    state = lm.new_state()
    ours = []
    for tok in tokens:
        logits, state = lm.prefill(state, np.array([tok]))
        ours.append(np.asarray(logits))
    np.testing.assert_allclose(np.stack(ours), ref, rtol=rtol, atol=atol)
    # chunked prefill last-row
    logits, _ = lm.prefill(lm.new_state(), tokens)
    np.testing.assert_allclose(np.asarray(logits), ref[-1], rtol=rtol, atol=atol)
    # greedy continuation
    prompt = tokens[:5]
    ours_gen = lm.generate_list(prompt, 6, stop_token_ids=[])
    seq = list(prompt)
    for _ in range(6):
        nxt = int(np.argmax(hf_logits(hf, seq)[-1]))
        seq.append(nxt)
    assert ours_gen == seq[len(prompt):]


# -- Qwen3 -------------------------------------------------------------------

D, HID, NH, NG, DH, V = 64, 176, 4, 2, 16, 96


def _map_llama_attention(b, p, sd, i, prefix="model.layers"):
    def t(name):
        return sd[name].detach().float().numpy()

    qkv = np.concatenate([
        t(f"{prefix}.{i}.self_attn.q_proj.weight"),
        t(f"{prefix}.{i}.self_attn.k_proj.weight"),
        t(f"{prefix}.{i}.self_attn.v_proj.weight"),
    ], axis=0)
    b.linear(f"{p}.mixer.qkv_projection", D, qkv.shape[0], FP_OI, False, weights=qkv)
    b.linear(f"{p}.mixer.out_projection", NH * DH, D, FP_OI, False,
             weights=t(f"{prefix}.{i}.self_attn.o_proj.weight"))


def _map_mlp(b, p, sd, i, d, hid, prefix="model.layers"):
    def t(name):
        return sd[name].detach().float().numpy()

    up = np.concatenate([
        t(f"{prefix}.{i}.mlp.up_proj.weight"),
        t(f"{prefix}.{i}.mlp.gate_proj.weight"),
    ], axis=0)  # fused rows [up | gate]
    b.linear(f"{p}.mlp.up_projection", d, 2 * hid, FP_OI, False, weights=up)
    b.linear(f"{p}.mlp.down_projection", hid, d, FP_OI, False,
             weights=t(f"{prefix}.{i}.mlp.down_proj.weight"))


@pytest.fixture(scope="module")
def qwen3_pair(tmp_path_factory):
    cfg_hf = transformers.Qwen3Config(
        vocab_size=V, hidden_size=D, intermediate_size=HID,
        num_hidden_layers=2, num_attention_heads=NH, num_key_value_heads=NG,
        head_dim=DH, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, attention_bias=False,
    )
    torch.manual_seed(1)
    hf = transformers.Qwen3ForCausalLM(cfg_hf).eval().to(torch.float32)
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().float().numpy()

    cfg = qwen3_config(num_layers=2, model_dim=D, hidden_dim=HID, num_heads=NH,
                       num_groups=NG, head_dim=DH, vocab_size=V, max_seq=256,
                       qk_norm_eps=1e-5)
    # qwen3_config sets rope_base 1e6; rebuild layers with theta 1e4
    rope = UnscaledRoPEConfig(base=10000.0, max_sequence_length=256, head_dim=DH)
    layers = tuple(
        TransformerLayerConfig(**{
            **{f: getattr(lc, f) for f in lc.__dataclass_fields__},
            "rope_config": rope,
        })
        for lc in cfg.decoder_config.transformer_config.layer_configs
    )
    cfg = LanguageModelConfig(
        decoder_config=DecoderConfig(
            embedding_config=cfg.decoder_config.embedding_config,
            transformer_config=TransformerConfig(
                layer_configs=layers,
                output_norm_config=cfg.decoder_config.transformer_config.output_norm_config,
                model_dim=D, hidden_dim=HID),
            vocab_size=V, ple_model_config=None),
        generation_config=cfg.generation_config)

    b = ModelBuilder(seed=0, dtype=np.float32)
    b.embedding("embedding", V, D, FP_IO, weights=t("model.embed_tokens.weight"))
    for i in range(2):
        p = f"transformer.layers.{i}"
        _map_llama_attention(b, p, sd, i)
        b.tensors[f"{p}.mixer.query_norm.scales"] = t(f"model.layers.{i}.self_attn.q_norm.weight")
        b.tensors[f"{p}.mixer.key_norm.scales"] = t(f"model.layers.{i}.self_attn.k_norm.weight")
        _map_mlp(b, p, sd, i, D, HID)
        b.tensors[f"{p}.pre_mixer_norm.scales"] = t(f"model.layers.{i}.input_layernorm.weight")
        b.tensors[f"{p}.pre_mlp_norm.scales"] = t(f"model.layers.{i}.post_attention_layernorm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.norm.weight")
    d = b.write(str(tmp_path_factory.mktemp("qwen3_parity")), cfg)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(4, 16))
    return hf, lm


def test_qwen3_parity(qwen3_pair):
    hf, lm = qwen3_pair
    assert_parity(hf, lm, V)


# -- Gemma2 ------------------------------------------------------------------


@pytest.fixture(scope="module")
def gemma2_pair(tmp_path_factory):
    cfg_hf = transformers.Gemma2Config(
        vocab_size=V, hidden_size=D, intermediate_size=HID,
        num_hidden_layers=2, num_attention_heads=NH, num_key_value_heads=NG,
        head_dim=DH, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0, query_pre_attn_scalar=DH,
        sliding_window=8, tie_word_embeddings=True, attention_bias=False,
        hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(2)
    hf = transformers.Gemma2ForCausalLM(cfg_hf).eval().to(torch.float32)
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().float().numpy()

    g_norm = lambda: _rms(1e-6, offset=1.0, upcast=UpcastMode.FULL_LAYER)  # noqa: E731
    mlp = DenseMLPConfig(
        linear_config=LinearConfig(), activation=GELU(approximate=True),
        has_up_biases=False, has_down_biases=False,
        gate_clipping=None, up_clipping=None,
    )
    rope = UnscaledRoPEConfig(base=10000.0, max_sequence_length=256, head_dim=DH)
    layers = []
    for i in range(2):
        # HF Gemma2: even layers sliding-window, odd layers global
        attn = AttentionConfig(
            qkv_projection_config=LinearConfig(),
            out_projection_config=LinearConfig(),
            query_norm_config=None, key_norm_config=None,
            num_heads=NH, num_groups=NG, head_dim=DH, is_causal=True,
            scale=float(DH) ** -0.5,
            sliding_window_size=8 if i % 2 == 0 else None,
            logit_soft_cap=50.0, has_sinks=False,
            has_qkv_biases=False, has_out_biases=False,
            gate_projection_config=None, normalize_values=False,
            is_kv_sharing=False,
        )
        layers.append(TransformerLayerConfig(
            pre_mixer_norm_config=g_norm(), mixer_config=attn,
            post_mixer_norm_config=g_norm(), pre_mlp_norm_config=g_norm(),
            mlp_config=mlp, post_mlp_norm_config=g_norm(), hidden_dim=None,
            ple_config=None, has_post_layer_scalar=False,
            kv_source_layer_index=None, rope_config=rope,
        ))
    cfg = LanguageModelConfig(
        decoder_config=DecoderConfig(
            embedding_config=TiedEmbeddingConfig(
                input_scale=float(D) ** 0.5, logit_soft_cap=30.0),
            transformer_config=TransformerConfig(
                layer_configs=tuple(layers), output_norm_config=g_norm(),
                model_dim=D, hidden_dim=HID),
            vocab_size=V, ple_model_config=None),
        generation_config=_gen_cfg())

    b = ModelBuilder(seed=0, dtype=np.float32)
    b.embedding("embedding", V, D, FP_IO, weights=t("model.embed_tokens.weight"))
    for i in range(2):
        p = f"transformer.layers.{i}"
        _map_llama_attention(b, p, sd, i)
        _map_mlp(b, p, sd, i, D, HID)
        b.tensors[f"{p}.pre_mixer_norm.scales"] = t(f"model.layers.{i}.input_layernorm.weight")
        b.tensors[f"{p}.post_mixer_norm.scales"] = t(f"model.layers.{i}.post_attention_layernorm.weight")
        b.tensors[f"{p}.pre_mlp_norm.scales"] = t(f"model.layers.{i}.pre_feedforward_layernorm.weight")
        b.tensors[f"{p}.post_mlp_norm.scales"] = t(f"model.layers.{i}.post_feedforward_layernorm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.norm.weight")
    d = b.write(str(tmp_path_factory.mktemp("gemma2_parity")), cfg)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(4, 16))
    return hf, lm


def test_gemma2_parity(gemma2_pair):
    # tanh soft caps amplify f32 rounding differences between frameworks
    hf, lm = gemma2_pair
    assert_parity(hf, lm, V, n=14, atol=5e-3)


# -- Qwen3Next (GDN hybrid) --------------------------------------------------

NVH, NKH, DK, DV, CK = 4, 2, 16, 16, 4  # linear-attn heads / dims / conv k


@pytest.fixture(scope="module")
def qwen3next_pair(tmp_path_factory):
    cfg_hf = transformers.Qwen3NextConfig(
        vocab_size=V, hidden_size=D, intermediate_size=HID,
        num_hidden_layers=4, num_attention_heads=NH, num_key_value_heads=NG,
        head_dim=DH, max_position_embeddings=256, rms_norm_eps=1e-6,
        rope_theta=10000.0, partial_rotary_factor=0.25,
        tie_word_embeddings=True, attention_bias=False,
        full_attention_interval=4,  # layers 0-2 GDN, layer 3 attention
        linear_num_value_heads=NVH, linear_num_key_heads=NKH,
        linear_key_head_dim=DK, linear_value_head_dim=DV,
        linear_conv_kernel_dim=CK,
        num_experts=2, mlp_only_layers=[0, 1, 2, 3],  # dense MLP everywhere
    )
    torch.manual_seed(3)
    hf = transformers.Qwen3NextForCausalLM(cfg_hf).eval().to(torch.float32)
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().float().numpy()

    eps = 1e-6
    # Qwen3Next norms are zero-centered (1 + w), full-f32 (modeling_
    # qwen3_next.Qwen3NextRMSNorm); only the GDN's gated per-head norm
    # keeps plain ones-init scales
    n1 = lambda: _rms(eps, offset=1.0, upcast=UpcastMode.FULL_LAYER)  # noqa: E731
    gdn = DeltaNetConfig(
        in_proj_config=LinearConfig(),
        conv_config=SeparableCausalConvConfig(has_biases=False),
        out_proj_config=LinearConfig(),
        norm_config=_rms(eps, upcast=UpcastMode.FULL_LAYER),
        num_heads=NVH, num_groups=NKH, head_dim=DK, value_head_dim=DV,
        kernel_size=CK,
    )
    qk_norm = n1()
    rope = UnscaledRoPEConfig(base=10000.0, max_sequence_length=256,
                              head_dim=DH // 4)  # partial rotary 0.25
    attn = AttentionConfig(
        qkv_projection_config=LinearConfig(),
        out_projection_config=LinearConfig(),
        query_norm_config=qk_norm, key_norm_config=qk_norm,
        num_heads=NH, num_groups=NG, head_dim=DH, is_causal=True,
        scale=None, sliding_window_size=None, logit_soft_cap=None,
        has_sinks=False, has_qkv_biases=False, has_out_biases=False,
        gate_projection_config=LinearConfig(),  # sigmoid output gate
        normalize_values=False, is_kv_sharing=False,
    )
    mlp = DenseMLPConfig(
        linear_config=LinearConfig(), activation=SiLU(alpha=1.0),
        has_up_biases=False, has_down_biases=False,
        gate_clipping=None, up_clipping=None,
    )
    layers = tuple(
        TransformerLayerConfig(
            pre_mixer_norm_config=n1(),
            mixer_config=attn if i == 3 else gdn,
            post_mixer_norm_config=None, pre_mlp_norm_config=n1(),
            mlp_config=mlp, post_mlp_norm_config=None, hidden_dim=None,
            ple_config=None, has_post_layer_scalar=False,
            kv_source_layer_index=None,
            rope_config=rope if i == 3 else None,
        )
        for i in range(4)
    )
    cfg = LanguageModelConfig(
        decoder_config=DecoderConfig(
            embedding_config=TiedEmbeddingConfig(input_scale=None, logit_soft_cap=None),
            transformer_config=TransformerConfig(
                layer_configs=layers, output_norm_config=n1(),
                model_dim=D, hidden_dim=HID),
            vocab_size=V, ple_model_config=None),
        generation_config=_gen_cfg())

    b = ModelBuilder(seed=0, dtype=np.float32)
    b.embedding("embedding", V, D, FP_IO, weights=t("model.embed_tokens.weight"))
    rep = NVH // NKH
    key_dim, value_dim = NKH * DK, NVH * DV
    for i in range(4):
        p = f"transformer.layers.{i}"
        if i == 3:
            # gated attention: q_proj rows per head are [q(dh) | gate(dh)]
            qg = t(f"model.layers.{i}.self_attn.q_proj.weight").reshape(NH, 2 * DH, D)
            q_rows = qg[:, :DH].reshape(NH * DH, D)
            gate_rows = qg[:, DH:].reshape(NH * DH, D)
            qkv = np.concatenate([
                q_rows,
                t(f"model.layers.{i}.self_attn.k_proj.weight"),
                t(f"model.layers.{i}.self_attn.v_proj.weight"),
            ], axis=0)
            b.linear(f"{p}.mixer.qkv_projection", D, qkv.shape[0], FP_OI, False, weights=qkv)
            b.linear(f"{p}.mixer.gate_projection", D, NH * DH, FP_OI, False, weights=gate_rows)
            b.linear(f"{p}.mixer.out_projection", NH * DH, D, FP_OI, False,
                     weights=t(f"model.layers.{i}.self_attn.o_proj.weight"))
            b.tensors[f"{p}.mixer.query_norm.scales"] = t(f"model.layers.{i}.self_attn.q_norm.weight")
            b.tensors[f"{p}.mixer.key_norm.scales"] = t(f"model.layers.{i}.self_attn.k_norm.weight")
        else:
            la = f"model.layers.{i}.linear_attn"
            # HF packs qkvz per k-head: [q(dk) | k(dk) | v(rep*dv) | z(rep*dv)]
            w1 = t(f"{la}.in_proj_qkvz.weight").reshape(NKH, 2 * DK + 2 * rep * DV, D)
            # and ba per k-head: [b(rep) | a(rep)]
            w2 = t(f"{la}.in_proj_ba.weight").reshape(NKH, 2 * rep, D)
            in_proj = np.concatenate([
                w1[:, :DK].reshape(key_dim, D),                       # q
                w1[:, DK:2 * DK].reshape(key_dim, D),                 # k
                w1[:, 2 * DK:2 * DK + rep * DV].reshape(value_dim, D),  # v
                w1[:, 2 * DK + rep * DV:].reshape(value_dim, D),      # z
                w2[:, :rep].reshape(NVH, D),                          # beta
                w2[:, rep:].reshape(NVH, D),                          # a
            ], axis=0)
            b.linear(f"{p}.mixer.in_proj", D, in_proj.shape[0], FP_OI, False,
                     weights=in_proj)
            b.linear(f"{p}.mixer.out_proj", value_dim, D, FP_OI, False,
                     weights=t(f"{la}.out_proj.weight"))
            b.tensors[f"{p}.mixer.conv.weights"] = t(f"{la}.conv1d.weight")[:, 0, :]
            b.tensors[f"{p}.mixer.a_log"] = t(f"{la}.A_log")
            b.tensors[f"{p}.mixer.dt_bias"] = t(f"{la}.dt_bias")
            b.tensors[f"{p}.mixer.norm.scales"] = t(f"{la}.norm.weight")
        _map_mlp(b, p, sd, i, D, HID)
        b.tensors[f"{p}.pre_mixer_norm.scales"] = t(f"model.layers.{i}.input_layernorm.weight")
        b.tensors[f"{p}.pre_mlp_norm.scales"] = t(f"model.layers.{i}.post_attention_layernorm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.norm.weight")
    d = b.write(str(tmp_path_factory.mktemp("qwen3next_parity")), cfg)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(4, 16))
    return hf, lm


def test_qwen3next_parity(qwen3next_pair):
    hf, lm = qwen3next_pair
    assert_parity(hf, lm, V)


# -- LFM2 (ShortConv hybrid) -------------------------------------------------


@pytest.fixture(scope="module")
def lfm2_pair(tmp_path_factory):
    from uzu_tpu.config.model import ShortConvConfig

    L = 3
    cfg_hf = transformers.Lfm2Config(
        vocab_size=V, hidden_size=D, intermediate_size=HID,
        num_hidden_layers=3, num_attention_heads=NH, num_key_value_heads=NG,
        max_position_embeddings=256, norm_eps=1e-5, rope_theta=10000.0,
        conv_L_cache=L, conv_bias=False, tie_word_embeddings=True,
        block_auto_adjust_ff_dim=False,
        full_attn_idxs=[2],  # layers 0-1 ShortConv, layer 2 attention
    )
    torch.manual_seed(5)
    hf = transformers.Lfm2ForCausalLM(cfg_hf).eval().to(torch.float32)
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().float().numpy()

    eps = 1e-5
    conv = ShortConvConfig(
        in_projection_config=LinearConfig(),
        conv_config=SeparableCausalConvConfig(has_biases=False),
        out_projection_config=LinearConfig(),
        kernel_size=L,
    )
    qk_norm = _rms(eps, upcast=UpcastMode.FULL_LAYER)
    rope = UnscaledRoPEConfig(base=10000.0, max_sequence_length=256, head_dim=DH)
    attn = AttentionConfig(
        qkv_projection_config=LinearConfig(),
        out_projection_config=LinearConfig(),
        query_norm_config=qk_norm, key_norm_config=qk_norm,
        num_heads=NH, num_groups=NG, head_dim=DH, is_causal=True,
        scale=None, sliding_window_size=None, logit_soft_cap=None,
        has_sinks=False, has_qkv_biases=False, has_out_biases=False,
        gate_projection_config=None, normalize_values=False,
        is_kv_sharing=False,
    )
    mlp = DenseMLPConfig(
        linear_config=LinearConfig(), activation=SiLU(alpha=1.0),
        has_up_biases=False, has_down_biases=False,
        gate_clipping=None, up_clipping=None,
    )
    layers = tuple(
        TransformerLayerConfig(
            pre_mixer_norm_config=_rms(eps),
            mixer_config=attn if i == 2 else conv,
            post_mixer_norm_config=None, pre_mlp_norm_config=_rms(eps),
            mlp_config=mlp, post_mlp_norm_config=None, hidden_dim=None,
            ple_config=None, has_post_layer_scalar=False,
            kv_source_layer_index=None,
            rope_config=rope if i == 2 else None,
        )
        for i in range(3)
    )
    cfg = LanguageModelConfig(
        decoder_config=DecoderConfig(
            embedding_config=TiedEmbeddingConfig(input_scale=None, logit_soft_cap=None),
            transformer_config=TransformerConfig(
                layer_configs=layers, output_norm_config=_rms(eps),
                model_dim=D, hidden_dim=HID),
            vocab_size=V, ple_model_config=None),
        generation_config=_gen_cfg())

    b = ModelBuilder(seed=0, dtype=np.float32)
    b.embedding("embedding", V, D, FP_IO, weights=t("model.embed_tokens.weight"))
    for i in range(3):
        p = f"transformer.layers.{i}"
        if i == 2:
            qkv = np.concatenate([
                t(f"model.layers.{i}.self_attn.q_proj.weight"),
                t(f"model.layers.{i}.self_attn.k_proj.weight"),
                t(f"model.layers.{i}.self_attn.v_proj.weight"),
            ], axis=0)
            b.linear(f"{p}.mixer.qkv_projection", D, qkv.shape[0], FP_OI, False, weights=qkv)
            b.linear(f"{p}.mixer.out_projection", NH * DH, D, FP_OI, False,
                     weights=t(f"model.layers.{i}.self_attn.out_proj.weight"))
            b.tensors[f"{p}.mixer.query_norm.scales"] = t(f"model.layers.{i}.self_attn.q_layernorm.weight")
            b.tensors[f"{p}.mixer.key_norm.scales"] = t(f"model.layers.{i}.self_attn.k_layernorm.weight")
        else:
            # HF in_proj rows are [B | C | x]; ours are [pre | post | x]
            # with y = conv(x * pre) * post — the same operator, same order
            b.linear(f"{p}.mixer.in_projection", D, 3 * D, FP_OI, False,
                     weights=t(f"model.layers.{i}.conv.in_proj.weight"))
            b.linear(f"{p}.mixer.out_projection", D, D, FP_OI, False,
                     weights=t(f"model.layers.{i}.conv.out_proj.weight"))
            b.tensors[f"{p}.mixer.conv.weights"] = t(f"model.layers.{i}.conv.conv.weight")[:, 0, :]
        # HF Lfm2MLP: w2(silu(w1 x) * w3 x) -> fused rows [up=w3 | gate=w1]
        up = np.concatenate([
            t(f"model.layers.{i}.feed_forward.w3.weight"),
            t(f"model.layers.{i}.feed_forward.w1.weight"),
        ], axis=0)
        b.linear(f"{p}.mlp.up_projection", D, 2 * HID, FP_OI, False, weights=up)
        b.linear(f"{p}.mlp.down_projection", HID, D, FP_OI, False,
                 weights=t(f"model.layers.{i}.feed_forward.w2.weight"))
        b.tensors[f"{p}.pre_mixer_norm.scales"] = t(f"model.layers.{i}.operator_norm.weight")
        b.tensors[f"{p}.pre_mlp_norm.scales"] = t(f"model.layers.{i}.ffn_norm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.embedding_norm.weight")
    d = b.write(str(tmp_path_factory.mktemp("lfm2_parity")), cfg)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(4, 16))
    return hf, lm


def test_lfm2_parity(lfm2_pair):
    hf, lm = lfm2_pair
    assert_parity(hf, lm, V)


# -- gpt-oss (MoE + sinks + alternating sliding window) ----------------------
# The reference ships gpt-oss-20b as a flagship (workspace/data/
# registry.json:84). HF's GptOss computes (up+1)*glu with up clamped to
# [-7, 7]; our config folds the "+1" into the up BIAS (a monotone shift), so
# the converter adds 1 to each up bias and the clip window becomes [-6, 8] —
# matching the reference kernels' plain act(gate)*up form
# (experts_two_pass_decode.metal:104-114).

GPTOSS_E, GPTOSS_K, GPTOSS_EHID = 8, 2, 96


@pytest.fixture(scope="module")
def gptoss_pair(tmp_path_factory):
    from uzu_tpu.tools.synth import gptoss_config

    cfg_hf = transformers.GptOssConfig(
        vocab_size=V, hidden_size=D, intermediate_size=GPTOSS_EHID,
        num_hidden_layers=2, num_attention_heads=NH, num_key_value_heads=NG,
        head_dim=DH, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=150000.0, tie_word_embeddings=False, attention_bias=True,
        num_local_experts=GPTOSS_E, num_experts_per_tok=GPTOSS_K,
        sliding_window=8, rope_scaling=None,
        layer_types=["sliding_attention", "full_attention"],
    )
    torch.manual_seed(7)
    hf = transformers.GptOssForCausalLM(cfg_hf).eval().to(torch.float32)
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().float().numpy()

    cfg = gptoss_config(
        num_layers=2, model_dim=D, num_heads=NH, num_groups=NG, head_dim=DH,
        vocab_size=V, num_experts=GPTOSS_E, num_active=GPTOSS_K,
        expert_hidden_dim=GPTOSS_EHID, sliding_window=8, max_seq=256,
        rope_base=150000.0,
    )

    b = ModelBuilder(seed=0, dtype=np.float32)
    b.embedding("input_embedding", V, D, FP_IO,
                weights=t("model.embed_tokens.weight"))
    b.embedding("output_embedding", V, D, FP_IO, weights=t("lm_head.weight"))
    for i in range(2):
        p = f"transformer.layers.{i}"
        h = f"model.layers.{i}"
        qkv = np.concatenate([
            t(f"{h}.self_attn.q_proj.weight"),
            t(f"{h}.self_attn.k_proj.weight"),
            t(f"{h}.self_attn.v_proj.weight"),
        ], axis=0)
        b.linear(f"{p}.mixer.qkv_projection", D, qkv.shape[0], FP_OI, False,
                 weights=qkv)
        b.tensors[f"{p}.mixer.qkv_projection.biases"] = np.concatenate([
            t(f"{h}.self_attn.q_proj.bias"),
            t(f"{h}.self_attn.k_proj.bias"),
            t(f"{h}.self_attn.v_proj.bias"),
        ])
        b.linear(f"{p}.mixer.out_projection", NH * DH, D, FP_OI, False,
                 weights=t(f"{h}.self_attn.o_proj.weight"))
        b.tensors[f"{p}.mixer.out_projection.biases"] = \
            t(f"{h}.self_attn.o_proj.bias")
        b.tensors[f"{p}.mixer.sinks"] = t(f"{h}.self_attn.sinks")

        b.linear(f"{p}.mlp.router", D, GPTOSS_E, FP_OI, False,
                 weights=t(f"{h}.mlp.router.weight"))
        b.tensors[f"{p}.mlp.router.biases"] = t(f"{h}.mlp.router.bias")
        # HF interleaves gate/up along the last axis of [E, D, 2I]; ours is
        # [E, 2I, D] with rows [up | gate]
        gu = t(f"{h}.mlp.experts.gate_up_proj")
        gate_w, up_w = gu[:, :, 0::2], gu[:, :, 1::2]
        b.tensors[f"{p}.mlp.experts.up_projection.weights.weights"] = \
            np.concatenate([up_w, gate_w], axis=2).transpose(0, 2, 1).copy()
        gub = t(f"{h}.mlp.experts.gate_up_proj_bias")
        gate_b, up_b = gub[:, 0::2], gub[:, 1::2] + 1.0  # fold the "+1"
        b.tensors[f"{p}.mlp.experts.up_projection.biases"] = \
            np.concatenate([up_b, gate_b], axis=1).copy()
        b.tensors[f"{p}.mlp.experts.down_projection.weights.weights"] = \
            t(f"{h}.mlp.experts.down_proj").transpose(0, 2, 1).copy()
        b.tensors[f"{p}.mlp.experts.down_projection.biases"] = \
            t(f"{h}.mlp.experts.down_proj_bias")

        b.tensors[f"{p}.pre_mixer_norm.scales"] = \
            t(f"{h}.input_layernorm.weight")
        b.tensors[f"{p}.pre_mlp_norm.scales"] = \
            t(f"{h}.post_attention_layernorm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.norm.weight")
    d = b.write(str(tmp_path_factory.mktemp("gptoss_parity")), cfg)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(4, 16))
    return hf, lm


def test_gptoss_parity(gptoss_pair):
    hf, lm = gptoss_pair
    assert_parity(hf, lm, V)


def test_gptoss_paged_and_speculative(gptoss_pair):
    """The composed family actually SERVES: paged continuous batching and
    chain speculation both reproduce the plain greedy stream on the
    MoE+sinks+windowed model."""
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine

    _, lm = gptoss_pair
    prompt = [3, 1, 4, 1, 5]
    want = lm.generate_list(np.asarray(prompt), 12, stop_token_ids=[])
    eng = SpeculativePagedBatchEngine(lm, batch_size=2, draft_block=4,
                                      num_pages=16, page_size=16,
                                      stop_token_ids=[])
    r1 = eng.submit(prompt, 12)
    r2 = eng.submit(prompt, 12)
    eng.run()
    assert r1.tokens == want
    assert r2.tokens == want


# -- Quantized parity --------------------------------------------------------


def test_int8_parity_vs_hf_dequantized(tmp_path):
    """Quantization pipeline end-to-end: our engine running INT8 weights vs
    HF Llama whose weights are replaced with the DEQUANTIZED values — the
    only difference left is kernel arithmetic, so tolerances stay tight."""
    from uzu_tpu.quant.format import quantize_reference

    HID = 160  # all quantized input dims must be group_size-divisible

    cfg_hf = transformers.LlamaConfig(
        vocab_size=V, hidden_size=D, intermediate_size=HID,
        num_hidden_layers=2, num_attention_heads=NH, num_key_value_heads=NG,
        head_dim=DH, max_position_embeddings=256, rms_norm_eps=1e-5,
        rope_theta=10000.0, tie_word_embeddings=True, attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(4)
    hf = transformers.LlamaForCausalLM(cfg_hf).eval().to(torch.float32)
    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().float().numpy()

    spec = IntSpec(bits=8, group_size=32, is_symmetric=True, layout=Layout.OUTPUT_INPUT)

    def dequant(w):
        # symmetric 8-bit: offset-binary codes, w ~ (code - 128) * scale
        parts = quantize_reference(w, 8, 32, "scale_symmetric", dtype=np.float32)
        codes = parts["weights"].astype(np.float32)  # [N, K] for 8-bit
        scales = np.repeat(parts["scales"].astype(np.float32), 32, axis=-1)[:, : w.shape[1]]
        return (codes - 128.0) * scales

    cfg = llama_config(num_layers=2, model_dim=D, hidden_dim=HID, num_heads=NH,
                       num_groups=NG, head_dim=DH, vocab_size=V, max_seq=256,
                       rope_base=10000.0, tied=True)
    b = ModelBuilder(seed=0, dtype=np.float32)
    b.embedding("embedding", V, D, FP_IO, weights=t("model.embed_tokens.weight"))
    with torch.no_grad():
        for i in range(2):
            p = f"transformer.layers.{i}"
            qkv = np.concatenate([
                t(f"model.layers.{i}.self_attn.q_proj.weight"),
                t(f"model.layers.{i}.self_attn.k_proj.weight"),
                t(f"model.layers.{i}.self_attn.v_proj.weight"),
            ], axis=0)
            b.linear(f"{p}.mixer.qkv_projection", D, qkv.shape[0], spec, False, weights=qkv)
            dq = dequant(qkv)
            nq = NH * DH
            sd_t = hf.model.layers[i].self_attn
            sd_t.q_proj.weight.copy_(torch.tensor(dq[:nq]))
            sd_t.k_proj.weight.copy_(torch.tensor(dq[nq : nq + NG * DH]))
            sd_t.v_proj.weight.copy_(torch.tensor(dq[nq + NG * DH :]))
            o = t(f"model.layers.{i}.self_attn.o_proj.weight")
            b.linear(f"{p}.mixer.out_projection", NH * DH, D, spec, False, weights=o)
            sd_t.o_proj.weight.copy_(torch.tensor(dequant(o)))
            up = np.concatenate([
                t(f"model.layers.{i}.mlp.up_proj.weight"),
                t(f"model.layers.{i}.mlp.gate_proj.weight"),
            ], axis=0)
            b.linear(f"{p}.mlp.up_projection", D, 2 * HID, spec, False, weights=up)
            dqu = dequant(up)
            hf.model.layers[i].mlp.up_proj.weight.copy_(torch.tensor(dqu[:HID]))
            hf.model.layers[i].mlp.gate_proj.weight.copy_(torch.tensor(dqu[HID:]))
            dn = t(f"model.layers.{i}.mlp.down_proj.weight")
            b.linear(f"{p}.mlp.down_projection", HID, D, spec, False, weights=dn)
            hf.model.layers[i].mlp.down_proj.weight.copy_(torch.tensor(dequant(dn)))
            b.tensors[f"{p}.pre_mixer_norm.scales"] = t(f"model.layers.{i}.input_layernorm.weight")
            b.tensors[f"{p}.pre_mlp_norm.scales"] = t(f"model.layers.{i}.post_attention_layernorm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.norm.weight")
    d = b.write(str(tmp_path / "int8_parity"), cfg)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(4, 16))
    assert_parity(hf, lm, V, n=12)

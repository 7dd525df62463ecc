"""Source-of-truth parity: our engine vs HuggingFace transformers Llama.

This is the analogue of the reference's traceable-computation discipline
(uzu ships per-layer activation traces from a source-of-truth implementation;
README.md:11-17, storage download_contents.rs:5-33): the same weights are
loaded into a torch LlamaForCausalLM (f32, eager attention) and into our
engine, and logits must match tightly at every position.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from uzu_tpu import LanguageModel  # noqa: E402
from uzu_tpu.tools.synth import ModelBuilder, llama_config  # noqa: E402
from uzu_tpu.config.model import FullPrecisionSpec, Layout  # noqa: E402

D, HID, NH, NG, DH, V, LAYERS = 64, 176, 4, 2, 16, 96, 2


@pytest.fixture(scope="module")
def hf_and_ours(tmp_path_factory):
    cfg_hf = transformers.LlamaConfig(
        vocab_size=V,
        hidden_size=D,
        intermediate_size=HID,
        num_hidden_layers=LAYERS,
        num_attention_heads=NH,
        num_key_value_heads=NG,
        head_dim=DH,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=True,
        attention_bias=False,
        mlp_bias=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(cfg_hf).eval().to(torch.float32)

    sd = hf.state_dict()

    def t(name):
        return sd[name].detach().numpy().astype(np.float32)

    cfg = llama_config(
        num_layers=LAYERS,
        model_dim=D,
        hidden_dim=HID,
        num_heads=NH,
        num_groups=NG,
        head_dim=DH,
        vocab_size=V,
        max_seq=256,
        rope_base=10000.0,
        tied=True,
    )
    b = ModelBuilder(seed=0, dtype=np.float32)
    fp_oi = FullPrecisionSpec(layout=Layout.OUTPUT_INPUT)
    fp_io = FullPrecisionSpec(layout=Layout.INPUT_OUTPUT)
    b.embedding("embedding", V, D, fp_io, weights=t("model.embed_tokens.weight"))
    for i in range(LAYERS):
        p = f"transformer.layers.{i}"
        qkv = np.concatenate(
            [
                t(f"model.layers.{i}.self_attn.q_proj.weight"),
                t(f"model.layers.{i}.self_attn.k_proj.weight"),
                t(f"model.layers.{i}.self_attn.v_proj.weight"),
            ],
            axis=0,
        )
        b.linear(f"{p}.mixer.qkv_projection", D, qkv.shape[0], fp_oi, False, weights=qkv)
        b.linear(
            f"{p}.mixer.out_projection", NH * DH, D, fp_oi, False,
            weights=t(f"model.layers.{i}.self_attn.o_proj.weight"),
        )
        up = np.concatenate(
            [t(f"model.layers.{i}.mlp.up_proj.weight"), t(f"model.layers.{i}.mlp.gate_proj.weight")],
            axis=0,
        )  # fused rows [up | gate]
        b.linear(f"{p}.mlp.up_projection", D, 2 * HID, fp_oi, False, weights=up)
        b.linear(
            f"{p}.mlp.down_projection", HID, D, fp_oi, False,
            weights=t(f"model.layers.{i}.mlp.down_proj.weight"),
        )
        b.tensors[f"{p}.pre_mixer_norm.scales"] = t(f"model.layers.{i}.input_layernorm.weight")
        b.tensors[f"{p}.pre_mlp_norm.scales"] = t(f"model.layers.{i}.post_attention_layernorm.weight")
    b.tensors["transformer.output_norm.scales"] = t("model.norm.weight")
    d = b.write(str(tmp_path_factory.mktemp("hf_parity")), cfg)

    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(4, 8, 16))
    return hf, lm


def hf_logits(hf, tokens):
    with torch.no_grad():
        out = hf(torch.tensor(tokens, dtype=torch.long)[None, :])
    return out.logits[0].numpy()


def test_prefill_logits_match(hf_and_ours):
    hf, lm = hf_and_ours
    tokens = (np.arange(12) * 11) % V
    ref = hf_logits(hf, tokens)  # [S, V]

    # drive our engine token-at-a-time to collect per-position logits
    state = lm.new_state()
    ours = []
    for tok in tokens:
        logits, state = lm.prefill(state, np.array([tok]))
        ours.append(np.asarray(logits))
    ours = np.stack(ours)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-3)


def test_chunked_prefill_last_logits_match(hf_and_ours):
    hf, lm = hf_and_ours
    tokens = (np.arange(23) * 5 + 1) % V
    ref = hf_logits(hf, tokens)[-1]
    logits, _ = lm.prefill(lm.new_state(), tokens)
    np.testing.assert_allclose(np.asarray(logits), ref, rtol=2e-3, atol=2e-3)


def test_greedy_continuation_matches(hf_and_ours):
    hf, lm = hf_and_ours
    prompt = np.array([3, 17, 42, 9])
    ours = lm.generate_list(prompt, 8, stop_token_ids=[])

    seq = list(prompt)
    hf_out = []
    for _ in range(8):
        nxt = int(np.argmax(hf_logits(hf, np.array(seq))[-1]))
        hf_out.append(nxt)
        seq.append(nxt)
    assert ours == hf_out

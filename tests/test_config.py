"""Config serde tests: strictness, tagged unions, round-trip."""

import json

import pytest

from uzu_tpu.config import (
    ConfigError,
    LanguageModelConfig,
    Layout,
    parse,
    dump,
)
from uzu_tpu.config.serde import Family
from uzu_tpu.config.model import AttentionConfig, IntSpec, LlamaRoPEConfig
from uzu_tpu.tools.synth import llama_config, qwen3_config


def test_roundtrip_llama():
    cfg = llama_config()
    data = dump(cfg)
    cfg2 = parse(LanguageModelConfig, data)
    assert cfg2 == cfg


def test_roundtrip_qwen3():
    cfg = qwen3_config()
    assert parse(LanguageModelConfig, dump(cfg)) == cfg


def test_tagged_union_dispatch():
    spec = parse(
        Family["WeightMatrixSpec"],
        {"type": "IntSpec", "bits": 4, "group_size": 32, "is_symmetric": True, "layout": "output_input"},
    )
    assert isinstance(spec, IntSpec)
    assert spec.layout == Layout.OUTPUT_INPUT
    assert dump(spec)["type"] == "IntSpec"


def test_unknown_field_rejected():
    with pytest.raises(ConfigError, match="unknown fields"):
        parse(
            Family["WeightMatrixSpec"],
            {"type": "IntSpec", "bits": 4, "group_size": 32, "is_symmetric": True,
             "layout": "output_input", "bogus": 1},
        )


def test_missing_required_field_rejected():
    with pytest.raises(ConfigError, match="missing required"):
        parse(Family["WeightMatrixSpec"], {"type": "IntSpec", "bits": 4})


def test_unknown_variant_rejected():
    with pytest.raises(ConfigError, match="unknown WeightMatrixSpec variant"):
        parse(Family["WeightMatrixSpec"], {"type": "Nope"})


def test_optional_fields_allow_null_and_missing():
    rope = parse(
        Family["RoPEConfig"],
        {
            "type": "LlamaRoPEConfig",
            "base": 500000.0,
            "max_sequence_length": 8192,
            "head_dim": 64,
            "scaling_factor": 8.0,
            "original_context_length": 8192,
            "low_frequency_factor": 1.0,
            "high_frequency_factor": 4.0,
        },
    )
    assert isinstance(rope, LlamaRoPEConfig)


def test_attention_config_from_json():
    raw = {
        "type": "AttentionConfig",
        "qkv_projection_config": {},
        "out_projection_config": {},
        "query_norm_config": None,
        "key_norm_config": None,
        "num_heads": 8,
        "num_groups": 2,
        "head_dim": 64,
        "is_causal": True,
        "scale": None,
        "sliding_window_size": 512,
        "logit_soft_cap": None,
        "has_sinks": False,
        "has_qkv_biases": False,
        "has_out_biases": False,
        "gate_projection_config": None,
        "normalize_values": False,
        "is_kv_sharing": False,
    }
    cfg = parse(Family["TokenMixerConfig"], raw)
    assert isinstance(cfg, AttentionConfig)
    assert cfg.sliding_window_size == 512
    assert json.dumps(dump(cfg))  # serializable

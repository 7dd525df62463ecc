"""Build the model parameter pytree from config + safetensors tree.

Tensor names, shapes and dtypes mirror the reference's loading exactly so
that uzu-exported model directories load unchanged:
- linear: crates/backend-uzu/src/encodable_block/linear/{mod.rs:61-180,
  matmul.rs:94-194} — spec in safetensors metadata "<prefix>.weights.spec",
  full precision at "<prefix>.weights.weights" [N,K], quantized codes at
  "<prefix>.weights.weights" [N,K/pack] u8 + scales/biases/zero_points;
- attention: encodable_block/mixer/attention/mod.rs:80-232 (fused qkv rows
  [q|k|v], gate projection, sinks [H], query_norm.scales/key_norm.scales
  [Dh] f32);
- mlp: encodable_block/mlp/mod.rs:40-79 (fused up rows [up|gate],
  down_projection);
- norms: encodable_block/normalization.rs ("scales" [D] f32 + "biases");
- embedding: encodable_block/embedding.rs:130-520 (tied "embedding" /
  untied "input_embedding"+"output_embedding", full or quantized);
- layer tree: encodable_block/transformer.rs + decoder.rs
  ("transformer.layers.<i>.{mixer,pre_mixer_norm,...}", "output_norm",
  "post_layer_scalar").

The params pytree is a nested dict of jax arrays / QuantizedTensor leaves;
everything static lives in the config objects.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
import ml_dtypes

from ..config.model import (
    AttentionConfig,
    DecoderConfig,
    DenseMLPConfig,
    FullPrecisionSpec,
    HybridSpec,
    IncoherenceProcessingMode,
    IntSpec,
    Layout,
    LowRankSpec,
    MLXSpec,
    MixtureOfExpertsConfig,
    NormalizationConfig,
    TiedEmbeddingConfig,
    UntiedEmbeddingConfig,
)
from ..params.tree import ParameterError, ParameterTree
from ..quant.format import HybridLinear, from_disk_tensors

_FLOAT_DTYPES = {
    np.dtype(ml_dtypes.bfloat16),
    np.dtype(np.float32),
    np.dtype(np.float16),
}


def _weights_dtype(tree: ParameterTree, leaf: str) -> np.dtype:
    dt = tree.leaf_info(leaf).dtype
    if dt not in _FLOAT_DTYPES:
        raise ParameterError(f"unsupported float dtype {dt}")
    return dt


def load_linear(tree: ParameterTree, input_dim: int, output_dim: int, has_biases: bool) -> dict:
    """Load one linear (full-precision or quantized) at `tree`."""
    spec = tree.spec("weights")
    weights_tree = tree.subtree("weights")
    out: dict = {}
    if isinstance(spec, FullPrecisionSpec):
        if spec.layout != Layout.OUTPUT_INPUT:
            raise ParameterError(f"unsupported linear layout {spec.layout}")
        dt = _weights_dtype(weights_tree, "weights")
        out["w"] = jnp.asarray(weights_tree.leaf("weights", (output_dim, input_dim), dt))
    elif isinstance(spec, (IntSpec, MLXSpec)):
        out["w"] = _load_quantized(spec, weights_tree, input_dim, output_dim)
    elif isinstance(spec, HybridSpec):
        out["w"] = _load_hybrid(spec, weights_tree, input_dim, output_dim, has_biases)
    else:
        raise ParameterError(f"unsupported weight spec {type(spec).__name__}")
    if has_biases:
        dt = tree.leaf_info("biases").dtype
        out["b"] = jnp.asarray(tree.leaf("biases", (output_dim,), dt))
    return out


def _load_quantized(spec, weights_tree: ParameterTree, input_dim: int, output_dim: int):
    if isinstance(spec, MLXSpec):
        method = "scale_bias"
        bits, group = spec.bits, spec.group_size
        layout = spec.layout
    else:
        method = "scale_symmetric" if spec.is_symmetric else "scale_zero_point"
        bits, group = spec.bits, spec.group_size
        layout = spec.layout
    if layout != Layout.OUTPUT_INPUT:
        raise ParameterError(f"unsupported quantized layout {layout}")
    if bits not in (4, 8):
        raise ParameterError(f"unsupported bits={bits}")
    pack = 8 // bits
    kg = -(-input_dim // group)
    dt = _weights_dtype(weights_tree, "scales")
    codes = weights_tree.leaf("weights", (output_dim, input_dim // pack), np.uint8)
    scales = weights_tree.leaf("scales", (output_dim, kg), dt)
    zero_points = biases = None
    if method == "scale_bias":
        biases = weights_tree.leaf("biases", (output_dim, kg), dt)
    elif method == "scale_zero_point":
        zero_points = weights_tree.leaf("zero_points", (output_dim, -(-kg // pack)), np.uint8)
    return from_disk_tensors(
        method,
        codes,
        scales,
        bits,
        group,
        zero_points=zero_points,
        biases=biases,
        dtype=jnp.dtype(dt),
    )


def load_norm(tree: ParameterTree, dim: int, cfg: NormalizationConfig) -> dict:
    out = {"scales": jnp.asarray(tree.leaf("scales", (dim,), np.float32))}
    if cfg.has_biases:
        out["biases"] = jnp.asarray(tree.leaf("biases", (dim,), np.float32))
    return out


def load_embedding(tree: ParameterTree, cfg, vocab_size: int, model_dim: int) -> dict:
    """Tied or untied embedding (full precision or quantized)."""

    def load_one(sub: ParameterTree):
        spec = sub.spec(name=None)
        if isinstance(spec, FullPrecisionSpec):
            dt = _weights_dtype(sub, "weights")
            return jnp.asarray(sub.leaf("weights", (vocab_size, model_dim), dt))
        if isinstance(spec, (IntSpec, MLXSpec)):
            return _load_quantized(spec, sub, model_dim, vocab_size)
        raise ParameterError(f"unsupported embedding spec {type(spec).__name__}")

    if isinstance(cfg, TiedEmbeddingConfig):
        sub = tree.subtree("embedding")
        return {"tied": load_one(sub)}
    if isinstance(cfg, UntiedEmbeddingConfig):
        return {
            "input": load_one(tree.subtree("input_embedding")),
            "output": load_one(tree.subtree("output_embedding")),
        }
    raise ParameterError(f"unsupported embedding config {type(cfg).__name__}")


def load_attention(tree: ParameterTree, cfg: AttentionConfig, model_dim: int) -> dict:
    q_dim = cfg.num_heads * cfg.head_dim
    if cfg.is_kv_sharing:
        qkv_out = q_dim
    else:
        qkv_out = q_dim + 2 * cfg.num_groups * cfg.head_dim
    out = {
        "qkv": load_linear(tree.subtree("qkv_projection"), model_dim, qkv_out, cfg.has_qkv_biases),
        "out": load_linear(tree.subtree("out_projection"), q_dim, model_dim, cfg.has_out_biases),
    }
    if cfg.gate_projection_config is not None:
        out["gate"] = load_linear(tree.subtree("gate_projection"), model_dim, q_dim, False)
    if cfg.query_norm_config is not None:
        out["q_norm_scales"] = jnp.asarray(tree.leaf("query_norm.scales", (cfg.head_dim,), np.float32))
    if cfg.key_norm_config is not None and not cfg.is_kv_sharing:
        out["k_norm_scales"] = jnp.asarray(tree.leaf("key_norm.scales", (cfg.head_dim,), np.float32))
    if cfg.has_sinks:
        dt = tree.leaf_info("sinks").dtype
        out["sinks"] = jnp.asarray(tree.leaf("sinks", (cfg.num_heads,), dt))
    return out


def load_mlp(tree: ParameterTree, cfg, model_dim: int, hidden_dim: int) -> dict:
    if isinstance(cfg, DenseMLPConfig):
        return {
            "up": load_linear(tree.subtree("up_projection"), model_dim, 2 * hidden_dim, cfg.has_up_biases),
            "down": load_linear(tree.subtree("down_projection"), hidden_dim, model_dim, cfg.has_down_biases),
        }
    if isinstance(cfg, MixtureOfExpertsConfig):
        from .moe import load_moe

        return load_moe(tree, cfg, model_dim)
    raise ParameterError(f"unsupported mlp config {type(cfg).__name__}")


def load_layer(tree: ParameterTree, layer_cfg, model_dim: int, hidden_dim: int) -> dict:
    out: dict = {}
    mixer_cfg = layer_cfg.mixer_config
    mixer_tree = tree.subtree("mixer")
    if isinstance(mixer_cfg, AttentionConfig):
        out["mixer"] = load_attention(mixer_tree, mixer_cfg, model_dim)
    else:
        from .ssm import load_ssm_mixer

        out["mixer"] = load_ssm_mixer(mixer_tree, mixer_cfg, model_dim)
    if layer_cfg.pre_mixer_norm_config is not None:
        out["pre_mixer_norm"] = load_norm(tree.subtree("pre_mixer_norm"), model_dim, layer_cfg.pre_mixer_norm_config)
    if layer_cfg.post_mixer_norm_config is not None:
        out["post_mixer_norm"] = load_norm(
            tree.subtree("post_mixer_norm"), model_dim, layer_cfg.post_mixer_norm_config
        )
    out["pre_mlp_norm"] = load_norm(tree.subtree("pre_mlp_norm"), model_dim, layer_cfg.pre_mlp_norm_config)
    out["mlp"] = load_mlp(tree.subtree("mlp"), layer_cfg.mlp_config, model_dim, layer_cfg.hidden_dim or hidden_dim)
    if layer_cfg.post_mlp_norm_config is not None:
        out["post_mlp_norm"] = load_norm(tree.subtree("post_mlp_norm"), model_dim, layer_cfg.post_mlp_norm_config)
    if layer_cfg.has_post_layer_scalar:
        dt = tree.leaf_info("post_layer_scalar").dtype
        out["post_layer_scalar"] = jnp.asarray(tree.leaf("post_layer_scalar", (1,), dt)).astype(jnp.float32)
    if layer_cfg.ple_config is not None:
        from .ple import load_ple_layer

        out["ple"] = load_ple_layer(tree, layer_cfg.ple_config, model_dim)
    return out


def load_decoder(tree: ParameterTree, cfg: DecoderConfig) -> dict:
    tcfg = cfg.transformer_config
    model_dim = tcfg.model_dim
    params: dict = {
        "embedding": load_embedding(tree, cfg.embedding_config, cfg.vocab_size, model_dim),
        "layers": [
            load_layer(tree.subtree(f"transformer.layers.{i}"), layer_cfg, model_dim, tcfg.hidden_dim)
            for i, layer_cfg in enumerate(tcfg.layer_configs)
        ],
        "output_norm": load_norm(tree.subtree("transformer.output_norm"), model_dim, tcfg.output_norm_config),
    }
    if cfg.ple_model_config is not None:
        from .ple import load_ple

        params["per_layer_embedding"] = load_ple(tree, cfg, tcfg)
    return params


def _load_hybrid(spec: HybridSpec, weights_tree: ParameterTree, input_dim: int, output_dim: int,
                 has_biases: bool) -> HybridLinear:
    """HybridSpec: quantized base under "quantized", optional LowRank adapter
    under "adapter", optional incoherence signs (linear/{qlora_wrapper.rs:
    80-101, 199-207; rht_wrapper.rs:109-131})."""
    base_spec = spec.quantization_spec
    if not isinstance(base_spec, (IntSpec, MLXSpec)):
        raise ParameterError(f"unsupported hybrid base {type(base_spec).__name__}")
    base = _load_quantized(base_spec, weights_tree.subtree("quantized"), input_dim, output_dim)

    adapter_down = adapter_up = None
    if spec.adapter_spec is not None:
        if has_biases:
            raise ParameterError("QLoRA linear with biases is not supported")
        if not isinstance(spec.adapter_spec, LowRankSpec):
            raise ParameterError(f"unsupported adapter {type(spec.adapter_spec).__name__}")
        rank = spec.adapter_spec.rank
        dt = _weights_dtype(weights_tree, "adapter.down_projection")
        adapter_down = jnp.asarray(weights_tree.leaf("adapter.down_projection", (rank, input_dim), dt))
        adapter_up = jnp.asarray(weights_tree.leaf("adapter.up_projection", (output_dim, rank), dt))

    input_signs = output_signs = None
    if spec.incoherence_block_size is not None:
        if spec.incoherence_block_size != 32:
            raise ParameterError(f"unsupported incoherence block {spec.incoherence_block_size}")
        if spec.incoherence_processing_mode != IncoherenceProcessingMode.INPUT_OUTPUT:
            raise ParameterError(f"unsupported incoherence mode {spec.incoherence_processing_mode}")
        input_signs = jnp.asarray(
            weights_tree.leaf("incoherence_signs.input_signs", (input_dim,), np.int32)
        ).astype(jnp.float32)
        output_signs = jnp.asarray(
            weights_tree.leaf("incoherence_signs.output_signs", (output_dim,), np.int32)
        ).astype(jnp.float32)

    return HybridLinear(
        base=base,
        adapter_down=adapter_down,
        adapter_up=adapter_up,
        input_signs=input_signs,
        output_signs=output_signs,
    )

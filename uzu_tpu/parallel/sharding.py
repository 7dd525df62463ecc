"""Tensor-parallel partition specs for decoder params and KV state.

Megatron-style head/hidden sharding expressed as GSPMD annotations
(NamedSharding), not hand-written collectives — XLA places the all-reduce
after the out/down projections automatically:

- qkv_projection  [N_qkv, K]  : rows (heads)        -> P(tp, None)
- out_projection  [D, N_q]    : columns (heads)     -> P(None, tp)
- mlp up (fused up|gate) [2H, D]: rows              -> P(tp, None)
- mlp down        [D, H]      : columns             -> P(None, tp)
- KV cache        [C, G, Dh]  : kv-head dim         -> P(None, tp, None)
- norms / biases of column-sharded linears / embeddings: replicated

A QuantizedTensor is sharded with ONE spec applied to all of its leaves
(codes [N, K/pack], scales [N, Kg], qbias [N, Kg]) — valid for both row
(dim 0) and column (dim 1) sharding since every leaf keeps the [N, K-like]
layout. jax.device_put treats the spec tree as a pytree prefix.

The fused-QKV row sharding requires tp | num_heads and tp | num_groups; the
fused up|gate sharding requires the [up|gate] halves to split evenly, which
holds because each half is H rows and tp | H. `validate_tp` checks these.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.model import (
    AttentionConfig,
    DecoderConfig,
    DeltaNetConfig,
    DenseMLPConfig,
    Mamba2Config,
    MixtureOfExpertsConfig,
    ShortConvConfig,
    TransformerLayerConfig,
)
from .mesh import TP_AXIS, tp_size


def _ns(mesh: Mesh, *spec) -> NamedSharding:
    return NamedSharding(mesh, P(*spec))


def validate_tp(cfg: DecoderConfig, tp: int) -> None:
    tcfg = cfg.transformer_config
    for i, lc in enumerate(tcfg.layer_configs):
        m = lc.mixer_config
        if isinstance(m, AttentionConfig):
            if m.num_heads % tp or m.num_groups % tp:
                raise ValueError(
                    f"layer {i}: tp={tp} must divide num_heads={m.num_heads} "
                    f"and num_groups={m.num_groups}"
                )
        mlp = lc.mlp_config
        hid = lc.hidden_dim or tcfg.hidden_dim
        if isinstance(mlp, DenseMLPConfig) and hid % tp:
            raise ValueError(f"layer {i}: tp={tp} must divide hidden_dim={hid}")
        if isinstance(mlp, MixtureOfExpertsConfig) and mlp.expert_hidden_dim % tp:
            raise ValueError(
                f"layer {i}: tp={tp} must divide expert_hidden_dim={mlp.expert_hidden_dim}"
            )


def _hybrid_specs(w, mesh: Mesh, *, shard_rows: bool):
    """Spec tree for a HybridLinear (QLoRA/RHT) — same Megatron split as a
    plain linear, applied leaf-wise. Row shard (output dim N): base rows +
    adapter_up rows + output_signs; the input side (adapter_down,
    input_signs) is replicated. Column shard (input dim K): base columns +
    adapter_down columns + input_signs; output side replicated. The RHT
    couples 32-blocks along the sharded dim — GSPMD keeps blocks local when
    32 | N/tp (resp. K/tp), which holds for every supported head/hidden
    size, and falls back to a reshard (still correct) otherwise."""
    from ..quant.format import HybridLinear

    if shard_rows:
        return HybridLinear(
            base=_ns(mesh, TP_AXIS, None),
            adapter_down=None if w.adapter_down is None else _ns(mesh),
            adapter_up=None if w.adapter_up is None else _ns(mesh, TP_AXIS, None),
            input_signs=None if w.input_signs is None else _ns(mesh),
            output_signs=None if w.output_signs is None else _ns(mesh, TP_AXIS),
        )
    return HybridLinear(
        base=_ns(mesh, None, TP_AXIS),
        adapter_down=None if w.adapter_down is None else _ns(mesh, None, TP_AXIS),
        adapter_up=None if w.adapter_up is None else _ns(mesh),
        input_signs=None if w.input_signs is None else _ns(mesh, TP_AXIS),
        output_signs=None if w.output_signs is None else _ns(mesh),
    )


def _linear_specs(p: dict, mesh: Mesh, *, shard_rows: bool) -> dict:
    from ..quant.format import HybridLinear

    if isinstance(p.get("w"), HybridLinear):
        out = {"w": _hybrid_specs(p["w"], mesh, shard_rows=shard_rows)}
        if "b" in p:
            out["b"] = _ns(mesh, TP_AXIS) if shard_rows else _ns(mesh)
        return out
    out = {"w": _ns(mesh, TP_AXIS, None) if shard_rows else _ns(mesh, None, TP_AXIS)}
    if "b" in p:
        # row-sharded linear => output dim sharded => bias sharded;
        # column-sharded linear => full-size (post-all-reduce) bias.
        out["b"] = _ns(mesh, TP_AXIS) if shard_rows else _ns(mesh)
    return out


def _attention_specs(p: dict, mesh: Mesh) -> dict:
    out = {
        "qkv": _linear_specs(p["qkv"], mesh, shard_rows=True),
        "out": _linear_specs(p["out"], mesh, shard_rows=False),
    }
    if "gate" in p:
        out["gate"] = _linear_specs(p["gate"], mesh, shard_rows=True)
    for k in ("q_norm_scales", "k_norm_scales", "v_norm_scales"):
        if k in p:
            out[k] = _ns(mesh)
    if "sinks" in p:
        out["sinks"] = _ns(mesh, TP_AXIS)
    return out


def _mlp_specs(cfg, p: dict, mesh: Mesh) -> dict:
    if isinstance(cfg, DenseMLPConfig):
        return {
            "up": _linear_specs(p["up"], mesh, shard_rows=True),
            "down": _linear_specs(p["down"], mesh, shard_rows=False),
        }
    if isinstance(cfg, MixtureOfExpertsConfig):
        from ..quant.format import StackedQuantized

        # experts keep per-expert leading dim; shard each expert's hidden
        # dim. Quantized expert stacks REPLICATE for now: sharding the
        # hidden dim of packed codes must split on group boundaries for
        # codes AND scale planes simultaneously (EP still shards them on
        # the expert dim, which is group-agnostic).
        if isinstance(p["up"]["w"], StackedQuantized):
            up_spec = down_spec = _ns(mesh)
        else:
            up_spec = _ns(mesh, None, TP_AXIS, None)
            down_spec = _ns(mesh, None, None, TP_AXIS)
        out = {
            "router": _linear_specs(p["router"], mesh, shard_rows=False) | {"w": _ns(mesh)},
            "up": {"w": up_spec},
            "down": {"w": down_spec},
        }
        if "b" in p["up"]:
            out["up"]["b"] = (_ns(mesh)
                              if isinstance(p["up"]["w"], StackedQuantized)
                              else _ns(mesh, None, TP_AXIS))
        if "b" in p["down"]:
            out["down"]["b"] = _ns(mesh)
        if "shared" in p:
            out["shared"] = {
                "up": _linear_specs(p["shared"]["up"], mesh, shard_rows=True),
                "down": _linear_specs(p["shared"]["down"], mesh, shard_rows=False),
            }
        if "gate" in p:
            out["gate"] = _linear_specs(p["gate"], mesh, shard_rows=True)
        return out
    raise ValueError(f"unsupported mlp config {type(cfg).__name__}")


def _replicate_tree(p, mesh: Mesh):
    return jax.tree.map(
        lambda _: _ns(mesh),
        p,
        is_leaf=lambda x: not isinstance(x, (dict, list, tuple)),
    )


def _ssm_specs(p: dict, mesh: Mesh) -> dict:
    """Recurrent mixers (Mamba2/GDN/ShortConv): Megatron split over the
    inner channel/head dim. The fused in-projection rows (sections
    [q|k|v|z|beta|a] for GDN, [conv_in|z|dt] for Mamba2, [pre|post|x] for
    ShortConv) shard like the fused QKV does — GSPMD re-aligns the section
    slices; the depthwise conv is per-channel so conv_w rows co-shard; the
    out-projection reduces over the inner dim (column shard, all-reduce
    after). Small per-head vectors (a_log/dt_bias/gate_bias/skip_weight/
    norm_scales) are replicated."""
    out = {
        "in": _linear_specs(p["in"], mesh, shard_rows=True),
        "out": _linear_specs(p["out"], mesh, shard_rows=False),
        "conv_w": _ns(mesh, TP_AXIS, None),
    }
    if "conv_b" in p:
        out["conv_b"] = _ns(mesh, TP_AXIS)
    for k in ("gate_bias", "skip_weight", "a_log", "dt_bias", "norm_scales"):
        if k in p:
            out[k] = _ns(mesh)
    return out


def _layer_specs(layer_cfg: TransformerLayerConfig, p: dict, mesh: Mesh) -> dict:
    out: dict = {}
    m = layer_cfg.mixer_config
    if isinstance(m, AttentionConfig):
        out["mixer"] = _attention_specs(p["mixer"], mesh)
    elif isinstance(m, (Mamba2Config, DeltaNetConfig, ShortConvConfig)):
        out["mixer"] = _ssm_specs(p["mixer"], mesh)
    else:
        out["mixer"] = _replicate_tree(p["mixer"], mesh)
    out["mlp"] = _mlp_specs(layer_cfg.mlp_config, p["mlp"], mesh)
    for k in (
        "pre_mixer_norm",
        "post_mixer_norm",
        "pre_mlp_norm",
        "post_mlp_norm",
        "post_layer_scalar",
        "ple",
    ):
        if k in p:
            out[k] = _replicate_tree(p[k], mesh)
    return out


def decoder_param_specs(cfg: DecoderConfig, params: dict, mesh: Mesh) -> dict:
    """Build a sharding tree (pytree prefix of `params`) for jax.device_put."""
    specs: dict = {
        "embedding": _replicate_tree(params["embedding"], mesh),
        "layers": [
            _layer_specs(lc, params["layers"][i], mesh)
            for i, lc in enumerate(cfg.transformer_config.layer_configs)
        ],
        "output_norm": _replicate_tree(params["output_norm"], mesh),
    }
    if "per_layer_embedding" in params:
        specs["per_layer_embedding"] = _replicate_tree(params["per_layer_embedding"], mesh)
    return specs


def shard_decoder_params(cfg: DecoderConfig, params: dict, mesh: Mesh) -> dict:
    validate_tp(cfg, tp_size(mesh))
    specs = decoder_param_specs(cfg, params, mesh)
    return jax.device_put(params, specs)


def state_specs(cfg: DecoderConfig, state: dict, mesh: Mesh, *, batched: bool = False) -> dict:
    """Sharding tree for the decoding state: KV kv-head dim over tp, leading
    batch dim (if batched) over dp."""
    lead = ("dp",) if batched else ()
    layers = []
    for layer_state, lc in zip(state["layers"], cfg.transformer_config.layer_configs):
        if layer_state is None:
            layers.append(None)
        elif isinstance(lc.mixer_config, AttentionConfig):
            # k/v/k_q/v_q [C, G, Dh] -> kv-head dim over tp; scales [C, G]
            # likewise; ring position array [C] replicated over tp
            def kv_spec(arr):
                if arr.ndim - len(lead) == 3:
                    return _ns(mesh, *lead, None, TP_AXIS, None)
                if arr.ndim - len(lead) == 2:
                    return _ns(mesh, *lead, None, TP_AXIS)
                return _ns(mesh, *lead, None)

            layers.append({k: kv_spec(v) for k, v in layer_state.items()})
        else:
            # recurrent state co-shards with the mixer weights: conv
            # [k-1, conv_dim] channel dim over tp; ssm [H, dv, dk] head
            # dim over tp; anything else replicated (per-dp when batched)
            def rec_spec(name, arr):
                nd = arr.ndim - len(lead)
                if name == "conv" and nd == 2:
                    return _ns(mesh, *lead, None, TP_AXIS)
                if name == "ssm" and nd == 3:
                    return _ns(mesh, *lead, TP_AXIS, None, None)
                return _ns(mesh, *lead)

            layers.append({k: rec_spec(k, v) for k, v in layer_state.items()})
    out = {"layers": layers, "pos": _ns(mesh, *lead)}
    for k in state:
        if k not in out:
            out[k] = _ns(mesh, *lead)
    return out


def shard_state(cfg: DecoderConfig, state: dict, mesh: Mesh, *, batched: bool = False) -> dict:
    return jax.device_put(state, state_specs(cfg, state, mesh, batched=batched))

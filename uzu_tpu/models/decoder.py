"""Functional decoder forward pass built from the config.

One code path serves prefill chunks and decode steps: tokens carry absolute
positions derived from state["pos"], the KV cache is slot-per-position, and
causal masking makes end-padding invisible (padded rows sit at future slots
that later writes overwrite). This replaces the reference's command-encoding
graph (crates/backend-uzu/src/encodable_block/decoder.rs:118-173,
transformer.rs:258-294, transformer_layer.rs:195-238) with a jit-traced
function; XLA provides the fusion/barriers the reference's Encoder +
HazardTracker provide manually.

Residual discipline (transformer_layer.rs:195-238 + normalization kernel
ShortcutMode semantics):
    h = pre_mixer_norm(x)            (layer 0 may have no pre-norm)
    a = post_mixer_norm(mixer(h))
    x = (x + a) * post_layer_scalar?          [ScaleResidualSum]
    m = post_mlp_norm(mlp(pre_mlp_norm(x))) * post_layer_scalar?  [ScaleOutput]
    x = x + m
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import (
    AttentionConfig,
    DecoderConfig,
    DenseMLPConfig,
    MixtureOfExpertsConfig,
    TiedEmbeddingConfig,
    TransformerLayerConfig,
)
from ..ops.activation import gated_act_mul
from ..ops.attention import attention_reference
from ..ops.linear import linear_apply
from ..ops.norm import normalize
from ..ops.rope import apply_rope, inverse_frequencies, rope_tables
from ..quant.format import QuantizedTensor, unpack_codes


# --------------------------------------------------------------------------
# Embedding
# --------------------------------------------------------------------------


def embedding_lookup(table, tokens: jax.Array, dtype=None) -> jax.Array:
    """tokens [S] -> [S, D]; quantized tables dequantize only gathered rows
    (reference: QuantizedEmbeddingLookup kernel, embedding.rs:537-620)."""
    dtype = dtype or table.dtype
    if isinstance(table, QuantizedTensor):
        codes = unpack_codes(table.codes[tokens], table.bits).astype(jnp.float32)
        g = table.group_size
        k = codes.shape[-1]
        scales = jnp.repeat(table.scales[tokens].astype(jnp.float32), g, axis=-1)[:, :k]
        if table.qbias is None:  # symmetric: derive qbias from the gathered
            qbias = scales * table.qbias_coeff  # scales (exact, power of 2)
        else:
            qbias = jnp.repeat(table.qbias[tokens].astype(jnp.float32), g, axis=-1)[:, :k]
        return (codes * scales + qbias).astype(dtype)
    return table[tokens].astype(dtype)


def embedding_readout(table, hidden: jax.Array, soft_cap: float | None) -> jax.Array:
    """hidden [S, D] -> logits [S, V] f32 (embedding.rs:628-700)."""
    logits = linear_apply(table, hidden).astype(jnp.float32)
    if soft_cap is not None:
        logits = soft_cap * jnp.tanh(logits / soft_cap)
    return logits


# --------------------------------------------------------------------------
# Attention mixer
# --------------------------------------------------------------------------


@lru_cache(maxsize=None)
def _inv_freq_cached(rope_cfg):
    inv, scale = inverse_frequencies(rope_cfg)
    return inv, scale


def _head_norm(x, norm_cfg, scales):
    """Per-head RMS norm over head_dim (QKVNorm, qkv_norm.rs)."""
    return normalize(x, norm_cfg, scales)


def attention_forward(
    cfg: AttentionConfig,
    layer_cfg: TransformerLayerConfig,
    params: dict,
    x: jax.Array,  # [S, D]
    positions: jax.Array,  # [S]
    kv,  # own cache dict or shared source cache dict
    owns_cache: bool,
    true_length=None,
    tree=None,  # (suffix_start, ancestor_mask [S, S]) for tree verification
    seq_axis: str | None = None,  # sequence-parallel prefill: x/positions are
    # this device's token slice; K/V are all-gathered over the axis before
    # the cache append so every device sees the full context
    ctx_limit: int | None = None,  # attention reads only cache slots
    # [0, ctx_limit) — the sparse grow-on-demand analogue (state.rs:153-185):
    # the cache buffer stays max_context-sized, but a step at position p only
    # streams the smallest bucket covering p. Caller guarantees every live
    # slot (incl. tree suffix) is below the limit. Ring layouts are already
    # compact and are left alone.
):
    s, d = x.shape
    h, g, dh = cfg.num_heads, cfg.num_groups, cfg.head_dim
    q_dim = h * dh

    qkv = linear_apply(params["qkv"]["w"], x, params["qkv"].get("b"))
    if cfg.is_kv_sharing:
        q = qkv.reshape(s, h, dh)
        k_new = v_new = None
    else:
        q = qkv[:, :q_dim].reshape(s, h, dh)
        k_new = qkv[:, q_dim : q_dim + g * dh].reshape(s, g, dh)
        v_new = qkv[:, q_dim + g * dh :].reshape(s, g, dh)

    if cfg.query_norm_config is not None:
        q = _head_norm(q, cfg.query_norm_config, params["q_norm_scales"])
    if k_new is not None and cfg.key_norm_config is not None:
        k_new = _head_norm(k_new, cfg.key_norm_config, params["k_norm_scales"])
    if k_new is not None and cfg.normalize_values:
        v_new = _head_norm(v_new, cfg.value_norm_config(), params.get("v_norm_scales"))

    if layer_cfg.rope_config is not None:
        inv_freq, attn_scale = _inv_freq_cached(layer_cfg.rope_config)
        cos, sin = rope_tables(jnp.asarray(inv_freq), attn_scale, positions)
        q = apply_rope(q, cos, sin)
        if k_new is not None:
            k_new = apply_rope(k_new, cos, sin)

    from .kv_cache import append as kv_append, read as kv_read

    if seq_axis is not None and owns_cache and k_new is not None:
        # sequence-parallel prefill: gather the other devices' K/V slices so
        # the (replicated) cache gets the whole chunk and local queries see
        # the full context. The gather is the comms the cache write needs
        # anyway; ring_attention (parallel/seqpar.py) is the alternative for
        # a sequence-SHARDED cache.
        k_new = jax.lax.all_gather(k_new, seq_axis, axis=0, tiled=True)
        v_new = jax.lax.all_gather(v_new, seq_axis, axis=0, tiled=True)
        write_positions = jax.lax.all_gather(positions, seq_axis, axis=0, tiled=True)
    else:
        write_positions = positions

    if owns_cache:
        if tree is not None:
            # tree nodes land at CONSECUTIVE SLOTS (suffix_start + node
            # index), not at their positions — siblings share a position
            # (reference: suffix scratch region, attention/state.rs:13)
            slot_positions = tree[0] + jnp.arange(s, dtype=jnp.int32)
            new_kv = kv_append(kv, k_new, v_new, slot_positions, true_length)
        else:
            new_kv = kv_append(kv, k_new, v_new, write_positions, true_length)
    else:
        new_kv = kv

    read_kv = new_kv
    if ctx_limit is not None and "pos" not in new_kv:
        c_full = next(iter(new_kv.values())).shape[0]
        if ctx_limit < c_full:
            read_kv = {kk: vv[:ctx_limit] for kk, vv in new_kv.items()}
    k_cache, v_cache, kv_positions = kv_read(read_kv)

    scale = cfg.scale if cfg.scale is not None else float(dh) ** -0.5
    kv_valid = None
    if not cfg.is_causal and true_length is not None:
        kv_valid = positions[0] + true_length
    attn = attention_reference(
        q,
        k_cache,
        v_cache,
        positions,
        scale=scale,
        is_causal=cfg.is_causal,
        sliding_window_size=cfg.sliding_window_size,
        logit_soft_cap=cfg.logit_soft_cap,
        sinks=params.get("sinks"),
        kv_valid_length=kv_valid,
        kv_positions=kv_positions,
        suffix_start=tree[0] if tree is not None else None,
        suffix_mask=tree[1] if tree is not None else None,
    )
    attn = attn.reshape(s, q_dim)

    if "gate" in params:
        gate = linear_apply(params["gate"]["w"], x)
        attn = (attn.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(attn.dtype)

    out = linear_apply(params["out"]["w"], attn, params["out"].get("b"))
    return out, new_kv


# --------------------------------------------------------------------------
# MLP
# --------------------------------------------------------------------------


def mlp_forward(cfg, params: dict, x: jax.Array) -> jax.Array:
    if isinstance(cfg, DenseMLPConfig):
        fused = linear_apply(params["up"]["w"], x, params["up"].get("b"))
        half = fused.shape[-1] // 2
        # fused rows are [up | gate]: out = up * act(gate)
        # (reference: cpu gated_act_mul.rs:32-45, interleaved layout)
        up, gate = fused[:, :half], fused[:, half:]
        hidden = gated_act_mul(cfg.activation, gate, up, cfg.gate_clipping, cfg.up_clipping)
        return linear_apply(params["down"]["w"], hidden, params["down"].get("b"))
    if isinstance(cfg, MixtureOfExpertsConfig):
        from .moe import moe_forward

        return moe_forward(cfg, params, x)
    raise ValueError(f"unsupported mlp config {type(cfg).__name__}")


# --------------------------------------------------------------------------
# Layer + decoder
# --------------------------------------------------------------------------


def _norm(params_key, cfg, params, x):
    p = params[params_key]
    return normalize(x, cfg, p["scales"], p.get("biases"))


def layer_forward(
    layer_cfg: TransformerLayerConfig,
    params: dict,
    x: jax.Array,
    positions: jax.Array,
    layer_state,
    shared_kv,
    true_length=None,
    per_layer_input=None,
    tree=None,
    seq_axis=None,
    ctx_limit=None,
    defer_ssm=False,
    tree_parents=None,
    tree_conv_src=None,
):
    mixer_cfg = layer_cfg.mixer_config
    pls = params.get("post_layer_scalar")

    h = _norm("pre_mixer_norm", layer_cfg.pre_mixer_norm_config, params, x) if layer_cfg.pre_mixer_norm_config else x

    if isinstance(mixer_cfg, AttentionConfig):
        owns = layer_state is not None
        kv = layer_state if owns else shared_kv
        a, new_state = attention_forward(
            mixer_cfg, layer_cfg, params["mixer"], h, positions, kv, owns, true_length,
            tree, seq_axis, ctx_limit,
        )
        if not owns:
            new_state = None
    else:
        if seq_axis is not None:
            raise NotImplementedError(
                "sequence-parallel prefill supports attention mixers only "
                "(recurrent-state mixers need cross-device state propagation)"
            )
        from .ssm import ssm_forward, ssm_tree_forward

        if tree_parents is not None:
            # tree verification: rows are tree nodes, the recurrence runs
            # along ancestor edges, nothing commits (aux returned instead)
            a, new_state = ssm_tree_forward(
                mixer_cfg, params["mixer"], h, layer_state, tree_parents,
                tree_conv_src[mixer_cfg.kernel_size],
            )
        else:
            a, new_state = ssm_forward(
                mixer_cfg, params["mixer"], h, positions, layer_state, true_length,
                defer=defer_ssm,
            )

    if layer_cfg.post_mixer_norm_config is not None:
        a = _norm("post_mixer_norm", layer_cfg.post_mixer_norm_config, params, a)

    x = (x.astype(jnp.float32) + a.astype(jnp.float32)).astype(x.dtype)
    if pls is not None and layer_cfg.ple_config is None:
        x = (x.astype(jnp.float32) * pls[0]).astype(x.dtype)

    h = _norm("pre_mlp_norm", layer_cfg.pre_mlp_norm_config, params, x)
    m = mlp_forward(layer_cfg.mlp_config, params["mlp"], h)
    if layer_cfg.post_mlp_norm_config is not None:
        m = _norm("post_mlp_norm", layer_cfg.post_mlp_norm_config, params, m)
        if pls is not None and layer_cfg.ple_config is None:
            m = (m.astype(jnp.float32) * pls[0]).astype(m.dtype)

    x = (x.astype(jnp.float32) + m.astype(jnp.float32)).astype(x.dtype)

    if layer_cfg.ple_config is not None:
        from .ple import ple_project

        x = ple_project(
            layer_cfg.ple_config,
            params["ple"],
            x,
            per_layer_input,
            pls[0] if pls is not None else 1.0,
        )
    return x, new_state


def decoder_forward(
    cfg: DecoderConfig,
    params: dict,
    tokens: jax.Array,  # [S] int32
    state: dict,
    *,
    last_only: bool = True,
    true_length: jax.Array | int | None = None,
    positions: jax.Array | None = None,  # override (tree nodes: pos+depth)
    tree_mask: jax.Array | None = None,  # [S, S] ancestor matrix
    collect_layers: tuple = (),  # layer indices to tap (hidden-feature taps
                                 # for DFlash, transformer.rs:286-293)
    seq_axis: str | None = None,  # sequence-parallel prefill (tokens are this
                                  # device's slice; see attention_forward)
    readout_row=None,  # explicit local row for last_only readout (the global
                       # last row lives on one device under seq_axis)
    ctx_limit: int | None = None,  # context bucket for attention reads
    defer_ssm: bool = False,  # speculative verify: recurrent mixers return
                              # replay aux instead of committed state; pair
                              # with decoder_commit_deferred(commit_length)
    tree_parents=None,  # [S] i32 node parents (tree verify on recurrent
                        # mixers; -1 = root reads the incoming state)
    tree_conv_src=None,  # {kernel_size: [S, K] i32} host-linearized conv
                         # windows into [state rows; node rows]
):
    """Run the decoder; returns (logits, new_state).

    tokens may be end-padded: `true_length` (default S) is how many are real.
    pos advances by true_length; padded rows land in future cache slots that
    the causal mask hides and later writes overwrite.
    """
    tcfg = cfg.transformer_config
    s = tokens.shape[0]
    if true_length is None:
        true_length = s
    if positions is None:
        positions = state["pos"] + jnp.arange(s, dtype=jnp.int32)
    tree = (state["pos"], tree_mask) if tree_mask is not None else None

    ecfg = cfg.embedding_config
    table = params["embedding"].get("tied", params["embedding"].get("input"))
    x = embedding_lookup(table, tokens)
    if ecfg.input_scale is not None:
        x = (x.astype(jnp.float32) * ecfg.input_scale).astype(x.dtype)

    per_layer = None
    if cfg.ple_model_config is not None:
        from .ple import ple_inputs

        per_layer = ple_inputs(cfg.ple_model_config, params["per_layer_embedding"], tokens, x)

    new_layer_states = []
    features = []
    for i, layer_cfg in enumerate(tcfg.layer_configs):
        src = layer_cfg.kv_source_layer_index
        shared_kv = None
        if src is not None:
            shared_kv = new_layer_states[src]
        x, new_state = layer_forward(
            layer_cfg, params["layers"][i], x, positions, state["layers"][i], shared_kv,
            true_length,
            per_layer[:, i] if per_layer is not None else None,
            tree,
            seq_axis,
            ctx_limit,
            defer_ssm,
            tree_parents,
            tree_conv_src,
        )
        new_layer_states.append(new_state)
        if i in collect_layers:
            features.append((i, x))

    x = normalize(
        x, tcfg.output_norm_config, params["output_norm"]["scales"], params["output_norm"].get("biases")
    )
    if last_only:
        row = readout_row if readout_row is not None else true_length - 1
        x = jax.lax.dynamic_slice_in_dim(x, row, 1, axis=0)

    out_table = params["embedding"].get("tied", params["embedding"].get("output"))
    logits = embedding_readout(out_table, x, ecfg.logit_soft_cap)

    out_state = {
        "layers": new_layer_states,
        # deferred: pos stays put — decoder_commit_deferred advances it by
        # the accepted length along with the recurrent-state replays
        "pos": state["pos"] if defer_ssm
        else state["pos"] + jnp.asarray(true_length, jnp.int32),
    }
    if collect_layers:
        by_layer = dict(features)
        feats = jnp.stack([by_layer[i] for i in collect_layers], axis=1)  # [S, n_tap, D]
        return logits, out_state, feats
    return logits, out_state


def decoder_commit_deferred(cfg: DecoderConfig, pending: dict, commit_length):
    """Resolve a `defer_ssm=True` forward into a real decoding state
    committed to `commit_length` tokens (a traced scalar, decided AFTER the
    forward — e.g. from on-device speculative acceptance). Attention layers
    are already slot-committed (pos governs visibility); recurrent layers
    replay their state recurrence over the accepted prefix (ssm_commit)."""
    from .ssm import ssm_commit

    layers = []
    for layer_cfg, entry in zip(cfg.transformer_config.layer_configs, pending["layers"]):
        if entry is not None and not isinstance(layer_cfg.mixer_config, AttentionConfig):
            entry = ssm_commit(layer_cfg.mixer_config, entry, commit_length)
        layers.append(entry)
    return {
        "layers": layers,
        "pos": pending["pos"] + jnp.asarray(commit_length, jnp.int32),
    }

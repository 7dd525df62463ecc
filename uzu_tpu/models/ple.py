"""Per-layer embeddings (Gemma-3n/E4B PLE).

Reference: crates/backend-uzu/src/encodable_block/per_layer_embedding.rs.
Two pieces:

- decoder-level `ple_inputs`: token lookup in a dedicated PLE table
  [ple_vocab, L*ple_dim] scaled by ple_embed_scale*input_scale (ids >=
  ple_vocab read as zeros, full_precision_embedding.rs:22), plus the hidden
  features projected D -> L*ple_dim and RMS-normalized per ple_dim row with
  epsilon/model_projection_scale^2 (the folded-scale trick,
  per_layer_embedding.rs:78-84) times input_scale;
- per-layer `ple_project` (after the MLP residual): x += post_layer_scalar *
  norm(projection(act(gate(x)) * per_layer_input[layer]))
  (PerLayerEmbeddingProjection::encode, :237-292).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import DecoderConfig, PLELayerConfig, PLEModelConfig
from ..ops.activation import apply_activation
from ..ops.linear import linear_apply
from ..ops.norm import normalize


def load_ple(tree, cfg: DecoderConfig, tcfg) -> dict:
    from .loader import load_linear, load_norm

    ple = cfg.ple_model_config
    total = ple.num_layers * ple.ple_dim
    sub = tree.subtree("per_layer_embedding")
    dt = sub.leaf_info("token_embedding").dtype
    return {
        "token_embedding": jnp.asarray(
            sub.leaf("token_embedding", (ple.ple_vocab_size, total), dt)
        ),
        "model_projection": load_linear(
            sub.subtree("model_projection"), tcfg.model_dim, total, False
        ),
        "projection_norm": load_norm(
            sub.subtree("projection_norm"), ple.ple_dim, ple.norm_config
        ),
    }


def load_ple_layer(tree, ple_cfg: PLELayerConfig, model_dim: int) -> dict:
    from .loader import load_linear, load_norm

    sub = tree.subtree("ple")
    return {
        "gate": load_linear(sub.subtree("gate"), model_dim, ple_cfg.ple_dim, False),
        "projection": load_linear(sub.subtree("projection"), ple_cfg.ple_dim, model_dim, False),
        "norm": load_norm(sub.subtree("norm"), model_dim, ple_cfg.norm_config),
    }


def ple_inputs(
    ple_cfg: PLEModelConfig, params: dict, tokens: jax.Array, x: jax.Array
) -> jax.Array:
    """tokens [S], x [S, D] (scaled embedding) -> per-layer inputs
    [S, L, ple_dim]."""
    s = tokens.shape[0]
    L, pd = ple_cfg.num_layers, ple_cfg.ple_dim
    table = params["token_embedding"]
    in_range = tokens < ple_cfg.ple_vocab_size
    safe = jnp.where(in_range, tokens, 0)
    tok_ple = table[safe].astype(jnp.float32) * (
        ple_cfg.ple_embed_scale * ple_cfg.input_scale
    )
    tok_ple = jnp.where(in_range[:, None], tok_ple, 0.0)

    projected = linear_apply(params["model_projection"]["w"], x)  # [S, L*pd]
    rows = projected.reshape(s * L, pd)
    # scale folded into epsilon (per_layer_embedding.rs:78-84)
    eps = ple_cfg.norm_config.epsilon / (
        ple_cfg.model_projection_scale * ple_cfg.model_projection_scale
    )
    cfg = ple_cfg.norm_config
    import dataclasses

    normed = normalize(
        rows, dataclasses.replace(cfg, epsilon=eps), params["projection_norm"]["scales"]
    )
    normed = normed.astype(jnp.float32) * ple_cfg.input_scale
    return (tok_ple.reshape(s, L, pd) + normed.reshape(s, L, pd)).astype(x.dtype)


def ple_project(
    ple_cfg: PLELayerConfig,
    params: dict,
    x: jax.Array,  # [S, D], post-residual hidden
    per_layer_input: jax.Array,  # [S, ple_dim] (this layer's slice)
    post_layer_scalar: float | jax.Array,
) -> jax.Array:
    gate = linear_apply(params["gate"]["w"], x)
    activated = (
        apply_activation(ple_cfg.activation, gate).astype(jnp.float32)
        * per_layer_input.astype(jnp.float32)
    ).astype(x.dtype)
    projected = linear_apply(params["projection"]["w"], activated)
    normed = normalize(projected, ple_cfg.norm_config, params["norm"]["scales"])
    return (
        x.astype(jnp.float32) + normed.astype(jnp.float32) * post_layer_scalar
    ).astype(x.dtype)

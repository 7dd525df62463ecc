"""Decoding state: per-layer KV / SSM states + global position.

TPU-first redesign of the reference's TransformerState (crates/backend-uzu/
src/encodable_block/transformer.rs:24-77 and mixer/attention/state.rs): XLA
requires static shapes, so instead of sparse grow-on-demand buffers the cache
is a fixed [C, G, Dh] ring of `max_context` slots per layer, donated through
the jitted step so updates are in-place in HBM. Slot j holds token position j
(full attention); sliding-window layers still use the full buffer but are
masked — a compact ring layout is a later optimization.

KV-shared layers (`kv_source_layer_index`, Gemma-4) own no cache and read the
source layer's entry.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..config.model import AttentionConfig, DecoderConfig


def init_state(
    cfg: DecoderConfig,
    max_context: int,
    dtype=jnp.bfloat16,
    *,
    kv_quant: bool = False,
    ring_windows: bool = False,
    ring_extra: int = 0,
) -> dict:
    """kv_quant: INT8 KV codes + per-row scales; ring_windows: sliding-window
    layers keep only `window` slots (ring layout) instead of max_context."""
    from .kv_cache import make_cache

    layers = []
    for layer_cfg in cfg.transformer_config.layer_configs:
        m = layer_cfg.mixer_config
        if isinstance(m, AttentionConfig):
            if m.is_kv_sharing or layer_cfg.kv_source_layer_index is not None:
                layers.append(None)
            else:
                layers.append(
                    make_cache(
                        m.num_groups,
                        m.head_dim,
                        max_context,
                        dtype,
                        quantized=kv_quant,
                        window=m.sliding_window_size if ring_windows else None,
                        ring_extra=ring_extra,
                    )
                )
        else:
            from .ssm import make_ssm_state

            layers.append(make_ssm_state(m, cfg.transformer_config.model_dim, dtype))
    return {
        "layers": layers,
        "pos": jnp.zeros((), jnp.int32),
    }


def state_byte_size(state: dict) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(state))

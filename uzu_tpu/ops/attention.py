"""Reference (pure-XLA) GQA attention over a KV cache.

Semantic parity targets (reference: crates/backend-uzu/src/backends/cpu/
kernel/attention/attention_single_pass.rs + mask.rs, encodable_block/mixer/
attention/mod.rs): causal masking against absolute token positions, sliding
window, tanh logit soft cap, attention sinks (per-head extra softmax logit),
f32 softmax accumulation.

The cache layout is [C, G, Dh] with slot j holding token position j; queries
carry absolute positions so prefill chunks and decode steps share one code
path. Pallas kernels (ops/pallas/) replace this on the hot path; this stays
as the correctness oracle and the CPU/test backend.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def attention_reference(
    q: jax.Array,  # [S, H, Dh]
    k_cache: jax.Array,  # [C, G, Dh]
    v_cache: jax.Array,  # [C, G, Dh]
    q_positions: jax.Array,  # [S] absolute token positions of queries
    *,
    scale: float,
    is_causal: bool = True,
    sliding_window_size: int | None = None,
    logit_soft_cap: float | None = None,
    sinks: jax.Array | None = None,  # [H]
    kv_positions: jax.Array | None = None,  # [C], defaults to arange
    kv_valid_length=None,  # mask kv slots >= this (bidirectional padding)
    suffix_start=None,  # slot index where tree-suffix nodes begin
    suffix_mask: jax.Array | None = None,  # [S, M] ancestor mask for slots
                                           # [suffix_start, suffix_start+M)
) -> jax.Array:
    s, h, dh = q.shape
    c, g, _ = k_cache.shape
    rep = h // g
    if kv_positions is None:
        kv_positions = jnp.arange(c, dtype=jnp.int32)

    qf = q.astype(jnp.float32).reshape(s, g, rep, dh)
    kf = k_cache.astype(jnp.float32)
    vf = v_cache.astype(jnp.float32)

    # scores [g, rep, s, c]
    scores = jnp.einsum("sgrd,cgd->grsc", qf, kf) * scale
    if logit_soft_cap is not None:
        scores = logit_soft_cap * jnp.tanh(scores / logit_soft_cap)

    qpos = q_positions.astype(jnp.int32)[:, None]  # [s, 1]
    kpos = kv_positions.astype(jnp.int32)[None, :]  # [1, c]
    valid = kpos <= qpos if is_causal else jnp.ones((s, c), bool)
    if suffix_mask is not None:
        # tree verification (reference: BatchTopology trie masks,
        # batch_topology.rs + AttentionGemm ancestor masking): slots at
        # [suffix_start, suffix_start+M) hold tree nodes whose visibility is
        # the ancestor matrix, not position order (siblings share positions)
        m = suffix_mask.shape[1]
        slot = jnp.arange(c, dtype=jnp.int32)[None, :]
        in_suffix = (slot >= suffix_start) & (slot < suffix_start + m)
        idx = jnp.clip(slot - suffix_start, 0, m - 1)
        tree_ok = jnp.take_along_axis(
            suffix_mask, jnp.broadcast_to(idx, (s, c)), axis=1
        )
        valid = jnp.where(in_suffix, tree_ok, valid)
    if kv_valid_length is not None:
        valid = valid & (kpos < kv_valid_length)
    if sliding_window_size is not None:
        valid = valid & (kpos > qpos - sliding_window_size)
    scores = jnp.where(valid[None, None], scores, NEG_INF)

    if sinks is not None:
        sink = sinks.astype(jnp.float32).reshape(g, rep)[:, :, None, None]
        sink = jnp.broadcast_to(sink, (g, rep, s, 1))
        all_logits = jnp.concatenate([scores, sink], axis=-1)
        m = jnp.max(all_logits, axis=-1, keepdims=True)
        e = jnp.exp(all_logits - m)
        probs = e[..., :c] / jnp.sum(e, axis=-1, keepdims=True)
    else:
        probs = jax.nn.softmax(scores, axis=-1)

    out = jnp.einsum("grsc,cgd->sgrd", probs, vf)
    return out.reshape(s, h, dh).astype(q.dtype)

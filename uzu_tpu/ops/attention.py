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


def _dot_dtype():
    """MXU input dtype for the attention einsums. On TPU, bf16 inputs with
    f32 accumulation run at the MXU's native rate (f32 inputs decompose into
    multi-pass matmuls) and match the reference's half-precision Metal
    attention cores; on CPU (the correctness oracle / CI) stay f32 — CPU XLA
    has no bf16 dot, and the oracle wants full precision anyway."""
    from ..runtime import on_tpu

    return jnp.bfloat16 if on_tpu() else jnp.float32


def _score_einsum(spec, a, b):
    dt = _dot_dtype()
    return jnp.einsum(spec, a.astype(dt), b.astype(dt),
                      preferred_element_type=jnp.float32)


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

    from .. import runtime

    # Flash-kernel dispatch is interpreter-mode only (forced-pallas CPU
    # testing). Measured on v5e: the kernel compiles and is correct, but the
    # XLA einsum path (short ctx) and scan-based online-softmax path (long
    # ctx) are FASTER in-context — XLA hides the score traffic under the
    # next quant-matmul's weight-prefetch DMA, and a custom call acts as a
    # pipeline barrier (flash 1.77 ms vs online 1.47 ms standalone at
    # S=512/C=4096; whole-prefill 18.0 ms vs 16.3 ms at C=1024). Revisit on
    # hardware where attention HBM traffic, not weight streaming, dominates.
    if runtime.use_pallas() and (not runtime.on_tpu() or runtime.force_flash()):
        from .pallas import flash_attention as fa

        if fa.supported(
            s, h, g, dh, c,
            is_causal=is_causal,
            suffix_mask=suffix_mask,
            kv_valid_length=kv_valid_length,
            kv_positions=kv_positions,
        ):
            return fa.flash_attention(
                q, k_cache, v_cache, q_positions,
                scale=scale,
                sliding_window_size=sliding_window_size,
                logit_soft_cap=logit_soft_cap,
                sinks=sinks,
                interpret=not runtime.on_tpu(),
            )

    if (
        suffix_mask is None
        and s >= ONLINE_MIN_S
        and c % ONLINE_CHUNK == 0
    ):
        # PREFILL widths take the chunked online softmax at EVERY context
        # that chunks evenly (r4 prefill_attn_ab, v5e flagship, interleaved
        # arms at C<=2048: online 10.79 ms / einsum 14.78 / Pallas flash
        # 13.57 per 512-chunk — the einsum path materializes [H, S, C] f32
        # scores through HBM, ~6.6 ms of the chunk by ablation, and unlike
        # decode widths that traffic cannot hide under the weight stream;
        # reference two-pass core selection, core/mod.rs:89). Decode/verify
        # widths (s < ONLINE_MIN_S) stay on the single fused einsum at
        # every context: their score block is tiny, and the scan's 8-16
        # sequential chunk steps per layer are pure latency (measured on
        # v5e flagship: decode 118 -> 138 tok/s at ctx 8k, 102 -> 118 at
        # 14k, from this dispatch change alone)
        return attention_online(
            q, k_cache, v_cache, q_positions, scale=scale, is_causal=is_causal,
            sliding_window_size=sliding_window_size, logit_soft_cap=logit_soft_cap,
            sinks=sinks, kv_positions=kv_positions, kv_valid_length=kv_valid_length,
        )
    if kv_positions is None:
        kv_positions = jnp.arange(c, dtype=jnp.int32)

    qf = q.reshape(s, g, rep, dh)

    # scores [g, rep, s, c]
    scores = _score_einsum("sgrd,cgd->grsc", qf, k_cache) * scale
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

    out = _score_einsum("grsc,cgd->sgrd", probs, v_cache)
    return out.reshape(s, h, dh).astype(q.dtype)


# --------------------------------------------------------------------------
# Chunked online-softmax attention (long-context path)
# --------------------------------------------------------------------------

ONLINE_CHUNK = 1024
ONLINE_MIN_S = 64  # below this many query rows the fused einsum wins
# (r4: the former C >= 4096 gate is gone — prefill widths take the online
# path at every context that chunks evenly; C < ONLINE_CHUNK stays einsum,
# where the score block is one chunk anyway)


def attention_online(
    q: jax.Array,  # [S, H, Dh]
    k_cache: jax.Array,  # [C, G, Dh]
    v_cache: jax.Array,  # [C, G, Dh]
    q_positions: jax.Array,  # [S]
    *,
    scale: float,
    is_causal: bool = True,
    sliding_window_size: int | None = None,
    logit_soft_cap: float | None = None,
    sinks: jax.Array | None = None,
    kv_positions: jax.Array | None = None,
    kv_valid_length=None,
) -> jax.Array:
    """FlashDecoding-style attention: lax.scan over KV chunks with running
    (max, sum, acc) — O(S*chunk) score memory instead of O(S*C). The role of
    the reference's AttentionTwoPass kernels (attention_two_pass_*.metal,
    core/mod.rs:89-93 picks two-pass beyond 1024 ctx). Tree-suffix masks stay
    on the einsum path (trees are small)."""
    s, h, dh = q.shape
    c, g, _ = k_cache.shape
    rep = h // g
    chunk = min(ONLINE_CHUNK, c)
    assert c % chunk == 0, (c, chunk)
    if kv_positions is None:
        kv_positions = jnp.arange(c, dtype=jnp.int32)

    qf = q.reshape(s, g, rep, dh)
    qpos = q_positions.astype(jnp.int32)

    kc = k_cache.reshape(c // chunk, chunk, g, dh)
    vc = v_cache.reshape(c // chunk, chunk, g, dh)
    pc = kv_positions.reshape(c // chunk, chunk)

    def body(carry, inp):
        m_run, l_run, acc = carry  # [g,rep,s], [g,rep,s], [g,rep,s,dh]
        k_blk, v_blk, p_blk = inp
        scores = _score_einsum("sgrd,cgd->grsc", qf, k_blk) * scale
        if logit_soft_cap is not None:
            scores = logit_soft_cap * jnp.tanh(scores / logit_soft_cap)
        kpos = p_blk.astype(jnp.int32)[None, :]
        valid = kpos <= qpos[:, None] if is_causal else jnp.ones((s, chunk), bool)
        if kv_valid_length is not None:
            valid = valid & (kpos < kv_valid_length)
        if sliding_window_size is not None:
            valid = valid & (kpos > qpos[:, None] - sliding_window_size)
        scores = jnp.where(valid[None, None], scores, NEG_INF)

        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l_new = l_run * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + _score_einsum("grsc,cgd->grsd", p, v_blk)
        return (m_new, l_new, acc), None

    init = (
        jnp.full((g, rep, s), NEG_INF, jnp.float32),
        jnp.zeros((g, rep, s), jnp.float32),
        jnp.zeros((g, rep, s, dh), jnp.float32),
    )
    (m_run, l_run, acc), _ = jax.lax.scan(body, init, (kc, vc, pc))

    if sinks is not None:
        # sink adds one phantom logit per head (attention/mod.rs sinks)
        sink = sinks.astype(jnp.float32).reshape(g, rep)[:, :, None]
        m_new = jnp.maximum(m_run, sink)
        l_run = l_run * jnp.exp(m_run - m_new) + jnp.exp(sink - m_new)
        acc = acc * jnp.exp(m_run - m_new)[..., None]

    out = acc / jnp.maximum(l_run[..., None], 1e-30)
    return out.transpose(2, 0, 1, 3).reshape(s, h, dh).astype(q.dtype)

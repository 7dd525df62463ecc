"""Batched decode step over a paged KV cache.

One jitted function advances B slots by one token each: per layer, the
token batch [B, D] runs the same norm/QKV/MLP math as the dense path
(reusing ops/ and decoder helpers row-wise — each row is an independent
sequence), K/V rows scatter into the shared page pools at each slot's
(page, offset), and attention reads through the gather-free paged kernel
(ops/pallas/paged_attention.py). The dense path vmaps decoder_forward per
slot; that shape cannot express a POOL shared across slots, which is the
whole point of paging — hence this dedicated step.

Covers attention-mixer layers with the full attention feature set (GQA,
RoPE, QK norms, soft caps, sinks, sliding windows, cross-layer KV
sharing, gated attention, dense MLP / MoE, post scalars); recurrent
mixers and PLE stay on the dense engine (`paged_supported` gates).
Window layers keep full page tables (one table drives every layer's
pool, and full-attention layers need all pages — per-layer tables with
slid-out-page reclamation would only pay off on all-window models).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..config.model import (
    AttentionConfig,
    DecoderConfig,
)
from ..ops.linear import linear_apply
from ..ops.norm import normalize
from ..ops.rope import apply_rope, rope_tables
from .decoder import (
    _head_norm,
    _inv_freq_cached,
    embedding_lookup,
    embedding_readout,
    mlp_forward,
)


def paged_supported(cfg: DecoderConfig) -> bool:
    tcfg = cfg.transformer_config
    if cfg.ple_model_config is not None:
        return False
    for lc in tcfg.layer_configs:
        m = lc.mixer_config
        if not isinstance(m, AttentionConfig):
            return False
        if lc.ple_config is not None:
            return False
        # features the paged attention paths do not implement — serving
        # such a model paged would silently diverge from the dense engine
        # (value-head norm is applied to v_new on the dense path,
        # decoder.attention_forward; non-causal layers need the dense
        # path's bidirectional masking)
        if m.normalize_values or not m.is_causal:
            return False
    return True


def _attention_paged(cfg, layer_cfg, params, x, positions, pool_kv,
                     pages, offsets, tables, lengths, shared_kv=None):
    """x [B, D] (one token per slot); returns (attn_out [B, D], new pools).

    pages/offsets [B] i32: physical page + in-page offset for each slot's
    new token; tables [B, MAXP]; lengths [B] = tokens visible AFTER append.
    shared_kv: a KV-sharing layer passes the SOURCE layer's already-updated
    pools here (pool_kv is None) — Q-only projection, no append.
    """
    b, d = x.shape
    h, g, dh = cfg.num_heads, cfg.num_groups, cfg.head_dim
    q_dim = h * dh

    qkv = linear_apply(params["qkv"]["w"], x, params["qkv"].get("b"))
    if cfg.is_kv_sharing:
        q = qkv.reshape(b, h, dh)
        k_new = v_new = None
    else:
        q = qkv[:, :q_dim].reshape(b, h, dh)
        k_new = qkv[:, q_dim : q_dim + g * dh].reshape(b, g, dh)
        v_new = qkv[:, q_dim + g * dh :].reshape(b, g, dh)

    if cfg.query_norm_config is not None:
        q = _head_norm(q, cfg.query_norm_config, params["q_norm_scales"])
    if k_new is not None and cfg.key_norm_config is not None:
        k_new = _head_norm(k_new, cfg.key_norm_config, params["k_norm_scales"])

    if layer_cfg.rope_config is not None:
        inv_freq, attn_scale = _inv_freq_cached(layer_cfg.rope_config)
        cos, sin = rope_tables(jnp.asarray(inv_freq), attn_scale, positions)
        # apply per row: fold B into the sequence dim of apply_rope
        q = apply_rope(q, cos, sin)
        if k_new is not None:
            k_new = apply_rope(k_new, cos, sin)

    if shared_kv is not None:
        read_pool = shared_kv
        new_pool = None
        quantized = len(read_pool) == 4
    else:
        quantized = len(pool_kv) == 4
        if quantized:
            # INT8 pools: quantize the new rows with the dense caches' exact
            # per-(token, kv-head) absmax scheme, scatter codes + scales
            from .kv_cache import _quantize_rows

            k_pool, k_s, v_pool, v_s = pool_kv
            k_q, k_sc = _quantize_rows(k_new)  # [B, G, Dh] i8 / [B, G] f32
            v_q, v_sc = _quantize_rows(v_new)
            for i in range(b):
                k_pool = jax.lax.dynamic_update_slice(
                    k_pool, k_q[i][:, None, None, :], (0, pages[i], offsets[i], 0))
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, v_q[i][:, None, None, :], (0, pages[i], offsets[i], 0))
                k_s = jax.lax.dynamic_update_slice(
                    k_s, k_sc[i][:, None, None], (0, pages[i], offsets[i]))
                v_s = jax.lax.dynamic_update_slice(
                    v_s, v_sc[i][:, None, None], (0, pages[i], offsets[i]))
            new_pool = (k_pool, k_s, v_pool, v_s)
        else:
            k_pool, v_pool = pool_kv
            k_s = v_s = None
            # scatter each slot's K/V rows at (page, offset) — B tiny writes
            for i in range(b):
                k_pool = jax.lax.dynamic_update_slice(
                    k_pool, k_new[i].astype(k_pool.dtype)[:, None, None, :],
                    (0, pages[i], offsets[i], 0),
                )
                v_pool = jax.lax.dynamic_update_slice(
                    v_pool, v_new[i].astype(v_pool.dtype)[:, None, None, :],
                    (0, pages[i], offsets[i], 0),
                )
            new_pool = (k_pool, v_pool)
        read_pool = new_pool
    if quantized:
        k_pool, k_s, v_pool, v_s = read_pool
    else:
        k_pool, v_pool = read_pool
        k_s = v_s = None

    from ..ops.pallas.paged_attention import (
        paged_attention_reference,
        paged_decode_attention,
    )

    scale = cfg.scale if cfg.scale is not None else float(dh) ** -0.5
    from .. import runtime

    page = k_pool.shape[2]
    # i8 code blocks are (page, Dh): Mosaic's int8 sublane tile is 32
    kernel_ok = not quantized or page % 32 == 0
    if kernel_ok and runtime.use_pallas() and runtime.on_tpu():
        # the i8 kernel streams codes + per-token scales through the same
        # page-table DMAs (half the KV bytes of the bf16 pool); the gather
        # fallback measured 8.5x slower at B=8 (62.9 vs 7.4 ms/step,
        # tools/exp_paged_step.py)
        attn = paged_decode_attention(
            q, k_pool, v_pool, tables, lengths, scale=scale,
            logit_soft_cap=cfg.logit_soft_cap,
            sliding_window_size=cfg.sliding_window_size,
            sinks=params.get("sinks"), k_scales=k_s, v_scales=v_s,
        )
    else:
        attn = paged_attention_reference(
            q, k_pool, v_pool, tables, lengths, scale=scale,
            logit_soft_cap=cfg.logit_soft_cap,
            sliding_window_size=cfg.sliding_window_size,
            sinks=params.get("sinks"), k_scales=k_s, v_scales=v_s,
        )
    attn = attn.reshape(b, q_dim)

    if "gate" in params:
        gate = linear_apply(params["gate"]["w"], x)
        attn = (attn.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(attn.dtype)

    out = linear_apply(params["out"]["w"], attn, params["out"].get("b"))
    return out, new_pool


def _attention_paged_prefill(cfg, layer_cfg, params, x, positions, pool_kv,
                             table, ctx_pages, true_length, shared_kv=None,
                             aligned=False):
    """Prefill S rows of ONE slot straight into its pages (no dense
    detour): K/V rows scatter at (table[pos // page], pos %% page), the
    read gathers the slot's first `ctx_pages` pages into a dense
    slot-per-position view and reuses the dense attention core — so the
    paged prefill is bit-identical to the dense engine's on the oracle
    path. Rows >= true_length write into the slot's own future in-page
    offsets (overwritten by decode later) or the engine's trash page
    (table's unused tail), and the causal mask hides them from every real
    query."""
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

    if layer_cfg.rope_config is not None:
        inv_freq, attn_scale = _inv_freq_cached(layer_cfg.rope_config)
        cos, sin = rope_tables(jnp.asarray(inv_freq), attn_scale, positions)
        q = apply_rope(q, cos, sin)
        if k_new is not None:
            k_new = apply_rope(k_new, cos, sin)

    if shared_kv is not None:
        read_pool = shared_kv
        new_pool = None
        quantized = len(read_pool) == 4
        if quantized:
            k_pool, k_s, v_pool, v_s = read_pool
        else:
            k_pool, v_pool = read_pool
            k_s = v_s = None
        page = k_pool.shape[2]
    else:
        quantized = len(pool_kv) == 4
        if quantized:
            k_pool, k_s, v_pool, v_s = pool_kv
        else:
            k_pool, v_pool = pool_kv
            k_s = v_s = None
        page = k_pool.shape[2]
        maxp = table.shape[0] - 1  # table[maxp] is the engine's trash page
        # padded rows (>= true_length) redirect to the trash page: a padded
        # position past max_context would otherwise clamp into the slot's
        # LAST real page and overwrite live rows
        valid = jnp.arange(s) < true_length
        pidx = jnp.where(
            valid, table[jnp.clip(positions // page, 0, maxp - 1)], table[maxp]
        )
        off = positions % page
        if aligned:
            # PAGE-ALIGNED fast path (r5): when pos0 and the chunk width are
            # both page multiples (every non-shared admission chunk at the
            # serving page sizes), whole pages write with contiguous
            # dynamic_update_index_in_dim instead of a 512-row advanced-
            # index scatter — the scatter lowering measured ~16 ms of the
            # 43.9 ms 8k admission chunk (exp_paged_prefill: paged 43.9 /
            # 36.6 at ctx_pages 2 vs dense 20.9). Rows >= true_length land
            # in the slot's own future in-page offsets (decode overwrites,
            # causal mask hides) or — via the table's trash-filled tail —
            # in the trash page, exactly like the scatter's redirect.
            npg = s // page
            first_page = positions[0] // page

            def _write(pool, rows):  # rows [S, G, ...] -> [G, npg, page, ...]
                r = jnp.swapaxes(rows, 0, 1).astype(pool.dtype)
                r = r.reshape(r.shape[0], npg, page, *r.shape[2:])
                for j in range(npg):
                    tgt = table[jnp.clip(first_page + j, 0, maxp)]
                    pool = jax.lax.dynamic_update_index_in_dim(
                        pool, r[:, j], tgt, axis=1)
                return pool

            if quantized:
                from .kv_cache import _quantize_rows

                k_q, k_sc = _quantize_rows(k_new)
                v_q, v_sc = _quantize_rows(v_new)
                k_pool, k_s = _write(k_pool, k_q), _write(k_s, k_sc)
                v_pool, v_s = _write(v_pool, v_q), _write(v_s, v_sc)
                new_pool = (k_pool, k_s, v_pool, v_s)
            else:
                k_pool, v_pool = _write(k_pool, k_new), _write(v_pool, v_new)
                new_pool = (k_pool, v_pool)
        elif quantized:
            from .kv_cache import _quantize_rows

            k_q, k_sc = _quantize_rows(k_new)  # [S, G, Dh] i8 / [S, G] f32
            v_q, v_sc = _quantize_rows(v_new)
            k_pool = k_pool.at[:, pidx, off].set(jnp.swapaxes(k_q, 0, 1))
            v_pool = v_pool.at[:, pidx, off].set(jnp.swapaxes(v_q, 0, 1))
            k_s = k_s.at[:, pidx, off].set(jnp.swapaxes(k_sc, 0, 1))
            v_s = v_s.at[:, pidx, off].set(jnp.swapaxes(v_sc, 0, 1))
            new_pool = (k_pool, k_s, v_pool, v_s)
        else:
            k_pool = k_pool.at[:, pidx, off].set(
                jnp.swapaxes(k_new, 0, 1).astype(k_pool.dtype))
            v_pool = v_pool.at[:, pidx, off].set(
                jnp.swapaxes(v_new, 0, 1).astype(v_pool.dtype))
            new_pool = (k_pool, v_pool)

    # dense read view of the slot's context: [C, G, Dh], slot-per-position
    # (quantized pools dequantize only the gathered slice)
    sel = table[:ctx_pages]
    k_dense = jnp.moveaxis(
        k_pool[:, sel].reshape(g, ctx_pages * page, dh), 0, 1)
    v_dense = jnp.moveaxis(
        v_pool[:, sel].reshape(g, ctx_pages * page, dh), 0, 1)
    if quantized:
        ks_dense = jnp.moveaxis(k_s[:, sel].reshape(g, ctx_pages * page), 0, 1)
        vs_dense = jnp.moveaxis(v_s[:, sel].reshape(g, ctx_pages * page), 0, 1)
        k_dense = k_dense.astype(jnp.float32) * ks_dense[..., None]
        v_dense = v_dense.astype(jnp.float32) * vs_dense[..., None]

    from ..ops.attention import attention_reference

    scale = cfg.scale if cfg.scale is not None else float(dh) ** -0.5
    attn = attention_reference(
        q, k_dense, v_dense, positions, scale=scale, is_causal=True,
        sliding_window_size=cfg.sliding_window_size,
        logit_soft_cap=cfg.logit_soft_cap, sinks=params.get("sinks"),
    )
    attn = attn.reshape(s, q_dim)

    if "gate" in params:
        gate = linear_apply(params["gate"]["w"], x)
        attn = (attn.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(attn.dtype)

    out = linear_apply(params["out"]["w"], attn, params["out"].get("b"))
    return out, new_pool


def paged_prefill_chunk(
    cfg: DecoderConfig,
    params: dict,
    pools: list,  # per-layer (k_pool, v_pool)
    tokens: jax.Array,  # [S] i32 — one slot's (padded) prompt chunk
    table: jax.Array,  # [MAXP] i32 — the slot's page table (trash-filled tail)
    pos0: jax.Array,  # scalar i32 — absolute position of row 0
    true_length: jax.Array,  # scalar i32 — real rows in the chunk
    ctx_pages: int,  # static: pages of context visible to this chunk
    aligned: bool = False,  # static: pos0 % page == 0 and S % page == 0
                            # (page-granular pool writes, see
                            # _attention_paged_prefill)
):
    """One prefill chunk of one slot written directly into the paged pools;
    returns (last-real-row logits [V], new pools). Replaces the v1
    dense-prefill + copy-in admission detour: no dense max_context state is
    ever allocated, and prefix-shared admissions can start past the shared
    pages (their K/V is already resident)."""
    tcfg = cfg.transformer_config
    ecfg = cfg.embedding_config
    s = tokens.shape[0]
    positions = pos0 + jnp.arange(s, dtype=jnp.int32)

    emb = params["embedding"].get("tied", params["embedding"].get("input"))
    x = embedding_lookup(emb, tokens)
    if ecfg.input_scale is not None:
        x = (x.astype(jnp.float32) * ecfg.input_scale).astype(x.dtype)

    new_pools = []
    for i, layer_cfg in enumerate(tcfg.layer_configs):
        p = params["layers"][i]
        pls = p.get("post_layer_scalar")
        h = (
            normalize(x, layer_cfg.pre_mixer_norm_config,
                      p["pre_mixer_norm"]["scales"], p["pre_mixer_norm"].get("biases"))
            if layer_cfg.pre_mixer_norm_config else x
        )
        src = layer_cfg.kv_source_layer_index
        a, pool_kv = _attention_paged_prefill(
            layer_cfg.mixer_config, layer_cfg, p["mixer"], h, positions,
            pools[i], table, ctx_pages, true_length,
            shared_kv=new_pools[src] if src is not None else None,
            aligned=aligned,
        )
        new_pools.append(pool_kv)
        if layer_cfg.post_mixer_norm_config is not None:
            a = normalize(a, layer_cfg.post_mixer_norm_config,
                          p["post_mixer_norm"]["scales"], p["post_mixer_norm"].get("biases"))
        x = (x.astype(jnp.float32) + a.astype(jnp.float32)).astype(x.dtype)
        if pls is not None:
            x = (x.astype(jnp.float32) * pls[0]).astype(x.dtype)
        hh = normalize(x, layer_cfg.pre_mlp_norm_config,
                       p["pre_mlp_norm"]["scales"], p["pre_mlp_norm"].get("biases"))
        m = mlp_forward(layer_cfg.mlp_config, p["mlp"], hh)
        if layer_cfg.post_mlp_norm_config is not None:
            m = normalize(m, layer_cfg.post_mlp_norm_config,
                          p["post_mlp_norm"]["scales"], p["post_mlp_norm"].get("biases"))
            if pls is not None:
                m = (m.astype(jnp.float32) * pls[0]).astype(m.dtype)
        x = (x.astype(jnp.float32) + m.astype(jnp.float32)).astype(x.dtype)

    x = normalize(x, tcfg.output_norm_config, params["output_norm"]["scales"],
                  params["output_norm"].get("biases"))
    x = jax.lax.dynamic_slice_in_dim(x, true_length - 1, 1, axis=0)
    out_table = params["embedding"].get("tied", params["embedding"].get("output"))
    logits = embedding_readout(out_table, x, ecfg.logit_soft_cap)
    return logits[0], new_pools


def _attention_paged_verify(cfg, layer_cfg, params, x, positions, pool_kv,
                            tables, ctx_pages, valid, shared_kv=None):
    """Multi-row batched attention straight into the pools: x [B, S, D]
    (S = draft block + 1 rows per slot at absolute positions [B, S]).
    `valid` [B] masks halted slots — their rows scatter into the trash page
    (tables' sentinel entry) so a dead slot can never clobber live pages.
    Reads reuse the prefill path's dense slot-per-position view, vmapped
    per slot over the shared (already-updated) pools."""
    b, s, d = x.shape
    h, g, dh = cfg.num_heads, cfg.num_groups, cfg.head_dim
    q_dim = h * dh

    qkv = linear_apply(params["qkv"]["w"], x, params["qkv"].get("b"))
    if cfg.is_kv_sharing:
        q = qkv.reshape(b, s, h, dh)
        k_new = v_new = None
    else:
        q = qkv[..., :q_dim].reshape(b, s, h, dh)
        k_new = qkv[..., q_dim : q_dim + g * dh].reshape(b, s, g, dh)
        v_new = qkv[..., q_dim + g * dh :].reshape(b, s, g, dh)

    if cfg.query_norm_config is not None:
        q = _head_norm(q, cfg.query_norm_config, params["q_norm_scales"])
    if k_new is not None and cfg.key_norm_config is not None:
        k_new = _head_norm(k_new, cfg.key_norm_config, params["k_norm_scales"])

    if layer_cfg.rope_config is not None:
        inv_freq, attn_scale = _inv_freq_cached(layer_cfg.rope_config)

        def rope_one(qi, posi):
            cos, sin = rope_tables(jnp.asarray(inv_freq), attn_scale, posi)
            return apply_rope(qi, cos, sin), (cos, sin)

        q, cs = jax.vmap(rope_one)(q, positions)
        if k_new is not None:
            k_new = jax.vmap(lambda ki, c: apply_rope(ki, c[0], c[1]))(k_new, cs)

    if shared_kv is not None:
        read_pool = shared_kv
        new_pool = None
        quantized = len(read_pool) == 4
    else:
        quantized = len(pool_kv) == 4
        page = (pool_kv[0]).shape[2]
        maxp = tables.shape[1] - 1  # sentinel entry = trash page
        pidx_logical = jnp.clip(positions // page, 0, maxp - 1)
        pidx = jnp.where(
            valid[:, None],
            jnp.take_along_axis(tables, pidx_logical, axis=1),
            jnp.take_along_axis(tables, jnp.full_like(pidx_logical, maxp), axis=1),
        )  # [B, S] physical pages
        off = positions % page
        if quantized:
            from .kv_cache import _quantize_rows

            k_pool, k_s, v_pool, v_s = pool_kv
            k_q, k_sc = _quantize_rows(k_new.reshape(b * s, g, dh))
            v_q, v_sc = _quantize_rows(v_new.reshape(b * s, g, dh))
            fi, fo = pidx.reshape(-1), off.reshape(-1)
            k_pool = k_pool.at[:, fi, fo].set(jnp.swapaxes(k_q, 0, 1))
            v_pool = v_pool.at[:, fi, fo].set(jnp.swapaxes(v_q, 0, 1))
            k_s = k_s.at[:, fi, fo].set(jnp.swapaxes(k_sc.reshape(b * s, g), 0, 1))
            v_s = v_s.at[:, fi, fo].set(jnp.swapaxes(v_sc.reshape(b * s, g), 0, 1))
            new_pool = (k_pool, k_s, v_pool, v_s)
        else:
            k_pool, v_pool = pool_kv
            fi, fo = pidx.reshape(-1), off.reshape(-1)
            k_pool = k_pool.at[:, fi, fo].set(
                jnp.swapaxes(k_new.reshape(b * s, g, dh), 0, 1).astype(k_pool.dtype))
            v_pool = v_pool.at[:, fi, fo].set(
                jnp.swapaxes(v_new.reshape(b * s, g, dh), 0, 1).astype(v_pool.dtype))
            new_pool = (k_pool, v_pool)
        read_pool = new_pool
    if quantized:
        k_pool, k_s, v_pool, v_s = read_pool
    else:
        k_pool, v_pool = read_pool
        k_s = v_s = None
    page = k_pool.shape[2]

    from ..ops.attention import attention_reference

    scale = cfg.scale if cfg.scale is not None else float(dh) ** -0.5

    def read_one(qi, posi, table):
        sel = table[:ctx_pages]
        k_dense = jnp.moveaxis(
            k_pool[:, sel].reshape(g, ctx_pages * page, dh), 0, 1)
        v_dense = jnp.moveaxis(
            v_pool[:, sel].reshape(g, ctx_pages * page, dh), 0, 1)
        if quantized:
            ks = jnp.moveaxis(k_s[:, sel].reshape(g, ctx_pages * page), 0, 1)
            vs = jnp.moveaxis(v_s[:, sel].reshape(g, ctx_pages * page), 0, 1)
            k_dense = k_dense.astype(jnp.float32) * ks[..., None]
            v_dense = v_dense.astype(jnp.float32) * vs[..., None]
        return attention_reference(
            qi, k_dense, v_dense, posi, scale=scale, is_causal=True,
            sliding_window_size=cfg.sliding_window_size,
            logit_soft_cap=cfg.logit_soft_cap, sinks=params.get("sinks"),
        )

    attn = jax.vmap(read_one)(q, positions, tables)  # [B, S, H, dh]
    attn = attn.reshape(b, s, q_dim)

    if "gate" in params:
        gate = linear_apply(params["gate"]["w"], x)
        attn = (attn.astype(jnp.float32) * jax.nn.sigmoid(gate.astype(jnp.float32))).astype(attn.dtype)

    out = linear_apply(params["out"]["w"], attn, params["out"].get("b"))
    return out, new_pool


def paged_verify_step(
    cfg: DecoderConfig,
    params: dict,
    pools: list,  # per-layer (k_pool, v_pool)
    tokens: jax.Array,  # [B, S] i32 — verify block per slot (root + drafts)
    tables: jax.Array,  # [B, MAXP] i32 (sentinel row maxp = trash page)
    pos0: jax.Array,  # [B] i32 — absolute position of each slot's row 0
    valid: jax.Array,  # [B] bool — False redirects a slot's writes to trash
    ctx_pages: int,  # static: pages visible to the reads
):
    """Advance every slot S tokens at once with logits at EVERY row (the
    chain-verify forward over the paged pools). The commit contract is the
    dense verify's pos-visibility one: the caller advances positions by the
    accepted length; rows written past it stay invisible behind lengths and
    the next round overwrites them in place."""
    tcfg = cfg.transformer_config
    ecfg = cfg.embedding_config
    b, s = tokens.shape
    positions = pos0[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]

    emb = params["embedding"].get("tied", params["embedding"].get("input"))
    # norms/MLP/readout run on flat [B*S, D] rows (mlp_forward and MoE are
    # 2D row-wise); only attention sees the [B, S] structure
    x = embedding_lookup(emb, tokens.reshape(b * s))
    if ecfg.input_scale is not None:
        x = (x.astype(jnp.float32) * ecfg.input_scale).astype(x.dtype)

    new_pools = []
    for i, layer_cfg in enumerate(tcfg.layer_configs):
        p = params["layers"][i]
        pls = p.get("post_layer_scalar")
        h = (
            normalize(x, layer_cfg.pre_mixer_norm_config,
                      p["pre_mixer_norm"]["scales"], p["pre_mixer_norm"].get("biases"))
            if layer_cfg.pre_mixer_norm_config else x
        )
        src = layer_cfg.kv_source_layer_index
        a, pool_kv = _attention_paged_verify(
            layer_cfg.mixer_config, layer_cfg, p["mixer"],
            h.reshape(b, s, -1), positions,
            pools[i], tables, ctx_pages, valid,
            shared_kv=new_pools[src] if src is not None else None,
        )
        a = a.reshape(b * s, -1)
        new_pools.append(pool_kv)
        if layer_cfg.post_mixer_norm_config is not None:
            a = normalize(a, layer_cfg.post_mixer_norm_config,
                          p["post_mixer_norm"]["scales"], p["post_mixer_norm"].get("biases"))
        x = (x.astype(jnp.float32) + a.astype(jnp.float32)).astype(x.dtype)
        if pls is not None:
            x = (x.astype(jnp.float32) * pls[0]).astype(x.dtype)
        hh = normalize(x, layer_cfg.pre_mlp_norm_config,
                       p["pre_mlp_norm"]["scales"], p["pre_mlp_norm"].get("biases"))
        m = mlp_forward(layer_cfg.mlp_config, p["mlp"], hh)
        if layer_cfg.post_mlp_norm_config is not None:
            m = normalize(m, layer_cfg.post_mlp_norm_config,
                          p["post_mlp_norm"]["scales"], p["post_mlp_norm"].get("biases"))
            if pls is not None:
                m = (m.astype(jnp.float32) * pls[0]).astype(m.dtype)
        x = (x.astype(jnp.float32) + m.astype(jnp.float32)).astype(x.dtype)

    x = normalize(x, tcfg.output_norm_config, params["output_norm"]["scales"],
                  params["output_norm"].get("biases"))
    out_table = params["embedding"].get("tied", params["embedding"].get("output"))
    logits = embedding_readout(out_table, x, ecfg.logit_soft_cap)
    return logits.reshape(b, s, -1), new_pools


def paged_decode_step(
    cfg: DecoderConfig,
    params: dict,
    pools: list,  # per-layer (k_pool, v_pool)
    tokens: jax.Array,  # [B] i32 — input token per slot
    tables: jax.Array,  # [B, MAXP] i32
    positions: jax.Array,  # [B] i32 — absolute position of each input token
):
    """Advance every slot one token; returns (logits [B, V], new pools).
    Appends each input token's K/V (at `positions`), attends over
    lengths = positions + 1."""
    tcfg = cfg.transformer_config
    ecfg = cfg.embedding_config
    page = next(p for p in pools if p is not None)[0].shape[2]
    pages_idx = jnp.take_along_axis(
        tables, (positions // page)[:, None], axis=1
    )[:, 0]
    offsets = positions % page
    lengths = positions + 1

    table = params["embedding"].get("tied", params["embedding"].get("input"))
    x = embedding_lookup(table, tokens)
    if ecfg.input_scale is not None:
        x = (x.astype(jnp.float32) * ecfg.input_scale).astype(x.dtype)

    new_pools = []
    for i, layer_cfg in enumerate(tcfg.layer_configs):
        p = params["layers"][i]
        pls = p.get("post_layer_scalar")
        h = (
            normalize(x, layer_cfg.pre_mixer_norm_config,
                      p["pre_mixer_norm"]["scales"], p["pre_mixer_norm"].get("biases"))
            if layer_cfg.pre_mixer_norm_config else x
        )
        src = layer_cfg.kv_source_layer_index
        a, new_pool = _attention_paged(
            layer_cfg.mixer_config, layer_cfg, p["mixer"], h, positions,
            pools[i], pages_idx, offsets, tables, lengths,
            shared_kv=new_pools[src] if src is not None else None,
        )
        new_pools.append(new_pool)
        if layer_cfg.post_mixer_norm_config is not None:
            a = normalize(a, layer_cfg.post_mixer_norm_config,
                          p["post_mixer_norm"]["scales"], p["post_mixer_norm"].get("biases"))
        x = (x.astype(jnp.float32) + a.astype(jnp.float32)).astype(x.dtype)
        if pls is not None:
            x = (x.astype(jnp.float32) * pls[0]).astype(x.dtype)
        hh = normalize(x, layer_cfg.pre_mlp_norm_config,
                       p["pre_mlp_norm"]["scales"], p["pre_mlp_norm"].get("biases"))
        m = mlp_forward(layer_cfg.mlp_config, p["mlp"], hh)
        if layer_cfg.post_mlp_norm_config is not None:
            m = normalize(m, layer_cfg.post_mlp_norm_config,
                          p["post_mlp_norm"]["scales"], p["post_mlp_norm"].get("biases"))
            if pls is not None:
                m = (m.astype(jnp.float32) * pls[0]).astype(m.dtype)
        x = (x.astype(jnp.float32) + m.astype(jnp.float32)).astype(x.dtype)

    x = normalize(x, tcfg.output_norm_config, params["output_norm"]["scales"],
                  params["output_norm"].get("biases"))
    out_table = params["embedding"].get("tied", params["embedding"].get("output"))
    logits = embedding_readout(out_table, x, ecfg.logit_soft_cap)
    return logits, new_pools

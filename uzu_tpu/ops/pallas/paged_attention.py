"""Paged decode attention: per-slot page tables over a shared KV pool.

The kernel a paged KV cache NEEDS on TPU: without it, reading a slot's
scattered pages means materializing the gathered [C, G, Dh] KV in HBM every
step (jax's bundled paged_attention kernel does the right thing but its
out_specs violate this Mosaic version's tiling checks, so this kernel is
built from the patterns proven on this stack: pure 2D blocks, scalar
prefetch for the page table, lane-replicated running stats, in-kernel
masks from program ids).

Layout:
- pool2 [G * P * page, Dh]: all pages of all KV groups, flattened to 2D;
  page p of group g occupies rows [(g*P + p)*page, +page).
- q2 [B * G * 8, Dh]: per (slot, group) the rep query heads, padded to 8
  sublanes (decode: one token per slot).
- page_table [B, MAXP] i32 (scalar-prefetched): logical page j of slot b
  lives in physical page table[b, j]; unused entries must be a valid index
  (0) — their tokens are masked by `lengths`.
- lengths [B] i32 (scalar-prefetched): tokens visible to slot b's query.

Grid (B, G, MAXP), pages innermost; the block index map reads the page
table so each step's DMA pulls exactly that slot's next logical page.
Out-of-range pages (past a slot's length, or before its sliding window)
clamp their block index to the nearest live page, so consecutive grid
steps see an unchanged index and Mosaic's pipeliner skips the DMA.

Feature parity with the dense attention core (ops/attention.py, reference
/root/reference/crates/backend-uzu/src/encodable_block/mixer/attention):
GQA, tanh logit soft cap, sliding window (kpos > qpos - window), and
attention sinks — the kernel emits its running (m, l) softmax stats so the
host folds the per-head phantom sink logit in as out * l / (l + e^(s-m)).
INT8 pools stream i8 codes + per-(token, kv-head) scales through the same
page-table DMAs (half the KV bytes of bf16).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
QROWS = 8  # rep heads padded to the f32 sublane minimum
_STAT_LANES = 128


def _page_window(length, *, page, window):
    """First/last live logical page for a slot (inclusive), as traced i32."""
    last = jnp.maximum((length - 1) // page, 0)
    if window is None:
        first = jnp.zeros_like(last)
    else:
        first = jnp.clip((length - window) // page, 0, last)
    return first, last


def _flash_update(scores, v_blk, m_ref, l_ref, acc_ref, vs=None):
    m_prev = m_ref[:]
    m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(scores - m_new[:, :1])
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    if vs is not None:
        p = p * vs
    acc_ref[:] = acc_ref[:] * alpha[:, :1] + jax.lax.dot_general(
        p.astype(jnp.bfloat16), v_blk,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_ref[:] = m_new


def _kernel(table_ref, len_ref, q_ref, k_ref, v_ref, o_ref, m_out, l_out,
            m_ref, l_ref, acc_ref, *, page, maxp, scale, soft_cap, window):
    b, j = pl.program_id(0), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b]
    first, last = _page_window(length, page=page, window=window)

    @pl.when((length > 0) & (first <= j) & (j <= last))
    def _():
        q = q_ref[:]  # [QROWS, Dh]
        k_blk = k_ref[:]  # [page, Dh]
        v_blk = v_ref[:].astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k_blk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [QROWS, page]
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        pos = j * page + jax.lax.broadcasted_iota(jnp.int32, (QROWS, page), 1)
        valid = pos < length
        if window is not None:
            valid = valid & (pos >= length - window)
        scores = jnp.where(valid, scores, NEG_INF)
        _flash_update(scores, v_blk, m_ref, l_ref, acc_ref)

    @pl.when(j == maxp - 1)
    def _():
        o_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        m_out[:] = m_ref[:]
        l_out[:] = l_ref[:]


def _kernel_i8(table_ref, len_ref, q_ref, k_ref, ks_ref, v_ref, vs_ref,
               o_ref, m_out, l_out, m_ref, l_ref, acc_ref, *, page, maxp,
               p_total, scale, soft_cap, window):
    """INT8-pool variant: K/V blocks are i8 codes, ks/vs hold the
    per-(token, kv-head) absmax scales. Dequant folds into the dots:
    q.(c_k * s) == (q.c_k) * s broadcast over tokens, and
    p.(c_v * s) == (p * s).c_v — the codes stream stays int8 in HBM, so a
    page costs half the bytes of the bf16 pool (the reference's matmul
    dequant-fusion discipline applied to the paged-KV read).

    Mosaic requires block sublane dims divisible by 8, so the scale block
    is the 8-row window [8*(row//8), +8) of the [G*P, page] scale plane
    (row = gi*P + physical page); the kernel selects the live row with a
    masked sum over sublanes (pure vector ops — no dynamic slicing)."""
    b, gi, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b]
    first, last = _page_window(length, page=page, window=window)

    @pl.when((length > 0) & (first <= j) & (j <= last))
    def _():
        # inside the guard j is in [first, last], so the index maps'
        # clamped j_eff == j and this block IS page table[b, j]
        row = gi * p_total + table_ref[b, j]
        sel = (jax.lax.broadcasted_iota(jnp.int32, (8, page), 0)
               == row % 8).astype(jnp.float32)
        ks = jnp.sum(ks_ref[:] * sel, axis=0, keepdims=True)  # [1, page]
        vs = jnp.sum(vs_ref[:] * sel, axis=0, keepdims=True)

        q = q_ref[:]  # [QROWS, Dh]
        # i8 -> i32 -> bf16 (Mosaic has no direct 8-bit -> float cast)
        k_blk = k_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        v_blk = v_ref[:].astype(jnp.int32).astype(jnp.bfloat16)
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k_blk,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * (ks * scale)  # [QROWS, page] * [1, page]
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        pos = j * page + jax.lax.broadcasted_iota(jnp.int32, (QROWS, page), 1)
        valid = pos < length
        if window is not None:
            valid = valid & (pos >= length - window)
        scores = jnp.where(valid, scores, NEG_INF)
        _flash_update(scores, v_blk, m_ref, l_ref, acc_ref, vs=vs)

    @pl.when(j == maxp - 1)
    def _():
        o_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        m_out[:] = m_ref[:]
        l_out[:] = l_ref[:]


def _specs(g, p_total, page, dh, *, quantized, window):
    def q_index(bi, gi, j, table_ref, len_ref):
        return (bi * g + gi, 0)

    def kv_index(bi, gi, j, table_ref, len_ref):
        # clamp dead grid steps onto a live page: an unchanged block index
        # between consecutive steps means Mosaic skips the DMA entirely
        first, last = _page_window(len_ref[bi], page=page, window=window)
        j_eff = jnp.clip(j, first, last)
        return (gi * p_total + table_ref[bi, j_eff], 0)

    def scale_index(bi, gi, j, table_ref, len_ref):
        # 8-row window of the [G*P, page] scale plane holding this page's
        # row (Mosaic block sublane dims must be 8-divisible)
        first, last = _page_window(len_ref[bi], page=page, window=window)
        j_eff = jnp.clip(j, first, last)
        return ((gi * p_total + table_ref[bi, j_eff]) // 8, 0)

    in_specs = [
        pl.BlockSpec((QROWS, dh), q_index),
        pl.BlockSpec((page, dh), kv_index),
    ]
    if quantized:
        in_specs.append(pl.BlockSpec((8, page), scale_index))
    in_specs.append(pl.BlockSpec((page, dh), kv_index))
    if quantized:
        in_specs.append(pl.BlockSpec((8, page), scale_index))
    out_specs = (
        pl.BlockSpec((QROWS, dh), q_index),
        pl.BlockSpec((QROWS, _STAT_LANES), q_index),
        pl.BlockSpec((QROWS, _STAT_LANES), q_index),
    )
    return in_specs, out_specs


@functools.partial(
    jax.jit,
    static_argnames=("g", "page", "scale", "soft_cap", "window", "interpret"),
)
def _paged_p(q2, pool_k2, pool_v2, page_table, lengths, *, g, page,
             scale, soft_cap, window, interpret):
    bg, dh = q2.shape
    b = bg // (g * QROWS)
    p_total = pool_k2.shape[0] // (g * page)
    maxp = page_table.shape[1]
    in_specs, out_specs = _specs(g, p_total, page, dh,
                                 quantized=False, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, g, maxp),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((QROWS, _STAT_LANES), jnp.float32),
            pltpu.VMEM((QROWS, _STAT_LANES), jnp.float32),
            pltpu.VMEM((QROWS, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, page=page, maxp=maxp, scale=scale,
                          soft_cap=soft_cap, window=window),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bg, dh), jnp.float32),
            jax.ShapeDtypeStruct((bg, _STAT_LANES), jnp.float32),
            jax.ShapeDtypeStruct((bg, _STAT_LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, q2, pool_k2, pool_v2)


@functools.partial(
    jax.jit,
    static_argnames=("g", "page", "scale", "soft_cap", "window", "interpret"),
)
def _paged_p_i8(q2, pool_k2, pool_v2, ks2, vs2, page_table, lengths, *, g,
                page, scale, soft_cap, window, interpret):
    bg, dh = q2.shape
    b = bg // (g * QROWS)
    p_total = pool_k2.shape[0] // (g * page)
    maxp = page_table.shape[1]
    in_specs, out_specs = _specs(g, p_total, page, dh,
                                 quantized=True, window=window)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(b, g, maxp),
        in_specs=in_specs,
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((QROWS, _STAT_LANES), jnp.float32),
            pltpu.VMEM((QROWS, _STAT_LANES), jnp.float32),
            pltpu.VMEM((QROWS, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel_i8, page=page, maxp=maxp, p_total=p_total,
                          scale=scale, soft_cap=soft_cap, window=window),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((bg, dh), jnp.float32),
            jax.ShapeDtypeStruct((bg, _STAT_LANES), jnp.float32),
            jax.ShapeDtypeStruct((bg, _STAT_LANES), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, q2, pool_k2, ks2, pool_v2, vs2)


def paged_decode_attention(
    q,  # [B, H, Dh] — one decode token per slot
    k_pool,  # [G, P, page, Dh] (bf16/f32, or i8 codes with k_scales)
    v_pool,
    page_table,  # [B, MAXP] i32 (unused entries must be valid, e.g. 0)
    lengths,  # [B] i32 — visible tokens per slot
    *,
    scale: float,
    logit_soft_cap=None,
    sliding_window_size=None,
    sinks=None,  # [H] — per-head phantom softmax logit
    k_scales=None,  # [G, P, page] f32 — per-(token, kv-head) absmax scales
    v_scales=None,
    interpret: bool = False,
):
    bsz, h, dh = q.shape
    g, p_total, page, _ = k_pool.shape
    rep = h // g
    assert rep <= QROWS, (rep, QROWS)
    # rows per (b, g): rep heads padded to QROWS sublanes
    q_r = q.reshape(bsz, g, rep, dh)
    q_r = jnp.pad(q_r, ((0, 0), (0, 0), (0, QROWS - rep), (0, 0)))
    q2 = q_r.reshape(bsz * g * QROWS, dh)
    pool_k2 = k_pool.reshape(g * p_total * page, dh)
    pool_v2 = v_pool.reshape(g * p_total * page, dh)
    window = (None if sliding_window_size is None
              else int(sliding_window_size))
    if k_scales is not None:
        # scales ride the same page-table DMAs as 8-row windows of the
        # [G*P, page] plane (sublane-padded when G*P % 8 != 0)
        ks2 = k_scales.reshape(g * p_total, page).astype(jnp.float32)
        vs2 = v_scales.reshape(g * p_total, page).astype(jnp.float32)
        if ks2.shape[0] % 8:
            pad = 8 - ks2.shape[0] % 8
            ks2 = jnp.pad(ks2, ((0, pad), (0, 0)))
            vs2 = jnp.pad(vs2, ((0, pad), (0, 0)))
        out, m, l = _paged_p_i8(
            q2, pool_k2, pool_v2, ks2, vs2, page_table.astype(jnp.int32),
            lengths.astype(jnp.int32), g=g, page=page, scale=scale,
            soft_cap=logit_soft_cap, window=window, interpret=interpret,
        )
    else:
        out, m, l = _paged_p(
            q2, pool_k2, pool_v2, page_table.astype(jnp.int32),
            lengths.astype(jnp.int32), g=g, page=page, scale=scale,
            soft_cap=logit_soft_cap, window=window, interpret=interpret,
        )
    out = out.reshape(bsz, g, QROWS, dh)
    if sinks is not None:
        # fold the phantom logit into the kernel's running softmax stats:
        # softmax-with-sink == out * l / (l + e^(sink - m))
        m = m.reshape(bsz, g, QROWS, _STAT_LANES)[..., 0]
        l = l.reshape(bsz, g, QROWS, _STAT_LANES)[..., 0]
        s = jnp.pad(sinks.astype(jnp.float32).reshape(g, rep),
                    ((0, 0), (0, QROWS - rep)))[None]
        out = out * (l / (l + jnp.exp(s - m)))[..., None]
    out = out[:, :, :rep]
    return out.reshape(bsz, h, dh).astype(q.dtype)


def paged_attention_reference(q, k_pool, v_pool, page_table, lengths, *,
                              scale, logit_soft_cap=None,
                              sliding_window_size=None, sinks=None,
                              k_scales=None, v_scales=None):
    """Pure-XLA oracle: gather pages, mask by length, softmax-attend.
    k_scales/v_scales [G, P, page] dequantize INT8 pools on the gathered
    slice only (same per-(token, kv-head) scheme as the dense caches)."""
    bsz, h, dh = q.shape
    g, p_total, page, _ = k_pool.shape
    rep = h // g
    maxp = page_table.shape[1]
    # gathered [B, G, MAXP*page, Dh]
    k = k_pool[:, page_table]  # [G, B, MAXP, page, Dh]
    v = v_pool[:, page_table]
    k = jnp.moveaxis(k, 1, 0).reshape(bsz, g, maxp * page, dh)
    v = jnp.moveaxis(v, 1, 0).reshape(bsz, g, maxp * page, dh)
    if k_scales is not None:
        ks = jnp.moveaxis(k_scales[:, page_table], 1, 0).reshape(bsz, g, maxp * page)
        vs = jnp.moveaxis(v_scales[:, page_table], 1, 0).reshape(bsz, g, maxp * page)
        k = k.astype(jnp.float32) * ks[..., None]
        v = v.astype(jnp.float32) * vs[..., None]
    qf = q.reshape(bsz, g, rep, dh).astype(jnp.float32)
    scores = jnp.einsum("bgrd,bgcd->bgrc", qf, k.astype(jnp.float32)) * scale
    if logit_soft_cap is not None:
        scores = logit_soft_cap * jnp.tanh(scores / logit_soft_cap)
    pos = jnp.arange(maxp * page)[None, None, None, :]
    valid = pos < lengths[:, None, None, None]
    if sliding_window_size is not None:
        valid = valid & (pos >= lengths[:, None, None, None] - sliding_window_size)
    scores = jnp.where(valid, scores, NEG_INF)
    if sinks is not None:
        sink = sinks.astype(jnp.float32).reshape(1, g, rep, 1)
        sink = jnp.broadcast_to(sink, (bsz, g, rep, 1))
        scores = jnp.concatenate([scores, sink], axis=-1)
    probs = jax.nn.softmax(scores, axis=-1)
    if sinks is not None:
        probs = probs[..., :-1]
    out = jnp.einsum("bgrc,bgcd->bgrd", probs, v.astype(jnp.float32))
    return out.reshape(bsz, h, dh).astype(q.dtype)

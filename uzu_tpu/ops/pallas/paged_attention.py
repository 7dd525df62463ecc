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


def _kernel(table_ref, len_ref, q_ref, k_ref, v_ref, o_ref,
            m_ref, l_ref, acc_ref, *, page, maxp, scale, soft_cap):
    b, j = pl.program_id(0), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    length = len_ref[b]

    @pl.when(j * page < length)
    def _():
        q = q_ref[:]  # [QROWS, Dh]
        k_blk = k_ref[:]  # [page, Dh]
        v_blk = v_ref[:]
        scores = jax.lax.dot_general(
            q.astype(jnp.bfloat16), k_blk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # [QROWS, page]
        if soft_cap is not None:
            scores = soft_cap * jnp.tanh(scores / soft_cap)
        pos = j * page + jax.lax.broadcasted_iota(jnp.int32, (QROWS, page), 1)
        scores = jnp.where(pos < length, scores, NEG_INF)

        m_prev = m_ref[:]
        m_new = jnp.maximum(m_prev, jnp.max(scores, axis=-1, keepdims=True))
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(scores - m_new[:, :1])
        l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_ref[:] = acc_ref[:] * alpha[:, :1] + jax.lax.dot_general(
            p.astype(jnp.bfloat16), v_blk.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_ref[:] = m_new

    @pl.when(j == maxp - 1)
    def _():
        o_ref[:] = acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)


@functools.partial(
    jax.jit,
    static_argnames=("g", "page", "scale", "soft_cap", "interpret"),
)
def _paged_p(q2, pool_k2, pool_v2, page_table, lengths, *, g, page,
             scale, soft_cap, interpret):
    bg, dh = q2.shape
    b = bg // (g * QROWS)
    p_total = pool_k2.shape[0] // (g * page)
    maxp = page_table.shape[1]
    grid = (b, g, maxp)

    def q_index(bi, gi, j, table_ref, len_ref):
        return (bi * g + gi, 0)

    def kv_index(bi, gi, j, table_ref, len_ref):
        return (gi * p_total + table_ref[bi, j], 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((QROWS, dh), q_index),
            pl.BlockSpec((page, dh), kv_index),
            pl.BlockSpec((page, dh), kv_index),
        ],
        out_specs=pl.BlockSpec((QROWS, dh), q_index),
        scratch_shapes=[
            pltpu.VMEM((QROWS, _STAT_LANES), jnp.float32),
            pltpu.VMEM((QROWS, _STAT_LANES), jnp.float32),
            pltpu.VMEM((QROWS, dh), jnp.float32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_kernel, page=page, maxp=maxp, scale=scale,
                          soft_cap=soft_cap),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bg, dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(page_table, lengths, q2, pool_k2, pool_v2)


def paged_decode_attention(
    q,  # [B, H, Dh] — one decode token per slot
    k_pool,  # [G, P, page, Dh]
    v_pool,
    page_table,  # [B, MAXP] i32 (unused entries must be valid, e.g. 0)
    lengths,  # [B] i32 — visible tokens per slot
    *,
    scale: float,
    logit_soft_cap=None,
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
    out = _paged_p(
        q2, pool_k2, pool_v2, page_table.astype(jnp.int32),
        lengths.astype(jnp.int32), g=g, page=page, scale=scale,
        soft_cap=logit_soft_cap, interpret=interpret,
    )
    out = out.reshape(bsz, g, QROWS, dh)[:, :, :rep]
    return out.reshape(bsz, h, dh).astype(q.dtype)


def paged_attention_reference(q, k_pool, v_pool, page_table, lengths, *,
                              scale, logit_soft_cap=None,
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
    scores = jnp.where(pos < lengths[:, None, None, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bgrc,bgcd->bgrd", probs, v.astype(jnp.float32))
    return out.reshape(bsz, h, dh).astype(q.dtype)

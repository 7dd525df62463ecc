"""Flash-attention prefill kernel: tiled online softmax, no HBM score
materialization.

Role of the reference's AttentionGemm (prefill core, attention_gemm.metal)
and AttentionTwoPass (FlashDecoding) kernels. The XLA einsum path
materializes [G, rep, S, C] f32 scores in HBM three times over (write, mask/
softmax read, probs read) — ~200 MB per flagship layer at S=512/C=1024,
measured as the dominant cost of the whole prefill step. This kernel keeps
each [BQ, BK] score tile in VMEM with running (max, sum, acc) across KV
tiles.

Structure notes (hard-won on the axon v5e stack):
- everything is 2D: queries fold (group, S, rep) into rows — q2 [G*S*rep,
  Dh] — and K/V fold (group, slot) — k2 [G*C, Dh]; the grid (G, R/BQ, C/BK)
  indexes plain 2D tiles of both (q tile g*(R/BQ)+i, kv tile g*(C/BK)+j);
- causal/window masks are computed IN-KERNEL from program ids + a scalar
  pos0 (SMEM): per-row position = pos0 + global_row // rep, per-column
  position = slot index. Passing [N, 1] position arrays made XLA
  stack-allocate the kernel I/O in scoped VMEM (lane-padded 128x, a fixed
  88.5 MB request) and reject the kernel;
- m/l running stats are lane-replicated [BQ, 128] scratch like the
  reference jax flash kernel, not [BQ, 1].

Consequently the kernel covers the contiguous slot==position cache layout
(standard prefill); ring-window layouts keep the einsum path. KV is bf16,
or INT8 codes + per-slot scales ([G*C, 1]) dequantized in VMEM.

Status on v5e: compiles and matches the oracle (7e-4 over random inputs),
but XLA's einsum/online-softmax paths are faster IN CONTEXT at every
tested size (S=512: C=1024 and C=4096) — XLA overlaps their HBM score
traffic with the next quantized matmul's weight-prefetch DMA, and a
custom call is a barrier in that pipeline. Dispatch is therefore
interpreter-mode only (see attention_reference); the kernel stays as the
measured-and-tested option for hardware/scales where attention traffic
dominates weight streaming.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
_STAT_LANES = 128  # lane-replicated running-stat scratch


def _accumulate(q, k_blk, v_blk, pos0, i, j, m_ref, l_ref, acc_ref, *,
                bq, bk, rep, scale, soft_cap, window):
    scores = jax.lax.dot_general(
        q.astype(jnp.bfloat16), k_blk.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale  # [BQ, BK]
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)

    # positions from the grid: row r of this tile is global row i*bq + r,
    # its token position pos0 + row // rep; kv column c is slot j*bk + c
    rows = i * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 0)
    qpos = pos0 + rows // rep
    kpos = j * bk + jax.lax.broadcasted_iota(jnp.int32, (bq, bk), 1)
    valid = kpos <= qpos
    if window is not None:
        valid = valid & (kpos > qpos - window)
    scores = jnp.where(valid, scores, NEG_INF)

    m_prev = m_ref[:]  # [BQ, LANES]
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


def _finalize(sink_ref, o_ref, m_ref, l_ref, acc_ref, gi, *, has_sink, rep):
    m_fin = m_ref[:, :1]
    l_fin = l_ref[:, :1]
    acc = acc_ref[:]
    if has_sink:
        # sinks arrive as [G, rep]; rows are ordered (s, r) so a row's sink
        # is sinks[gi, row % rep]. Expand via iota-compare + matmul (a
        # [R, 1] per-row array would lane-pad 128x in VMEM)
        bq = m_fin.shape[0]
        sink_g = sink_ref[pl.ds(gi, 1), :].astype(jnp.float32)  # [1, rep]
        row_r = jax.lax.broadcasted_iota(jnp.int32, (bq, rep), 0) % rep
        col = jax.lax.broadcasted_iota(jnp.int32, (bq, rep), 1)
        sel = (row_r == col).astype(jnp.float32)
        sink = jnp.dot(sel, sink_g.reshape(rep, 1),
                       preferred_element_type=jnp.float32)  # [BQ, 1]
        m2 = jnp.maximum(m_fin, sink)
        l_fin = l_fin * jnp.exp(m_fin - m2) + jnp.exp(sink - m2)
        acc = acc * jnp.exp(m_fin - m2)
    o_ref[:] = acc / jnp.maximum(l_fin, 1e-30)


def _init(m_ref, l_ref, acc_ref):
    m_ref[:] = jnp.full_like(m_ref, NEG_INF)
    l_ref[:] = jnp.zeros_like(l_ref)
    acc_ref[:] = jnp.zeros_like(acc_ref)


def _kernel_plain(pos0_ref, q_ref, k_ref, v_ref, sink_ref,
                  o_ref, m_ref, l_ref, acc_ref, *,
                  bq, bk, scale, soft_cap, window, last_j, has_sink, rep):
    gi, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        _init(m_ref, l_ref, acc_ref)

    _accumulate(
        q_ref[:], k_ref[:], v_ref[:], pos0_ref[0], i, j, m_ref, l_ref,
        acc_ref, bq=bq, bk=bk, rep=rep, scale=scale, soft_cap=soft_cap,
        window=window,
    )

    @pl.when(j == last_j)
    def _():
        _finalize(sink_ref, o_ref, m_ref, l_ref, acc_ref, gi,
                  has_sink=has_sink, rep=rep)


def _kernel_quant(pos0_ref, q_ref, kq_ref, ks_ref, vq_ref, vs_ref, sink_ref,
                  o_ref, m_ref, l_ref, acc_ref, *,
                  bq, bk, scale, soft_cap, window, last_j, has_sink, rep):
    gi, i, j = pl.program_id(0), pl.program_id(1), pl.program_id(2)

    @pl.when(j == 0)
    def _():
        _init(m_ref, l_ref, acc_ref)

    # int8 codes -> f32 via i32 (Mosaic has no direct i8->f32 cast);
    # per-slot scale [BK, 1] broadcast over head_dim
    k_blk = (kq_ref[:].astype(jnp.int32).astype(jnp.float32)
             * ks_ref[:].astype(jnp.float32))
    v_blk = (vq_ref[:].astype(jnp.int32).astype(jnp.float32)
             * vs_ref[:].astype(jnp.float32))
    _accumulate(
        q_ref[:], k_blk, v_blk, pos0_ref[0], i, j, m_ref, l_ref, acc_ref,
        bq=bq, bk=bk, rep=rep, scale=scale, soft_cap=soft_cap, window=window,
    )

    @pl.when(j == last_j)
    def _():
        _finalize(sink_ref, o_ref, m_ref, l_ref, acc_ref, gi,
                  has_sink=has_sink, rep=rep)


def _pick(n, cands):
    for c in cands:
        if n % c == 0:
            return c
    return 0


@functools.partial(
    jax.jit,
    static_argnames=("g", "scale", "soft_cap", "window", "interpret",
                     "kv_quant", "has_sink", "rep"),
)
def _flash_p(q2, k2, v2, ks2, vs2, pos0, sinks2, *, g,
             scale, soft_cap, window, interpret, kv_quant, has_sink, rep):
    """q2 [G*R, Dh]; k2/v2 [G*C, Dh] bf16 or int8 codes; ks2/vs2 [G*C, 1]
    f32 (ignored unless kv_quant); pos0 scalar i32 (position of the first
    query row); sinks2 [G, rep] f32. Returns [G*R, Dh] f32."""
    gr, dh = q2.shape
    r = gr // g
    c = k2.shape[0] // g
    bq = _pick(r, (256, 512, 128, 64, 32, 16, 8))
    bk = _pick(c, (512, 256, 128))
    assert bq and bk, (r, c)
    ni, nj = r // bq, c // bk
    grid = (g, ni, nj)

    q_spec = pl.BlockSpec((bq, dh), lambda gi, i, j: (gi * ni + i, 0))
    kv_spec = pl.BlockSpec((bk, dh), lambda gi, i, j: (gi * nj + j, 0))
    kvs_spec = pl.BlockSpec((bk, 1), lambda gi, i, j: (gi * nj + j, 0))
    sink_spec = pl.BlockSpec((g, rep), lambda gi, i, j: (0, 0))
    out_spec = pl.BlockSpec((bq, dh), lambda gi, i, j: (gi * ni + i, 0))
    pos0_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scratch = [
        pltpu.VMEM((bq, _STAT_LANES), jnp.float32),
        pltpu.VMEM((bq, _STAT_LANES), jnp.float32),
        pltpu.VMEM((bq, dh), jnp.float32),
    ]
    common = dict(bq=bq, bk=bk, scale=scale, soft_cap=soft_cap,
                  window=window, last_j=nj - 1, has_sink=has_sink, rep=rep)
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    pos0 = pos0.reshape(1).astype(jnp.int32)

    if kv_quant:
        out = pl.pallas_call(
            functools.partial(_kernel_quant, **common),
            grid=grid,
            in_specs=[pos0_spec, q_spec, kv_spec, kvs_spec, kv_spec,
                      kvs_spec, sink_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((gr, dh), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(pos0, q2, k2, ks2, v2, vs2, sinks2)
    else:
        out = pl.pallas_call(
            functools.partial(_kernel_plain, **common),
            grid=grid,
            in_specs=[pos0_spec, q_spec, kv_spec, kv_spec, sink_spec],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((gr, dh), jnp.float32),
            scratch_shapes=scratch,
            compiler_params=params,
            interpret=interpret,
        )(pos0, q2, k2, v2, sinks2)
    return out


# the flash path needs enough query rows per group to fill MXU tiles; below
# this the einsum path's materialization is cheap anyway
FLASH_MIN_ROWS = 64


def supported(s, h, g, dh, c, *, is_causal, suffix_mask, kv_valid_length,
              kv_positions=None) -> bool:
    rep = h // g
    r = s * rep
    return (
        is_causal
        and suffix_mask is None
        and kv_valid_length is None
        and kv_positions is None  # contiguous slot==position layouts only
        and r >= FLASH_MIN_ROWS
        and bool(_pick(r, (256, 512, 128, 64, 32, 16, 8)))
        and bool(_pick(c, (512, 256, 128)))
        and dh % 8 == 0
    )


def flash_attention(
    q,  # [S, H, Dh]
    k_cache,  # [C, G, Dh] bf16/f32 OR int8 codes (with scales given)
    v_cache,
    q_positions,  # [S] i32 — must be contiguous pos0 + arange(S)
    *,
    scale: float,
    sliding_window_size=None,
    logit_soft_cap=None,
    sinks=None,  # [H]
    k_scales=None,  # [C, G] (int8 KV)
    v_scales=None,
    interpret: bool = False,
):
    s, h, dh = q.shape
    c, g, _ = k_cache.shape
    rep = h // g
    r = s * rep
    # head h = g*rep + r_idx (GQA grouping); per group, rows ordered (s, r)
    q2 = q.reshape(s, g, rep, dh).transpose(1, 0, 2, 3).reshape(g * r, dh)
    k2 = jnp.swapaxes(k_cache, 0, 1).reshape(g * c, dh)
    v2 = jnp.swapaxes(v_cache, 0, 1).reshape(g * c, dh)
    pos0 = q_positions[0].astype(jnp.int32)
    has_sink = sinks is not None
    if has_sink:
        sinks2 = sinks.astype(jnp.float32).reshape(g, rep)
    else:
        sinks2 = jnp.zeros((g, rep), jnp.float32)
    kv_quant = k_scales is not None
    if kv_quant:
        ks2 = k_scales.astype(jnp.float32).T.reshape(g * c, 1)
        vs2 = v_scales.astype(jnp.float32).T.reshape(g * c, 1)
    else:
        ks2 = jnp.zeros((g * c, 1), jnp.float32)
        vs2 = jnp.zeros((g * c, 1), jnp.float32)

    out = _flash_p(
        q2, k2, v2, ks2, vs2, pos0, sinks2, g=g,
        scale=scale, soft_cap=logit_soft_cap, window=sliding_window_size,
        interpret=interpret, kv_quant=kv_quant, has_sink=has_sink, rep=rep,
    )
    return (
        out.reshape(g, s, rep, dh).transpose(1, 0, 2, 3).reshape(s, h, dh)
        .astype(q.dtype)
    )

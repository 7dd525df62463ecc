"""Grouped (ragged) expert matmul for MoE prefill.

Role parity: the reference's two-pass tiled expert prefill pipeline
(crates/backend-uzu/src/backends/metal/kernel/moe/experts_two_pass_prefill.metal:23,
:327 with GPU-built tile maps in tiles_map.metal:8,:23). Its Metal design
builds a tile->(expert, row-range) map on-GPU and launches one threadgroup
per tile so each expert only computes its routed tokens. The TPU-native
equivalent here:

- Tokens are SORTED by routed expert and scattered into a padded buffer in
  which every expert's token group is padded up to a multiple of the M-tile
  (the MegaBlocks dMoE layout) — so every Pallas m-tile belongs to exactly
  one expert.
- A per-tile expert id array rides scalar prefetch (SMEM); each (mt, nt)
  grid step streams that expert's [BN, K] weight block and does one
  [BM, K] x [K, BN] MXU dot. Tiles past the used range (the data-dependent
  padding tail inside the static worst-case buffer) skip compute entirely
  and keep the previous tile's weight index so no extra weight DMA fires.
- FLOPs are ~S*K_active*3*dff*D instead of the masked-dense path's
  S*E*3*dff*D (E/K_active x saved); weight traffic grows only by the
  per-m-tile re-reads (T/BM + E/2 expert-block reads vs E).

All shapes static under jit: the padded buffer is sized for the worst case
(every expert's group padded by BM-1) and the used-tile count is a traced
scalar consumed via @pl.when.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for one weight block (bytes, double-buffered by the pipeline)
_W_BLOCK_BUDGET = 4 * 1024 * 1024


def _pick(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def pick_blocks(n: int, k: int, itemsize: int = 2):
    """(bn, bk) or None when the shape doesn't tile on Mosaic: the weight
    block's lane dim (bk) must be 128-divisible or the whole K; bn likewise
    for the OUTPUT block's lane dim."""
    bn = _pick(n, (256, 128))
    if not bn:
        return None
    bk = _pick(k, (1024, 512, 256))
    if not bk:
        bk = k  # whole-K block (e.g. gpt-oss d=2880: not 128-divisible)
    if bn * bk * itemsize > _W_BLOCK_BUDGET:
        return None
    return bn, bk


def supports(n: int, k: int) -> bool:
    return pick_blocks(n, k) is not None


def _kernel(tile_expert_ref, used_ref, x_ref, w_ref, o_ref, acc_ref, *,
            nk: int):
    mt = pl.program_id(0)
    kt = pl.program_id(2) if nk > 1 else 0

    @pl.when(mt < used_ref[0])
    def _():
        if nk > 1:
            @pl.when(kt == 0)
            def _():
                acc_ref[...] = jnp.zeros_like(acc_ref)

            acc_ref[...] += jax.lax.dot_general(
                x_ref[...], w_ref[0],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

            @pl.when(kt == nk - 1)
            def _():
                o_ref[...] = acc_ref[...]
        else:
            o_ref[...] = jax.lax.dot_general(
                x_ref[...], w_ref[0],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def grouped_matmul(x_pad: jax.Array, w: jax.Array, tile_expert: jax.Array,
                   used_tiles: jax.Array, *, bm: int = 64,
                   interpret: bool = False) -> jax.Array:
    """x_pad [Tp, K] (expert-sorted, tile-padded), w [E, N, K],
    tile_expert [Tp//bm] int32, used_tiles [1] int32 -> y [Tp, N] f32.

    Rows of x_pad beyond the used range produce UNDEFINED output rows (the
    caller gathers only real-token rows back out)."""
    tp, k = x_pad.shape
    e, n, wk = w.shape
    assert wk == k and tp % bm == 0
    blocks = pick_blocks(n, k, w.dtype.itemsize)
    if blocks is None:
        raise ValueError(f"grouped_matmul: shape N={n} K={k} does not tile")
    bn, bk = blocks
    nk = k // bk
    nmt = tp // bm

    def x_index(mt, nt, kt, te_ref, used_ref):
        return (mt, kt)

    def w_index(mt, nt, kt, te_ref, used_ref):
        # unused tail tiles keep the previous index (te is clamped to the
        # last used tile's expert host-side) so no spurious weight DMA
        return (te_ref[mt], nt, kt)

    def o_index(mt, nt, kt, te_ref, used_ref):
        return (mt, nt)

    if nk > 1:
        grid = (nmt, n // bn, nk)
        x_spec = pl.BlockSpec((bm, bk), x_index)
        w_spec = pl.BlockSpec((1, bn, bk), w_index)
        o_spec = pl.BlockSpec((bm, bn), o_index)
        dims = ("parallel", "parallel", "arbitrary")
    else:
        grid = (nmt, n // bn)

        def x_index2(mt, nt, te_ref, used_ref):
            return (mt, 0)

        def w_index2(mt, nt, te_ref, used_ref):
            return (te_ref[mt], nt, 0)

        def o_index2(mt, nt, te_ref, used_ref):
            return (mt, nt)

        x_spec = pl.BlockSpec((bm, k), x_index2)
        w_spec = pl.BlockSpec((1, bn, k), w_index2)
        o_spec = pl.BlockSpec((bm, bn), o_index2)
        dims = ("parallel", "parallel")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[x_spec, w_spec],
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(dimension_semantics=dims),
        interpret=interpret,
    )(tile_expert, used_tiles, x_pad, w)


def _q_kernel(tile_expert_ref, used_ref, x_even_ref, x_odd_ref, codes_ref,
              scales_ref, o_ref, acc_ref, *, nk, kg, kgc, kc, gsub,
              chunked_scales, qbias_coeff, dot_dtype):
    """Grouped matmul with in-kernel symmetric INT4 dequant (the expansion
    -matrix scheme of quant_matmul._int4_kernel): expert code blocks stream
    straight from the stacked [E, N, Kp] array — no dequantized stack ever
    materializes in HBM (the XLA path wrote + re-read E/K_active x more
    transient bytes than the active weights themselves)."""
    from .precision import decode_dot_precision, expansion_precision
    from .quant_matmul import _expansion_matrix

    mt = pl.program_id(0)
    kt = pl.program_id(2) if nk > 1 else 0

    @pl.when(mt < used_ref[0])
    def _():
        @pl.when(kt == 0)
        def _():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        # codes/scales ride 2D blocks of the [E*N, ...] flattened stacks
        # (expert selection in the row-block index): 3D small-lane scale
        # blocks come back garbled on real Mosaic (moe_gemv_debug r3c)
        codes = codes_ref[...].astype(jnp.int32)
        lo = (codes & 0xF).astype(jnp.float32)
        hi = (codes >> 4).astype(jnp.float32)
        e = _expansion_matrix(kg, kc, gsub, 0 if chunked_scales else kt * kgc)
        # precision contract: ops/pallas/precision.py — bf16-stored scales
        # are selected exactly by one DEFAULT expansion pass (0/1 x bf16);
        # f32 scales need HIGHEST (Mosaic's DEFAULT silently rounds them)
        exp_dtype = (jnp.bfloat16 if scales_ref.dtype == jnp.bfloat16
                     else jnp.float32)
        scale_exp = jnp.dot(scales_ref[...].astype(exp_dtype),
                            e.astype(exp_dtype),
                            preferred_element_type=jnp.float32,
                            precision=expansion_precision(exp_dtype))
        qb = scale_exp * qbias_coeff
        w_lo = (lo * scale_exp + qb).astype(dot_dtype)
        w_hi = (hi * scale_exp + qb).astype(dot_dtype)
        prec = (decode_dot_precision() if dot_dtype == jnp.float32
                else jax.lax.Precision.DEFAULT)
        dims = (((1,), (1,)), ((), ()))
        acc_ref[...] += jax.lax.dot_general(
            x_even_ref[...], w_lo, dims, preferred_element_type=jnp.float32,
            precision=prec,
        ) + jax.lax.dot_general(
            x_odd_ref[...], w_hi, dims, preferred_element_type=jnp.float32,
            precision=prec,
        )

        @pl.when(kt == nk - 1)
        def _():
            o_ref[...] = acc_ref[...]


def _q_blocks(n: int, kp: int, gsub: int):
    """(bn, bkp) for the quantized grouped kernel: output lane dim needs
    128-divisible-or-whole bn; the packed-K chunk must hold whole groups
    and fit the weight-block budget alongside its dequant temporaries."""
    bn = _pick(n, (256, 128)) or (n if n <= 512 and n % 8 == 0 else 0)
    if not bn:
        return None
    for bkp in (1024, 512, 256):
        if kp % bkp == 0 and bkp % gsub == 0:
            break
    else:
        bkp = kp if kp % gsub == 0 else 0
    if not bkp:
        return None
    kg = kp // gsub
    kgc = bkp // gsub
    e_rows = kgc if (kgc % 128 == 0 and kgc < kg) else kg
    # in-kernel live set: e matrix + ~3 [bn, bkp] f32 temporaries
    if 4 * bkp * (3 * bn + e_rows) > 12 * 1024 * 1024:
        return None
    return bn, bkp


def supports_quant(sq) -> bool:
    if sq.bits != 4:
        return False
    _, n, k = sq.shape
    gsub = sq.group_size // 2
    return _q_blocks(n, k // 2, gsub) is not None


@functools.partial(jax.jit, static_argnames=("bits", "group_size",
                                             "qbias_coeff", "bm", "interpret"))
def _grouped_matmul_q_p(x_pad, codes, scales, tile_expert, used_tiles, *,
                        bits, group_size, qbias_coeff, bm=64,
                        interpret=False):
    tp, kdim = x_pad.shape
    e_all, n, _ = codes.shape
    kg = scales.shape[2]
    assert bits == 4 and tp % bm == 0
    kp = kdim // 2
    gsub = group_size // 2
    bn, bkp = _q_blocks(n, kp, gsub)
    nk = kp // bkp
    kgc = bkp // gsub
    chunked = kgc % 128 == 0 and kgc < kg
    nmt = tp // bm

    # prefill-M dots run in bf16 (single-pass MXU; the dequant rounding
    # matches the XLA path's bf16 stack materialization). Interpreter mode
    # stays f32 (CPU XLA lacks bf16 dots; oracle comparisons want precision)
    dot_dtype = jnp.float32 if interpret else jnp.bfloat16
    x_e = x_pad.astype(dot_dtype)[:, 0::2]
    x_o = x_pad.astype(dot_dtype)[:, 1::2]

    nbn = n // bn  # row-blocks per expert in the flattened stacks
    grid = (nmt, nbn, nk)
    codes2 = codes.reshape(e_all * n, kp)
    scales2 = scales.reshape(e_all * n, kg)
    x_spec = pl.BlockSpec((bm, bkp), lambda mt, nt, kt, te, u: (mt, kt))
    c_spec = pl.BlockSpec((bn, bkp),
                          lambda mt, nt, kt, te, u: (te[mt] * nbn + nt, kt))
    s_spec = (
        pl.BlockSpec((bn, kgc),
                     lambda mt, nt, kt, te, u: (te[mt] * nbn + nt, kt))
        if chunked else
        pl.BlockSpec((bn, kg),
                     lambda mt, nt, kt, te, u: (te[mt] * nbn + nt, 0))
    )
    o_spec = pl.BlockSpec((bm, bn), lambda mt, nt, kt, te, u: (mt, nt))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=grid,
        in_specs=[x_spec, x_spec, c_spec, s_spec],
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
    )
    return pl.pallas_call(
        functools.partial(_q_kernel, nk=nk, kg=kgc if chunked else kg,
                          kgc=kgc, kc=bkp, gsub=gsub, chunked_scales=chunked,
                          qbias_coeff=qbias_coeff, dot_dtype=dot_dtype),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((tp, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(tile_expert, used_tiles, x_e, x_o, codes2, scales2)


def grouped_matmul_quant(x_pad: jax.Array, sq, tile_expert: jax.Array,
                         used_tiles: jax.Array, *, bm: int = 64,
                         interpret: bool = False) -> jax.Array:
    """Grouped expert matmul over a StackedQuantized weight (INT4
    symmetric): y [Tp, N] f32 with in-kernel dequant."""
    return _grouped_matmul_q_p(
        x_pad, sq.codes, sq.scales, tile_expert, used_tiles, bits=sq.bits,
        group_size=sq.group_size, qbias_coeff=sq.qbias_coeff, bm=bm,
        interpret=interpret)


def grouped_matmul_xla(x_pad: jax.Array, w: jax.Array,
                       tile_expert: jax.Array, used_tiles: jax.Array, *,
                       bm: int = 64) -> jax.Array:
    """XLA oracle with the identical tile semantics: per m-tile, one
    gathered expert weight block. Used as the kernel's reference and as the
    CPU fallback for the grouped layout."""
    tp, k = x_pad.shape
    nmt = tp // bm
    xt = x_pad.reshape(nmt, bm, k)
    wt = jnp.take(w, tile_expert, axis=0)  # [nmt, N, K]
    y = jnp.einsum("tmk,tnk->tmn", xt.astype(jnp.float32),
                   wt.astype(jnp.float32))
    return y.reshape(tp, -1)


def route_layout(flat_expert: jax.Array, num_experts: int, bm: int):
    """Expert-sorted, tile-padded layout for T routed (token, expert) pairs.

    Returns (order [T], dst [T], tile_expert [nmt], used_tiles [1],
    row_expert [Tp]) where Tp = ceil(T/bm)*bm + E*bm (static worst case:
    every expert's group padded up to the tile size)."""
    t = flat_expert.shape[0]
    tp = -(-t // bm) * bm + num_experts * bm
    order = jnp.argsort(flat_expert, stable=True)
    sorted_e = flat_expert[order]
    counts = jnp.zeros((num_experts,), jnp.int32).at[flat_expert].add(1)
    padded = -(-counts // bm) * bm
    pstart = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded)])[:-1]
    total_padded = jnp.sum(padded)
    start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])[:-1]
    rank = jnp.arange(t, dtype=jnp.int32) - start[sorted_e]
    dst = pstart[sorted_e] + rank
    nmt = tp // bm
    tile_row = jnp.minimum(jnp.arange(nmt, dtype=jnp.int32) * bm,
                           jnp.maximum(total_padded - 1, 0))
    tile_expert = jnp.clip(
        jnp.searchsorted(pstart, tile_row, side="right").astype(jnp.int32) - 1,
        0, num_experts - 1)
    used_tiles = (total_padded // bm).reshape(1).astype(jnp.int32)
    row_expert = jnp.clip(
        jnp.searchsorted(
            pstart,
            jnp.minimum(jnp.arange(tp, dtype=jnp.int32),
                        jnp.maximum(total_padded - 1, 0)),
            side="right").astype(jnp.int32) - 1,
        0, num_experts - 1)
    return order, dst, tile_expert, used_tiles, row_expert

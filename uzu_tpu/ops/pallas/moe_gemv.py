"""Fused MoE expert-gather quantized GEMV (decode path).

Role parity: the reference's expert decode pipeline
(crates/backend-uzu/src/backends/metal/kernel/moe/experts_two_pass_decode.metal)
— one dispatch computes every (token, active-expert) pair. The TPU-native
redesign: the P = S*K routed pair ids ride scalar prefetch (SMEM), and the
codes/scales BlockSpec index maps select each pair's expert plane of the
stacked [E, N, Kp] arrays directly — the kernel streams ONLY the K active
experts' quantized bytes, with no dynamic-slice copy and no dequantized
f32 materialization between HBM and the dot (the XLA gather path pays one
or both, and launches 2*S*K ops per layer where this launches 2).

Dequant math is identical to quant_matmul._int4_kernel (symmetric
qbias-coefficient carry, f32 dequant on the VPU, f32 dots at decode M).
Each pair's activation row rides an 8-sublane block (row 0 real, rows 1-7
zero) because Mosaic's sublane minimum is 8; the zero rows cost nothing —
the N-tile weight stream dominates.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import decode_dot_precision, expansion_precision
from .quant_matmul import (
    _VMEM_STACK_BUDGET,
    _expansion_matrix,
    _kernel_stack_bytes,
    _pick_block,
)

_SUB = 8  # sublane rows per pair block (row 0 real)


def _tiles(n: int, kp: int, gsub: int):
    """(tn, kc) for the stacked-expert GEMV, under the scoped-VMEM budget.
    Same preference order as the decode branch of quant_matmul's policy;
    small N falls back to a whole-N block (legal: a block equal to the
    full dim passes Mosaic's tiling check regardless of divisibility)."""
    tn = _pick_block(n, (256, 512, 128))
    if not tn and n <= 512 and n % 8 == 0:
        tn = n
    if not tn:
        return None
    kg = kp // gsub
    fits = [c for c in (kp, 2048, 1024, 512, 256, 128, 64, 32, 16)
            if c % gsub == 0
            and _kernel_stack_bytes(tn, c, kg, gsub) <= _VMEM_STACK_BUDGET]
    kc = _pick_block(kp, fits or [gsub])
    if not kc:
        return None
    return tn, kc


def supported(sq) -> bool:
    """True when the stacked tensor's [N, K] plane tiles for this kernel."""
    _, n, k = sq.shape
    pack = 8 // sq.bits
    gsub = sq.group_size // pack
    return _tiles(n, k // pack, gsub) is not None


def _int4_pair_kernel(ids_ref, x_even_ref, x_odd_ref, codes_ref, scales_ref,
                      o_ref, acc_ref, *, kg, kgc, kc, gsub, last_k,
                      exp_dtype, chunked_scales, qbias_coeff):
    # EVERY block is 2D — the access patterns quant_matmul has proven on
    # this Mosaic. The expert stacks are flattened to [E*N, ...] outside
    # and the expert selection rides the ROW-BLOCK index (ids[pi]*(N/tn)
    # + i). Two earlier cuts read the stacks through 3D blocks: both were
    # exact in interpret mode and WRONG on chip — the small-lane scales
    # plane ((1, tn, kg), kg 16-44) came back garbled while the wide
    # codes plane was right, so every output stayed "closest" to the
    # correct expert with O(1) rel errors (CHIP_JOBS_r3.log
    # moe_gemv_debug; same gotcha family as the rejected (1, page)
    # scale-row block in CLAUDE.md).
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    codes = codes_ref[...].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.float32)
    hi = (codes >> 4).astype(jnp.float32)

    # precision contract: ops/pallas/precision.py. bf16-stored scales are
    # selected exactly by a single DEFAULT expansion pass (0/1 x bf16);
    # the accumulation dots run the production single-pass bf16-operand
    # contract (the expansion matrix dominates this kernel's FLOPs at
    # kg >> kgc — 6-pass HIGHEST expansion made the r4a gather GEMV
    # compute-bound, CHIP_JOBS_r4 moe_attrib: 1.06 ms vs ~0.35 justified).
    e = _expansion_matrix(kg, kc, gsub, 0 if chunked_scales else k * kgc)
    scale_exp = jnp.dot(scales_ref[...].astype(exp_dtype), e.astype(exp_dtype),
                        preferred_element_type=jnp.float32,
                        precision=expansion_precision(exp_dtype))
    qbias_exp = scale_exp * qbias_coeff

    w_lo = lo * scale_exp + qbias_exp
    w_hi = hi * scale_exp + qbias_exp

    acc_prec = decode_dot_precision()
    dims = (((1,), (1,)), ((), ()))
    acc_ref[...] += jax.lax.dot_general(
        x_even_ref[...], w_lo, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=acc_prec,
    ) + jax.lax.dot_general(
        x_odd_ref[...], w_hi, dimension_numbers=dims,
        preferred_element_type=jnp.float32,
        precision=acc_prec,
    )

    @pl.when(k == last_k)
    def _():
        o_ref[...] = acc_ref[...]


def _int8_pair_kernel(ids_ref, x_ref, codes_ref, scales_ref, o_ref, acc_ref,
                      *, kg, kgc, kc, gsub, last_k, exp_dtype,
                      chunked_scales, qbias_coeff):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    codes = codes_ref[...].astype(jnp.int32).astype(jnp.float32)
    # precision: see the int4 pair kernel + ops/pallas/precision.py
    e = _expansion_matrix(kg, kc, gsub, 0 if chunked_scales else k * kgc)
    scale_exp = jnp.dot(scales_ref[...].astype(exp_dtype), e.astype(exp_dtype),
                        preferred_element_type=jnp.float32,
                        precision=expansion_precision(exp_dtype))
    w = codes * scale_exp + scale_exp * qbias_coeff

    acc_ref[...] += jax.lax.dot_general(
        x_ref[...], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=decode_dot_precision(),
    )

    @pl.when(k == last_k)
    def _():
        o_ref[...] = acc_ref[...]


@functools.partial(jax.jit, static_argnames=("bits", "group_size",
                                             "qbias_coeff", "interpret"))
def _moe_gemv_p(x_pairs, codes, scales, ids, *, bits, group_size,
                qbias_coeff, interpret=False):
    """x_pairs [P, K] f32, codes [E, N, Kp] u8, scales [E, N, Kg],
    ids [P] int32 -> [P, N] f32 where row p = x_pairs[p] @ W[ids[p]].T."""
    p, kdim = x_pairs.shape
    e_all, n, _ = codes.shape
    kg = scales.shape[2]
    g = group_size
    # bf16-stored scales keep the expansion dot single-pass AND exact
    # (see ops/pallas/precision.py); f32 scales fall back to HIGHEST
    exp_dtype = jnp.bfloat16 if scales.dtype == jnp.bfloat16 else jnp.float32

    # 8-sublane band per pair in a flat 2D [P*8, K] array (row 8*p real,
    # the rest zero): x and out blocks stay 2D
    x2 = jnp.zeros((p * _SUB, kdim), jnp.float32).at[::_SUB, :].set(
        x_pairs.astype(jnp.float32))

    if bits == 4:
        kp = kdim // 2
        gsub = g // 2
        tn, kc = _tiles(n, kp, gsub)
        kgc = kc // gsub
        chunked = kgc % 128 == 0 and kgc < kg
        x_even = x2[:, 0::2]
        x_odd = x2[:, 1::2]
        n_k = kp // kc
        nb = n // tn  # row-blocks per expert in the flattened stacks
        grid = (p, nb, n_k)
        codes2 = codes.reshape(e_all * n, kp)
        scales2 = scales.reshape(e_all * n, kg)
        scale_spec = (
            pl.BlockSpec((tn, kgc), lambda pi, i, k, ids_ref: (ids_ref[pi] * nb + i, k))
            if chunked else
            pl.BlockSpec((tn, kg), lambda pi, i, k, ids_ref: (ids_ref[pi] * nb + i, 0))
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_SUB, kc), lambda pi, i, k, ids_ref: (pi, k)),
                pl.BlockSpec((_SUB, kc), lambda pi, i, k, ids_ref: (pi, k)),
                pl.BlockSpec((tn, kc), lambda pi, i, k, ids_ref: (ids_ref[pi] * nb + i, k)),
                scale_spec,
            ],
            out_specs=pl.BlockSpec((_SUB, tn),
                                   lambda pi, i, k, ids_ref: (pi, i)),
            scratch_shapes=[pltpu.VMEM((_SUB, tn), jnp.float32)],
        )
        out = pl.pallas_call(
            functools.partial(
                _int4_pair_kernel, kg=kgc if chunked else kg, kgc=kgc, kc=kc,
                gsub=gsub, last_k=n_k - 1, exp_dtype=exp_dtype,
                chunked_scales=chunked, qbias_coeff=qbias_coeff),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p * _SUB, n), jnp.float32),
            interpret=interpret,
        )(ids, x_even, x_odd, codes2, scales2)
    else:
        gsub = g
        tn, kc = _tiles(n, kdim, gsub)
        kgc = kc // gsub
        chunked = kgc % 128 == 0 and kgc < kg
        n_k = kdim // kc
        nb = n // tn
        grid = (p, nb, n_k)
        codes2 = codes.reshape(e_all * n, kdim)
        scales2 = scales.reshape(e_all * n, kg)
        scale_spec = (
            pl.BlockSpec((tn, kgc), lambda pi, i, k, ids_ref: (ids_ref[pi] * nb + i, k))
            if chunked else
            pl.BlockSpec((tn, kg), lambda pi, i, k, ids_ref: (ids_ref[pi] * nb + i, 0))
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((_SUB, kc), lambda pi, i, k, ids_ref: (pi, k)),
                pl.BlockSpec((tn, kc), lambda pi, i, k, ids_ref: (ids_ref[pi] * nb + i, k)),
                scale_spec,
            ],
            out_specs=pl.BlockSpec((_SUB, tn),
                                   lambda pi, i, k, ids_ref: (pi, i)),
            scratch_shapes=[pltpu.VMEM((_SUB, tn), jnp.float32)],
        )
        out = pl.pallas_call(
            functools.partial(
                _int8_pair_kernel, kg=kgc if chunked else kg, kgc=kgc, kc=kc,
                gsub=gsub, last_k=n_k - 1, exp_dtype=exp_dtype,
                chunked_scales=chunked, qbias_coeff=qbias_coeff),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((p * _SUB, n), jnp.float32),
            interpret=interpret,
        )(ids, x2, codes2, scales2)
    return out[::_SUB, :]


def moe_expert_gemv(sq, x_pairs: jax.Array, ids: jax.Array, *,
                    interpret: bool = False) -> jax.Array:
    """Fused expert-gather GEMV over a StackedQuantized tensor.

    x_pairs [P, K] activation row per routed (token, expert) pair,
    ids [P] int32 expert index per pair -> [P, N] f32."""
    return _moe_gemv_p(x_pairs, sq.codes, sq.scales, ids.astype(jnp.int32),
                       bits=sq.bits, group_size=sq.group_size,
                       qbias_coeff=sq.qbias_coeff, interpret=interpret)

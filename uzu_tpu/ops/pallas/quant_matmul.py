"""Fused dequant matmul Pallas kernels (INT4/INT8 grouped quantization).

Replaces the reference's Gemv/Gemm fused-dequant Metal kernels
(crates/backend-uzu/src/backends/metal/kernel/matmul/gemv/gemv.metal,
gemm/gemm.metal; routing common/kernel/matmul/routing.rs) with a TPU-native
design. The XLA fallback materializes the dequantized [N, K] bf16 matrix in
HBM every call (~5x the INT4 bytes); this kernel reads codes + group params
once and dequantizes in VMEM.

Design notes (all operations 2D — no lane-dim reshapes/repeats, which Mosaic
lowers poorly):

- INT4 nibble deinterleave is moved to the *activation* side: x is split
  into even/odd K columns once outside the kernel (static gather XLA fuses),
  so in-kernel `codes & 0xF` pairs with x_even and `codes >> 4` with x_odd
  as two ordinary dots. Even (2i) and odd (2i+1) positions of a group of g
  share the byte-space group i // (g/2), so group structure survives.

- Per-group scale/bias expansion [TN, Kg] -> [TN, KC] is an MXU matmul with
  a static 0/1 expansion matrix E[G, j] = (j // gsub == G) instead of a
  vector repeat.

- Accumulation over K chunks in a f32 VMEM scratch; output written on the
  last chunk. Grid (N tiles, K chunks), K innermost.

The same kernel shape serves decode (M padded to 8) and prefill; the wrapper
routes large-M prefill to the XLA dequant path where the materialization
amortizes (the analogue of uzu's GEMV<->GEMM MatmulShape routing).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .precision import decode_dot_precision, expansion_precision

# Above this many rows the XLA dequant-then-matmul path wins (dequant
# materialization amortized over many activations; MXU-bound regime).
# Measured on v5e: the fused kernel beats the XLA path at every M up to 512
# (0.6 vs 0.9 ms at M=512 on 8192x2048 int4), so the crossover is high.
GEMM_THRESHOLD_M = 1024


def _pick_block(n: int, candidates) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return 0


def _kc_valid(c: int, k_packed: int) -> bool:
    """Mosaic lane constraint on REAL TPUs: a block's last dim must be
    128-divisible or equal the whole array dim (interpret mode accepts
    anything — the r5 tiny-model K/2=192 kc=64 pick compiled on CPU and
    rejected on chip). Applies to the x/codes K-chunk."""
    return c % 128 == 0 or c == k_packed


# Mosaic stack-allocates the kernel's vector temporaries in scoped VMEM
# (16 MB on v5e). The dominant live set is the expansion matrix e[rows, kc]
# f32 plus ~2 concurrent [tn, kc] f32 temporaries (scale_exp + one of
# lo/hi/w); this model reproduces the measured 26.87 MB reject of the 8B
# down-projection full-K tile (tn=256, kc=7168, kg=448 non-chunkable:
# 4*7168*(2*256+448) = 27.5 MB) while passing every tile the r3 sweeps
# compiled. Budget leaves headroom for Mosaic's smaller temporaries.
_VMEM_STACK_BUDGET = 14 * 1024 * 1024


def _kernel_stack_bytes(tn: int, kc: int, kg: int, gsub: int,
                        m_pad: int = 8) -> int:
    """Scoped-VMEM live-set estimate for one grid step: the dequant /
    expansion temporaries (4*kc*(2*tn + e_rows), kc-dominated) PLUS the
    M-dependent arrays — the even/odd x tiles in f32 plus one more kc-wide
    temporary (~3*kc) and the f32 accumulator (tn). Calibrated against the
    observed M=1024 reject (CHIP_JOBS_r5 exp_prefill_width: tn=512,
    kc=1024 allocated 20.56M on real Mosaic vs this model's 19.9M; the
    pre-fix kc-only estimate read 5.2M) while every production M<=512
    tile still fits — the tightest, the 8B down-projection prefill tile,
    models at 13.4M under the 14M budget."""
    kgc = kc // gsub
    e_rows = kgc if (kgc % 128 == 0 and kgc < kg) else kg
    return 4 * kc * (2 * tn + e_rows) + 4 * m_pad * (tn + 3 * kc)


def _tile_policy(n: int, k_packed: int, gsub: int, m_pad: int,
                 bits: int = 4, kdim: int = 0, symmetric: bool = False):
    """(tn, kc) preference order — the role of uzu's fleet-tuned GEMV tile
    tables (matmul/gemv/policy.rs), measured on v5e. Decode-sized M (< 32,
    HBM-bound) wants the deepest K chunk per N tile (best code streaming:
    kc 512 measured 14% faster than 256 on the flagship decode step).
    Prefill M: tall-N shapes want a shallower K chunk (tn 512 / kc 256 —
    more N tiles in flight under MXU load); wide-K shapes the opposite
    (tn 256 / kc 512). Falls back down the candidate lists for shapes the
    preferred tile doesn't divide. A measured autotune table for this
    device (ops/pallas/autotune.py — the fleet-table analogue) wins over
    the heuristics when it has an entry for the exact shape."""
    from .autotune import lookup

    hit = lookup(bits, n, kdim or k_packed * (2 if bits == 4 else 1), m_pad,
                 symmetric=symmetric)
    if hit is not None:
        tn, kc = hit
        if n % tn == 0 and k_packed % kc == 0 and kc % gsub == 0:
            # measured entries return EXACTLY as measured (the kernel derives
            # scale chunking from the tile, so measurement == production)
            return tn, kc
    if m_pad < 32:
        # Decode GEMVs want the DEEPEST K chunk the shape allows — ideally
        # the whole (packed) K in ONE grid step: each N-tile row's codes are
        # then a single maximal contiguous DMA run. r3 on-chip sweeps
        # (tools/exp_down_tiles.py, CHIP_JOBS_r3.log down/readout_tiles):
        # readout [128k, 2048] (256, full-K) 294.7 GB/s vs (256, 512) 238.4;
        # up|gate [16k, 2048] (256, full-K) 279.7 vs old (512, 512) 263.4.
        # tn=256 beat both 512 and 128 on every kg<=128 shape swept.
        # Deeper fallbacks (2048/1024) cover shapes whose full-K chunk blows
        # the scoped-VMEM stack budget (8B down-proj: K=14336, kg=448 —
        # CHIP_JOBS_r3.log bench_tiles vmem reject), filtered below.
        tn_pref, kc_pref = ((256, 512, 128),
                           (k_packed, 2048, 1024, 512, 256, 128, 64, 32, 16))
    elif k_packed >= 2048:  # deep-K prefill (e.g. down [2048, 8192])
        # r3 prefill-M sweeps (CHIP_JOBS_r3.log prefill_tiles_128/512):
        # down best (512, 1024) at M=128 (0.0375 ms vs the old (256, 512)
        # pick's 0.0787 — 2.1x) and within 2% of best at M=512. kc=1024
        # everywhere: the deepest chunk that compiled ((512, 2048) rejects).
        tn_pref, kc_pref = (512, 256, 128), (1024, 512, 256, 128, 64, 32, 16)
    else:
        # shallow-K prefill (up|gate/qkv/out/readout): (256, full-K) won at
        # BOTH M=128 and M=512 (up|gate 0.2717 vs the old (512, 256) pick's
        # 0.2931 at M=512; 2.9x at M=128).
        tn_pref, kc_pref = (256, 512, 128), (1024, 512, 256, 128, 64, 32, 16)
    tn = _pick_block(n, tn_pref)
    kg_all = k_packed // gsub
    fits = [c for c in kc_pref if c % gsub == 0 and _kc_valid(c, k_packed)
            and _kernel_stack_bytes(tn or n, c, kg_all, gsub, m_pad)
            <= _VMEM_STACK_BUDGET]
    kc = _pick_block(k_packed, fits)
    if not kc:
        # whole-K block is always lane-legal: the fallback for K dims not
        # divisible by any 128-multiple candidate (small/odd models)
        if (k_packed % gsub == 0
                and _kernel_stack_bytes(tn or n, k_packed, kg_all, gsub,
                                        m_pad)
                <= _VMEM_STACK_BUDGET):
            kc = k_packed
    # Deep-K decode GEMVs (kg > 128): widen the K chunk so each grid step's
    # scale block covers exactly 128 groups — the lane-dim blocking minimum —
    # and the expansion dot contracts over 128 rows instead of the whole kg
    # (the full-kg expansion held the down-projection GEMV to ~107 GB/s
    # effective at kg=256 before this).
    kg = k_packed // gsub
    if (m_pad < 32 and kg > 128 and kg % 128 == 0
            and k_packed % (128 * gsub) == 0
            and _kernel_stack_bytes(128 if n % 128 == 0 else (tn or n),
                                    128 * gsub, kg, gsub, m_pad)
            <= _VMEM_STACK_BUDGET):
        kc = 128 * gsub
        # deep-K decode GEMVs also want the NARROW N tile: more grid steps
        # of smaller blocks pipeline the code DMAs better (r3 on-chip sweep
        # of the flagship down-proj [2048, 8192], tools/exp_down_tiles.py:
        # tn 128 -> 231.5 GB/s vs tn 512 -> 171.8; up|gate and qkv/out are
        # kg <= 128 and keep their measured-optimal wide tiles)
        if n % 128 == 0:
            tn = 128
    return tn, kc


def _expansion_matrix(kg: int, kc: int, gsub: int, group_off) -> jax.Array:
    """In-kernel 0/1 expansion matrix selecting this K-chunk's groups:
    E[G, j] = (group_off + j // gsub == G). Full-Kg scales stay resident per
    N-tile (their lane dim must be 128-aligned or whole); the chunk
    selection rides the MXU expansion matmul instead of a lane slice."""
    rows = jax.lax.broadcasted_iota(jnp.int32, (kg, kc), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (kg, kc), 1)
    return (cols // gsub + group_off == rows).astype(jnp.float32)


def _int4_kernel(x_even_ref, x_odd_ref, codes_ref, scales_ref, *rest,
                 kg, kgc, kc, gsub, last_k, dot_dtype,
                 exp_dtype, chunked_scales, qbias_coeff):
    # symmetric tensors carry no qbias operand: qbias_exp = coeff*scale_exp
    # (bit-identical — the coefficient is a power of two) and the whole
    # [N, Kg] qbias stream disappears from HBM traffic.
    qbias_ref, o_ref, acc_ref = ((None, *rest) if qbias_coeff is not None
                                 else rest)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # bit ops in i32: Mosaic doesn't legalize shifts on i8 vectors
    codes = codes_ref[:].astype(jnp.int32)
    lo = (codes & 0xF).astype(jnp.float32)
    hi = (codes >> 4).astype(jnp.float32)

    # PRECISION (full story: ops/pallas/precision.py): the 0/1 expansion
    # dot must SELECT scales exactly — bf16-stored scales get that from a
    # single DEFAULT pass (0/1 x bf16 is exact); f32 scales need HIGHEST
    # (Mosaic's DEFAULT rounds operands to bf16 silently — the r3
    # qmm_matrix errors were exactly that rounding, at all shapes).
    # chunked_scales: the scale block covers only this K-chunk's groups
    # (kg == kgc rows), so group_off is 0 and e is grid-invariant.
    e = _expansion_matrix(kg, kc, gsub, 0 if chunked_scales else k * kgc)
    exp_prec = expansion_precision(exp_dtype)
    scale_exp = jnp.dot(scales_ref[:].astype(exp_dtype), e.astype(exp_dtype),
                        preferred_element_type=jnp.float32,
                        precision=exp_prec)
    if qbias_coeff is not None:
        qbias_exp = scale_exp * qbias_coeff
    else:
        qbias_exp = jnp.dot(qbias_ref[:].astype(exp_dtype), e.astype(exp_dtype),
                            preferred_element_type=jnp.float32,
                            precision=exp_prec)

    # dequant in f32 on the VPU, then feed the MXU in the dot dtype; f32
    # accumulation. Both decode (dot_dtype f32) and prefill (bf16) run the
    # single-pass bf16-operand contract — the reference's Metal kernels
    # likewise dequantize to half for simdgroup matmuls (gemm.metal
    # B-prologue). True-f32 multi-pass dots (UZU_TPU_DECODE_DOT=highest)
    # measured 2.5x slower on the flagship up-GEMV (110 vs 275 GB/s,
    # CHIP_JOBS_r4): the extra MXU passes do NOT hide under the code DMA.
    w_lo = (lo * scale_exp + qbias_exp).astype(dot_dtype)
    w_hi = (hi * scale_exp + qbias_exp).astype(dot_dtype)

    acc_precision = (decode_dot_precision() if dot_dtype == jnp.float32
                     else jax.lax.Precision.DEFAULT)
    dims = (((1,), (1,)), ((), ()))  # contract last dims: [M,KC]x[TN,KC]->[M,TN]
    acc_ref[:] += jax.lax.dot_general(
        x_even_ref[:], w_lo, dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=acc_precision,
    ) + jax.lax.dot_general(
        x_odd_ref[:], w_hi, dimension_numbers=dims,
        preferred_element_type=jnp.float32, precision=acc_precision,
    )

    @pl.when(k == last_k)
    def _():
        o_ref[:] = acc_ref[:]


def _int8_kernel(x_ref, codes_ref, scales_ref, *rest,
                 kg, kgc, kc, gsub, last_k, dot_dtype, exp_dtype,
                 chunked_scales, qbias_coeff):
    qbias_ref, o_ref, acc_ref = ((None, *rest) if qbias_coeff is not None
                                 else rest)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    codes = codes_ref[:].astype(jnp.int32).astype(jnp.float32)
    # precision: see the int4 kernel + ops/pallas/precision.py
    e = _expansion_matrix(kg, kc, gsub, 0 if chunked_scales else k * kgc)
    exp_prec = expansion_precision(exp_dtype)
    scale_exp = jnp.dot(scales_ref[:].astype(exp_dtype), e.astype(exp_dtype),
                        preferred_element_type=jnp.float32,
                        precision=exp_prec)
    if qbias_coeff is not None:
        qbias_exp = scale_exp * qbias_coeff
    else:
        qbias_exp = jnp.dot(qbias_ref[:].astype(exp_dtype), e.astype(exp_dtype),
                            preferred_element_type=jnp.float32,
                            precision=exp_prec)
    w = (codes * scale_exp + qbias_exp).astype(dot_dtype)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], w, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(decode_dot_precision() if dot_dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )

    @pl.when(k == last_k)
    def _():
        o_ref[:] = acc_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=("bits", "group_size", "interpret", "block_n", "block_k",
                     "qbias_coeff"),
)
def _quant_matmul_p(x, codes, scales, qbias, *, bits, group_size,
                    interpret=False, block_n=0, block_k=0, qbias_coeff=None):
    """x [M, K] f32/bf16; codes [N, K/pack] u8; scales/qbias [N, Kg].

    qbias may be None when the static qbias_coeff is given (symmetric
    quantization: qbias == qbias_coeff * scales, derived in-kernel).
    Returns [M, N] f32. Static shape constraints checked by the caller.
    """
    assert (qbias is None) == (qbias_coeff is not None)
    m, kdim = x.shape
    n = codes.shape[0]
    kg = scales.shape[1]
    g = group_size

    m_pad = max(8, -(-m // 8) * 8)
    if m_pad != m:
        x = jnp.pad(x, ((0, m_pad - m), (0, 0)))
    # bf16 activations on TPU at prefill M: pairs with the in-kernel bf16
    # dequant so the dots hit the MXU's native rate (f32 forces multi-pass
    # matmuls; measured +18% on the v5e 128-token prefill chunk). Decode-
    # sized M stays f32: it is HBM-bound, and M=8 is below bf16's 16-sublane
    # min tile (measured 25% SLOWER in bf16). The interpreter path stays f32
    # (CPU XLA lacks bf16 dots, and the oracle comparison wants precision).
    dot_dtype = jnp.bfloat16 if m_pad >= 32 and not interpret else jnp.float32
    x = x.astype(dot_dtype)
    # expansion-dot dtype: bf16-native scales ride a single-pass MXU dot
    # bit-exactly (see kernel comment); anything wider stays f32.
    exp_dtype = jnp.bfloat16 if scales.dtype == jnp.bfloat16 else jnp.float32

    if bits == 4:
        k2 = kdim // 2
        gsub = g // 2
        tn_auto, kc_auto = _tile_policy(n, k2, gsub, m_pad, bits=4, kdim=kdim,
                                        symmetric=qbias_coeff is not None)
        tn = block_n or tn_auto
        assert tn, f"N={n} not divisible by a supported tile"
        kc = block_k or kc_auto
        assert kc and kc % gsub == 0, (kdim, g)
        # Chunked scale blocks whenever the tile allows them: each grid
        # step's scale block covers exactly this chunk's groups iff that
        # count meets the 128 lane-dim blocking minimum. Derived from the
        # FINAL tile (policy pick, measured table entry, or explicit
        # block_k alike), so autotune measures the production kernel.
        kgc = kc // gsub
        chunked = kgc % 128 == 0 and kgc < kg
        x_even = x[:, 0::2]
        x_odd = x[:, 1::2]
        n_k = k2 // kc
        grid = (n // tn, n_k)
        scale_spec = (
            pl.BlockSpec((tn, kgc), lambda i, k: (i, k))
            if chunked else pl.BlockSpec((tn, kg), lambda i, k: (i, 0))
        )
        operands = [x_even, x_odd, codes, scales]
        specs = [
            pl.BlockSpec((m_pad, kc), lambda i, k: (0, k)),
            pl.BlockSpec((m_pad, kc), lambda i, k: (0, k)),
            pl.BlockSpec((tn, kc), lambda i, k: (i, k)),
            scale_spec,
        ]
        if qbias is not None:
            operands.append(qbias)
            specs.append(scale_spec)
        out = pl.pallas_call(
            functools.partial(_int4_kernel, kg=kgc if chunked else kg,
                              kgc=kgc, kc=kc, gsub=gsub,
                              last_k=n_k - 1, dot_dtype=dot_dtype,
                              exp_dtype=exp_dtype, chunked_scales=chunked,
                              qbias_coeff=qbias_coeff),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((m_pad, tn), lambda i, k: (0, i)),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m_pad, tn), jnp.float32)],
            interpret=interpret,
        )(*operands)
    else:
        gsub = g
        tn_auto, kc_auto = _tile_policy(n, kdim, gsub, m_pad, bits=8, kdim=kdim,
                                        symmetric=qbias_coeff is not None)
        tn = block_n or tn_auto
        assert tn, f"N={n} not divisible by a supported tile"
        kc = block_k or kc_auto
        assert kc and kc % gsub == 0, (kdim, g)
        kgc = kc // gsub
        chunked = kgc % 128 == 0 and kgc < kg
        n_k = kdim // kc
        grid = (n // tn, n_k)
        scale_spec = (
            pl.BlockSpec((tn, kgc), lambda i, k: (i, k))
            if chunked else pl.BlockSpec((tn, kg), lambda i, k: (i, 0))
        )
        operands = [x, codes, scales]
        specs = [
            pl.BlockSpec((m_pad, kc), lambda i, k: (0, k)),
            pl.BlockSpec((tn, kc), lambda i, k: (i, k)),
            scale_spec,
        ]
        if qbias is not None:
            operands.append(qbias)
            specs.append(scale_spec)
        out = pl.pallas_call(
            functools.partial(_int8_kernel, kg=kgc if chunked else kg,
                              kgc=kgc, kc=kc, gsub=gsub,
                              last_k=n_k - 1, dot_dtype=dot_dtype,
                              exp_dtype=exp_dtype, chunked_scales=chunked,
                              qbias_coeff=qbias_coeff),
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec((m_pad, tn), lambda i, k: (0, i)),
            out_shape=jax.ShapeDtypeStruct((m_pad, n), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m_pad, tn), jnp.float32)],
            interpret=interpret,
        )(*operands)
    return out[:m]


def supported(qt, x_2d) -> bool:
    """Static check: the tile policy yields a Mosaic-legal (tn, kc) for this
    shape (delegating keeps this gate exactly in sync with the policy — the
    old duplicated check admitted kc=64 blocks interpret mode accepts but
    real Mosaic rejects)."""
    n, kdim = qt.shape
    g = qt.group_size
    if qt.bits not in (4, 8):
        return False
    if kdim % g:
        return False
    if qt.bits == 4:
        if g < 2 or (g // 2) == 0:
            return False
        k_packed, gsub = kdim // 2, g // 2
    else:
        k_packed, gsub = kdim, g
    if k_packed % gsub:
        return False
    rows = int(np.prod(x_2d.shape[:-1])) if x_2d.ndim > 1 else 1
    m_pad = max(8, -(-rows // 8) * 8)
    tn, kc = _tile_policy(n, k_packed, gsub, m_pad, bits=qt.bits, kdim=kdim,
                          symmetric=qt.qbias_coeff is not None)
    return bool(tn) and bool(kc)


def _quant_matmul_flat(w, x, *, interpret):
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    out = _quant_matmul_p(
        x2,
        w.codes,
        w.scales,
        w.qbias,
        bits=w.bits,
        group_size=w.group_size,
        interpret=interpret,
        qbias_coeff=w.qbias_coeff,
    )
    return out.reshape(*lead, out.shape[-1]).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _batched_op(interpret: bool):
    """quant matmul with a custom vmap rule: batching folds into the M
    dimension (ONE kernel launch reading the weights once), instead of
    jax's default per-instance batching of pallas_call (B launches, B full
    weight reads — what makes naive vmap of a decode step B times slower)."""
    from jax import custom_batching

    @custom_batching.custom_vmap
    def op(w, x):
        return _quant_matmul_flat(w, x, interpret=interpret)

    @op.def_vmap
    def _rule(axis_size, in_batched, w, x):
        w_batched = any(jax.tree.leaves(in_batched[0]))
        if w_batched:
            raise NotImplementedError("batched quantized weights unsupported")
        # x arrives with the batch axis at position 0; the op flattens all
        # leading dims into M itself.
        return op(w, x), True

    return op


def quant_matmul_pallas(w, x, *, interpret=False):
    """x [..., K] @ dequant(w)^T -> [..., N]; w is a QuantizedTensor."""
    x2_rows = int(np.prod(x.shape[:-1])) if x.ndim > 1 else 1
    if x2_rows > GEMM_THRESHOLD_M or not supported(w, x):
        raise NotImplementedError  # caller falls back to the XLA path
    return _batched_op(interpret)(w, x)

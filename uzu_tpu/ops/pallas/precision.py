"""Decode-dot precision contract for the quantized Pallas kernels.

Mosaic lowers a DEFAULT-precision `dot_general` as ONE bf16 MXU pass even
when the operands are f32 (root-caused on chip, tools/exp_qmm_bisect2.py):
operands are bf16-rounded, accumulation stays f32. Two consequences drove
r3/r4 churn:

- The 0/1 scale-EXPANSION dot must select scale values exactly. With
  bf16-stored scales (the on-disk layout real checkpoints use) a single
  DEFAULT bf16 pass IS exact (0/1 times a bf16 operand); only f32 scales
  need HIGHEST there. `expansion_precision` encodes that.
- The ACCUMULATION dot at decode (f32 x operand) was switched to HIGHEST
  (true f32 via 6 bf16 passes) in r4a on correctness worries; the r4
  bench then measured the flagship up-GEMV at 0.171 ms / 110 GB/s vs
  0.066 ms / 275 GB/s before — the extra MXU passes do NOT hide under
  the weight DMA, and the decode step lost ~2x. The production contract
  is therefore the single-pass bf16 operand dot with f32 accumulation —
  the SAME contract as the reference's Metal kernels, which dequantize
  to half for simdgroup matmuls (gemm.metal B-prologue), and the same
  one the M>=32 prefill path (`dot_dtype == bf16`) has always documented.
  Operand rounding (2^-9 relative) sits far below the INT4 g32
  quantization noise it rides on; tools/chip_conformance.py checks every
  served shape against the host oracle at the contract tolerance.

UZU_TPU_DECODE_DOT picks the accumulation contract per-process (it is
read at TRACE time — set it before the first forward, or run in a fresh
process, e.g. tools/exp_dot_precision_ab.py's subprocess arms):

  default   single-pass bf16 operands, f32 accumulate   (production)
  highest   6 MXU passes, true f32                      (diagnostics)

(Precision.HIGH is NOT offered: Mosaic's lowering rejects it —
"Unsupported dot precision: HIGH", CHIP_JOBS_r4 dot_precision_ab.)
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

_MAP = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}


def decode_dot_precision() -> jax.lax.Precision:
    """Precision for f32-operand accumulation dots in decode GEMV kernels."""
    name = os.environ.get("UZU_TPU_DECODE_DOT", "default").lower()
    try:
        return _MAP[name]
    except KeyError:
        raise ValueError(
            f"UZU_TPU_DECODE_DOT={name!r}: want default|highest"
        ) from None


def expansion_precision(exp_dtype) -> jax.lax.Precision:
    """Precision for the 0/1 scale-expansion dot: bf16-stored scales are
    selected exactly by a single DEFAULT pass; f32 scales need HIGHEST
    (and Mosaic rejects HIGHEST on bf16-operand dots)."""
    return (jax.lax.Precision.HIGHEST if exp_dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)

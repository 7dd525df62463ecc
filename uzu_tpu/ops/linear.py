"""Linear application over full-precision or quantized weights.

All weights use the reference's OutputInput layout, i.e. W has shape [N, K]
and y = x @ W^T (reference: crates/backend-uzu/src/encodable_block/linear/
matmul.rs). Quantized weights route through a fused dequant matmul — the
Pallas kernel on TPU, or a pure-XLA dequantize-then-dot everywhere else.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..quant.format import HybridLinear, QuantizedTensor, dequantize
from .. import runtime


def linear_apply(w, x: jax.Array, bias=None) -> jax.Array:
    """x: [..., K] -> [..., N]."""
    if isinstance(w, HybridLinear):
        y = hybrid_apply(w, x)
    elif isinstance(w, QuantizedTensor):
        y = quant_matmul(w, x)
    else:
        y = jax.lax.dot_general(
            x,
            w,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
    if bias is not None:
        y = (y.astype(jnp.float32) + bias.astype(jnp.float32)).astype(y.dtype)
    return y


def _rows(w: QuantizedTensor, lo: int, hi: int) -> QuantizedTensor:
    return QuantizedTensor(
        codes=w.codes[lo:hi], scales=w.scales[lo:hi],
        qbias=None if w.qbias is None else w.qbias[lo:hi],
        bits=w.bits, group_size=w.group_size, qbias_coeff=w.qbias_coeff)


def quant_matmul(w: QuantizedTensor, x: jax.Array) -> jax.Array:
    """Fused dequant matmul: y[m, n] = sum_k x[m,k] * dq(w)[n,k]."""
    if runtime.use_pallas():
        from .pallas.quant_matmul import quant_matmul_pallas

        try:
            return quant_matmul_pallas(w, x, interpret=not runtime.on_tpu())
        except NotImplementedError:
            # SPLIT-N route (r5): weights whose N is not tile-divisible
            # (e.g. a GDN fused in_proj's N = 2*key + 2*value + 2H = 3088)
            # previously dropped the WHOLE matrix to the XLA dequant
            # fallback (~2.5x the bytes: codes + bf16 materialize + read
            # back). Run the kernel on the largest 128-multiple row prefix
            # and fall back only for the tail rows — on the qwen08 hybrid
            # that keeps 99.5% of the in_proj bytes on the fused path.
            n = w.codes.shape[0]
            n0 = (n // 128) * 128
            if 0 < n0 < n:
                try:
                    head = quant_matmul_pallas(
                        _rows(w, 0, n0), x, interpret=not runtime.on_tpu())
                    tail = _xla_quant_matmul(_rows(w, n0, n), x)
                    return jnp.concatenate([head, tail], axis=-1)
                except NotImplementedError:
                    pass  # head unsupported for another reason (K tiling)
    return _xla_quant_matmul(w, x)


def _xla_quant_matmul(w: QuantizedTensor, x: jax.Array) -> jax.Array:
    wd = dequantize(w, dtype=x.dtype)
    return jax.lax.dot_general(
        x,
        wd,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def hybrid_apply(w: HybridLinear, x: jax.Array) -> jax.Array:
    """QLoRA/RHT hybrid linear (order per qlora_wrapper.rs:163-240)."""
    from .rht import input_rht, output_rht

    inter = None
    if w.adapter_down is not None:
        inter = jax.lax.dot_general(
            x, w.adapter_down,
            dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    xb = input_rht(x, w.input_signs) if w.input_signs is not None else x
    y = quant_matmul(w.base, xb).astype(jnp.float32)
    if inter is not None:
        y = y + jax.lax.dot_general(
            inter, w.adapter_up,
            dimension_numbers=(((inter.ndim - 1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    y = y.astype(x.dtype)
    if w.output_signs is not None:
        y = output_rht(y, w.output_signs)
    return y

"""Normalization (RMS / LayerNorm) matching the reference semantics.

Reference: crates/backend-uzu/src/backends/cpu/kernel/normalization/
normalization.rs — f32 accumulation, variance = E[x^2] - mean^2,
`scale + scale_offset` affine, and two upcast modes:

- FULL_LAYER: normalized value and affine multiply both in f32, then cast;
- ONLY_NORMALIZATION: normalized value cast to the output dtype first, the
  affine multiply happens in the output dtype (Llama-style bf16 weights).

XLA fuses this whole op into neighbouring producers/consumers, so a Pallas
kernel is unnecessary here (the reference needed one because Metal has no
fusion compiler).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.model import NormalizationConfig, UpcastMode


def normalize(x, cfg: NormalizationConfig, scales=None, biases=None, out_dtype=None):
    """Apply RMS/LayerNorm over the last axis.

    x: [..., D]; scales: [D] (f32 on disk) or None (pure normalization, e.g.
    the value-norm head which has no affine weights); biases: optional [D].
    """
    out_dtype = out_dtype or x.dtype
    xf = x.astype(jnp.float32)
    if cfg.subtract_mean:
        mean = jnp.mean(xf, axis=-1, keepdims=True)
    else:
        mean = 0.0
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - jnp.square(mean)
    rms_inv = jax.lax.rsqrt(var + cfg.epsilon)
    normalized = (xf - mean) * rms_inv
    offset = cfg.scale_offset if cfg.scale_offset is not None else 0.0
    if scales is None:
        scale = jnp.float32(1.0 + offset)
    else:
        scale = scales.astype(jnp.float32) + offset
    if cfg.upcast_mode == UpcastMode.FULL_LAYER:
        result = (normalized * scale).astype(out_dtype)
    else:
        result = normalized.astype(out_dtype) * scale.astype(out_dtype)
    if biases is not None:
        result = (result.astype(jnp.float32) + biases.astype(jnp.float32)).astype(out_dtype)
    return result

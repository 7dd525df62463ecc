"""Activations + gated-act-mul matching the reference.

Reference: crates/backend-uzu/src/config/activation/*.rs (SiLU with alpha,
exact/approx GELU, identity) and the GatedActMul kernel
(encodable_block/mlp/gate_act_mul.rs) — out = act(gate) * up with optional
per-side clipping (gpt-oss style), all fused by XLA here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.model import GELU, Identity, SiLU


def apply_activation(cfg, x):
    if isinstance(cfg, SiLU):
        xf = x.astype(jnp.float32)
        return (xf * jax.nn.sigmoid(cfg.alpha * xf)).astype(x.dtype)
    if isinstance(cfg, GELU):
        return jax.nn.gelu(x.astype(jnp.float32), approximate=cfg.approximate).astype(x.dtype)
    if isinstance(cfg, Identity):
        return x
    raise ValueError(f"unsupported activation {type(cfg).__name__}")


def _clip(x, clipping):
    if clipping is None:
        return x
    lo, hi = clipping
    if lo is not None:
        x = jnp.maximum(x, lo)
    if hi is not None:
        x = jnp.minimum(x, hi)
    return x


def gated_act_mul(activation_cfg, gate, up, gate_clipping=None, up_clipping=None):
    """act(clip(gate)) * clip(up), f32 internally."""
    out_dtype = gate.dtype
    gate = _clip(gate.astype(jnp.float32), gate_clipping)
    up = _clip(up.astype(jnp.float32), up_clipping)
    return (apply_activation(activation_cfg, gate) * up).astype(out_dtype)

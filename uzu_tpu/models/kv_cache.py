"""KV cache layouts: full-precision, INT8-quantized, and sliding-window ring.

Reference counterparts: mixer/attention/state.rs — prefix either Full or
Ring(sliding_window_size) (state.rs:95-105, ring accept arithmetic
:213-232), sparse grow-on-demand buffers (:153-185). The TPU redesign uses
fixed-shape donated buffers instead:

- full: slot i holds position i ([C, G, Dh]); rollback/padding are free
  because slots >= pos are invisible to the causal mask;
- ring: sliding-window layers keep only W slots, slot = position % W, with
  a per-slot position array driving the mask (init to -2^30 so empty slots
  always fail the window test) — the memory win the reference gets from
  Ring prefixes;
- int8: values quantized at append with per-(slot, kv-head) absmax scales
  over head_dim; dequant fuses into the attention einsum. Halves (vs bf16)
  the KV bytes each decode step streams — the quantized-KV capability the
  BASELINE targets ask for.

Layouts compose (quantized ring). The dict shape is the dispatch tag:
  {"k","v"}                        full fp
  {"k","v","pos"}                  fp ring
  {"k_q","k_s","v_q","v_s"}        quantized full
  {... ,"pos"}                     quantized ring
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

NEG_POS = -(1 << 30)  # "empty slot" position: fails every mask test


def make_cache(
    num_groups: int,
    head_dim: int,
    max_context: int,
    dtype=jnp.bfloat16,
    *,
    quantized: bool = False,
    window: int | None = None,
    ring_extra: int = 0,
) -> dict:
    """ring_extra: extra slots beyond the window so that writing a whole
    prefill chunk BEFORE its queries attend cannot evict keys those queries
    still need (the role of the reference's fixed suffix scratch next to the
    Ring prefix, state.rs:13). Writing S rows into W+S slots only evicts
    positions < p0 - W, which are outside every in-chunk query's window."""
    c = min(window + ring_extra, max_context) if window else max_context
    cache: dict = {}
    if quantized:
        cache["k_q"] = jnp.zeros((c, num_groups, head_dim), jnp.int8)
        cache["v_q"] = jnp.zeros((c, num_groups, head_dim), jnp.int8)
        cache["k_s"] = jnp.zeros((c, num_groups), jnp.float32)
        cache["v_s"] = jnp.zeros((c, num_groups), jnp.float32)
    else:
        cache["k"] = jnp.zeros((c, num_groups, head_dim), dtype)
        cache["v"] = jnp.zeros((c, num_groups, head_dim), dtype)
    if window and window < max_context:
        cache["pos"] = jnp.full((c,), NEG_POS, jnp.int32)
    return cache


def is_ring(cache: dict) -> bool:
    return "pos" in cache


def is_quantized(cache: dict) -> bool:
    return "k_q" in cache


def _quantize_rows(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """x [S, G, Dh] -> (int8 codes, scales [S, G])."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1)
    scale = jnp.where(amax > 0, amax / 127.0, 1.0)
    codes = jnp.clip(jnp.round(xf / scale[..., None]), -127, 127).astype(jnp.int8)
    return codes, scale


def append(
    cache: dict,
    k_new: jax.Array,
    v_new: jax.Array,
    positions: jax.Array,
    true_length=None,
) -> dict:
    """Write S new rows at their positions; returns the updated cache.

    true_length masks end-padding: in the ring layout padded rows share
    slots (mod W) with live data, so they must be dropped at write time —
    unlike the full layout where padded slots are merely invisible. Rows
    older than the final window are dropped too, so scatter indices stay
    unique (duplicate-index scatter order is unspecified in XLA).
    """
    out = dict(cache)
    s = positions.shape[0]
    if true_length is None:
        true_length = s
    if is_ring(cache):
        w = cache["pos"].shape[0]
        end = positions[0] + true_length  # first position NOT written
        keep = (positions < end) & (positions >= end - w)
        idx = jnp.where(keep, positions % w, w)  # w = out of range -> dropped
        out["pos"] = cache["pos"].at[idx].set(positions, mode="drop")

        def write(buf, rows):
            return buf.at[idx].set(rows.astype(buf.dtype), mode="drop")

    else:
        pos0 = positions[0]

        def write(buf, rows):
            return jax.lax.dynamic_update_slice(
                buf, rows.astype(buf.dtype), (pos0,) + (0,) * (buf.ndim - 1)
            )

    if is_quantized(cache):
        k_q, k_s = _quantize_rows(k_new)
        v_q, v_s = _quantize_rows(v_new)
        out["k_q"] = write(cache["k_q"], k_q)
        out["v_q"] = write(cache["v_q"], v_q)
        out["k_s"] = write(cache["k_s"], k_s)
        out["v_s"] = write(cache["v_s"], v_s)
    else:
        out["k"] = write(cache["k"], k_new)
        out["v"] = write(cache["v"], v_new)
    return out


def read(cache: dict, dtype=jnp.float32):
    """-> (k, v, kv_positions or None). Dequant fuses into the attention
    matmuls downstream."""
    kv_pos = cache.get("pos")
    if is_quantized(cache):
        k = cache["k_q"].astype(dtype) * cache["k_s"].astype(dtype)[..., None]
        v = cache["v_q"].astype(dtype) * cache["v_s"].astype(dtype)[..., None]
        return k, v, kv_pos
    return cache["k"], cache["v"], kv_pos

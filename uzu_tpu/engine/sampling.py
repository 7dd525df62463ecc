"""On-device sampling: temperature -> top-k -> top-p -> min-p -> gumbel/argmax,
with repetition penalty over a GPU-resident recent-token ring and optional
grammar bitmask.

Semantics mirror the reference's fused UnifiedSampling kernel
(crates/backend-uzu/src/backends/metal/kernel/sampling/unified_sampling.metal:55-75
and encodable_block/sampling/mod.rs:26-198): the whole pipeline runs inside
the jitted step so the sampled token never round-trips to the host. On TPU
the masking/softmax stages are pure VPU work that XLA fuses; a Pallas
radix-top-k is only needed at very large vocab (later optimization).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

NEG_INF = -1e30


@dataclasses.dataclass(frozen=True)
class SamplingParams:
    """Static sampling configuration (specializes the jitted step)."""

    temperature: float | None = None  # None or 0 => greedy
    top_k: int | None = None
    top_p: float | None = None
    min_p: float | None = None
    repetition_penalty: float | None = None
    suffix_repetition_length: int = 64
    # tokens never to emit (the reference's GenerationConfig carries this
    # field but marks it Unsupported; here it is implemented as a mask)
    banned_tokens: tuple = ()

    @property
    def is_greedy(self) -> bool:
        return self.temperature is None or self.temperature <= 0.0

    @classmethod
    def from_generation_config(cls, g) -> "SamplingParams":
        banned = g.banned_tokens if isinstance(g.banned_tokens, (list, tuple)) else ()
        return cls(
            temperature=g.temperature,
            top_k=g.top_k,
            top_p=g.top_p,
            min_p=g.min_p,
            repetition_penalty=g.repetition_penalty,
            suffix_repetition_length=g.suffix_repetition_length or 64,
            banned_tokens=tuple(int(t) for t in banned),
        )


def apply_repetition_penalty(logits: jax.Array, ring: jax.Array, penalty: float) -> jax.Array:
    """Divide positive / multiply negative logits of recently seen tokens
    (reference: RepetitionPenalty kernel + ContextRingUpdate)."""
    v = logits.shape[-1]
    seen = jnp.zeros((v,), bool).at[jnp.clip(ring, 0, v - 1)].set(ring >= 0, mode="drop")
    penalized = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(seen, penalized, logits)


def _mask_top_k(logits: jax.Array, k: int) -> jax.Array:
    kth = jax.lax.top_k(logits, k)[0][..., -1]
    return jnp.where(logits < kth, NEG_INF, logits)


def _mask_top_p(logits: jax.Array, p: float) -> jax.Array:
    sorted_logits = jnp.sort(logits)[::-1]
    probs = jax.nn.softmax(sorted_logits)
    cum = jnp.cumsum(probs)
    # keep the smallest prefix with cumulative prob >= p (always >= 1 token)
    keep = cum - probs < p
    cutoff = jnp.min(jnp.where(keep, sorted_logits, jnp.inf))
    return jnp.where(logits < cutoff, NEG_INF, logits)


def _mask_min_p(logits: jax.Array, min_p: float) -> jax.Array:
    probs = jax.nn.softmax(logits)
    cutoff = jnp.max(probs) * min_p
    return jnp.where(probs < cutoff, NEG_INF, logits)


def sample(
    logits: jax.Array,  # [V] f32
    params: SamplingParams,
    key: jax.Array | None = None,
    ring: jax.Array | None = None,  # [R] int32, -1 = empty
    bitmask: jax.Array | None = None,  # [V] bool, True = allowed (grammar)
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    if params.banned_tokens:
        banned = jnp.asarray(params.banned_tokens, jnp.int32)
        logits = logits.at[banned].set(NEG_INF)
    if bitmask is not None:
        logits = jnp.where(bitmask, logits, NEG_INF)
    if params.repetition_penalty is not None and ring is not None:
        logits = apply_repetition_penalty(logits, ring, params.repetition_penalty)
    if params.is_greedy:
        return jnp.argmax(logits).astype(jnp.int32)
    logits = logits / params.temperature
    if params.top_k is not None and params.top_k < logits.shape[-1]:
        logits = _mask_top_k(logits, params.top_k)
    if params.top_p is not None:
        logits = _mask_top_p(logits, params.top_p)
    if params.min_p is not None:
        logits = _mask_min_p(logits, params.min_p)
    gumbel = jax.random.gumbel(key, logits.shape, dtype=jnp.float32)
    return jnp.argmax(logits + gumbel).astype(jnp.int32)


def push_ring(ring: jax.Array, token: jax.Array) -> jax.Array:
    """Append a token to the recent-token ring (shift-left semantics)."""
    return jnp.concatenate([ring[1:], token.reshape(1)])

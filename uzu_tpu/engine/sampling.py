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


# -- dynamic (per-call) sampling parameters ----------------------------------
#
# The static sample() specializes the jitted step on ONE SamplingParams — the
# right trade for a single stream, but a continuous-batching server takes
# per-REQUEST temperature/top_k/top_p/min_p (OpenAI request fields), and
# compiling a fused batched step per parameter combination would explode the
# AOT-compile budget. sample_dynamic takes the parameters as traced scalars
# (one executable serves every combination); its masking pipeline reproduces
# sample()'s static semantics exactly for any values (same operation order,
# same tie handling, same sorted-space softmax/cumsum evaluation order), so
# a request with the engine-default parameters emits the identical stream
# through either path — tests pin this.

DYNAMIC_OFF = (0.0, 0, 1.0, 0.0, 0.0, 0.0)
# temperature, top_k, top_p, min_p, presence_penalty, frequency_penalty


def pack_dynamic(params: SamplingParams):
    """SamplingParams -> the 6 sentinel-encoded scalars (f32-storable).
    Presence/frequency penalties (OpenAI semantics: additive over the
    GENERATED completion's token counts) ride the same row; they are not
    SamplingParams fields — engines overwrite columns 4-5 per request."""
    return (
        float(params.temperature or 0.0),
        int(params.top_k or 0),
        float(params.top_p if params.top_p is not None else 1.0),
        float(params.min_p or 0.0),
        0.0,
        0.0,
    )


def apply_count_penalties(logits: jax.Array, counts: jax.Array,
                          presence: jax.Array, frequency: jax.Array) -> jax.Array:
    """OpenAI presence/frequency penalties: logits - presence*(count > 0)
    - frequency*count, over the per-slot GENERATED-token counts."""
    c = counts.astype(jnp.float32)
    return logits - presence * (c > 0) - frequency * c


def sample_dynamic(
    logits: jax.Array,  # [V] f32
    temperature: jax.Array,  # scalar f32; <= 0 => greedy
    top_k: jax.Array,  # scalar i32; <= 0 => off
    top_p: jax.Array,  # scalar f32; >= 1 => off
    min_p: jax.Array,  # scalar f32; <= 0 => off
    key: jax.Array,
    bitmask: jax.Array | None = None,
    banned_tokens: tuple = (),
) -> jax.Array:
    logits = logits.astype(jnp.float32)
    if banned_tokens:
        banned = jnp.asarray(banned_tokens, jnp.int32)
        logits = logits.at[banned].set(NEG_INF)
    if bitmask is not None:
        logits = jnp.where(bitmask, logits, NEG_INF)
    v = logits.shape[-1]
    greedy = temperature <= 0.0
    l = logits / jnp.where(greedy, 1.0, temperature)

    # one descending sort serves top-k (k-th largest VALUE — value-based
    # masking keeps ties exactly like lax.top_k's kth-value threshold) and
    # top-p (softmax/cumsum over the same sorted order the static path
    # builds inside _mask_top_p, so cutoffs match bit-for-bit)
    sl = jnp.sort(l)[::-1]
    k_on = top_k > 0
    k_eff = jnp.clip(jnp.where(k_on, top_k, v), 1, v)
    kth = sl[k_eff - 1]
    l = jnp.where(k_on & (l < kth), NEG_INF, l)
    slk = jnp.where(k_on & (sl < kth), NEG_INF, sl)

    p_on = top_p < 1.0
    probs = jax.nn.softmax(slk)
    cum = jnp.cumsum(probs)
    keep = cum - probs < top_p
    cutoff_p = jnp.min(jnp.where(keep, slk, jnp.inf))
    l = jnp.where(p_on & (l < cutoff_p), NEG_INF, l)

    # min_p mirrors _mask_min_p on the UNSORTED masked logits (identical
    # softmax evaluation order)
    m_on = min_p > 0.0
    probs_u = jax.nn.softmax(l)
    cutoff_m = jnp.max(probs_u) * min_p
    l = jnp.where(m_on & (probs_u < cutoff_m), NEG_INF, l)

    gumbel = jax.random.gumbel(key, l.shape, dtype=jnp.float32)
    sampled = jnp.argmax(l + gumbel).astype(jnp.int32)
    return jnp.where(greedy, jnp.argmax(logits).astype(jnp.int32), sampled)

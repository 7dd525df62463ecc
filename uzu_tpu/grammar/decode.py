"""Grammar-constrained generation loop.

Reference counterpart: the grammar bitmask path of LanguageModelStream
(stream.rs:632-675: per-step bitmask fill on host, mask applied inside the
fused sampling kernel). Same structure here: the matcher advances on the
host between steps, the mask rides into the jitted step and is applied
inside on-device sampling (sampling.sample's bitmask input). Grammar mode
steps one token per dispatch — the mask depends on the previous token, so
the multi-step fused chunk does not apply (the reference equally encodes
one forward pass per grammar step).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..engine.sampling import SamplingParams, sample
from ..models.decoder import decoder_forward
from .matcher import GrammarSession

_masked_step_cache: dict = {}


def _masked_decode_fn(lm, sampling: SamplingParams):
    key = (id(lm), sampling)
    if key not in _masked_step_cache:

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, state, token, key, mask):
            logits, state = decoder_forward(
                lm.decoder_config, params, token.reshape(1), state, last_only=True
            )
            next_token = sample(logits[0], sampling, key=key, bitmask=mask)
            return state, next_token

        _masked_step_cache[key] = step
    return _masked_step_cache[key]


def constrained_generate(
    lm,
    prompt_tokens,
    max_new_tokens: int,
    grammar: GrammarSession,
    *,
    sampling: SamplingParams | None = None,
    stop_token_ids=None,
    seed: int = 0,
    state=None,
):
    """Token generator with per-step grammar masks."""
    sampling = sampling or SamplingParams()
    stop = set(
        stop_token_ids
        if stop_token_ids is not None
        else lm.config.generation_config.stop_token_ids
    )
    grammar.stop_token_ids = sorted(stop) or grammar.stop_token_ids
    vocab = lm.decoder_config.vocab_size

    if state is None:
        state = lm.new_state()
    logits, state = lm.prefill(state, np.asarray(prompt_tokens, np.int32))
    mask = grammar.current_mask()
    mask_dev = None if mask is None else jnp.asarray(_pad_mask(mask, vocab))
    first = sample(logits, sampling, key=jax.random.PRNGKey(seed), bitmask=mask_dev)
    step_fn = _masked_decode_fn(lm, sampling)
    keys = jax.random.split(jax.random.PRNGKey(seed ^ 0x6A3), max_new_tokens + 1)

    token = first
    budget = min(max_new_tokens, lm.max_context - int(state["pos"]) - 1)
    full = jnp.ones(vocab, bool)
    for i in range(budget):
        val = int(jax.device_get(token))
        yield val
        if val in stop:
            return
        grammar.observe(val)
        mask = grammar.current_mask()
        mask_dev = full if mask is None else jnp.asarray(_pad_mask(mask, vocab))
        state, token = step_fn(lm.params, state, token, keys[i], mask_dev)
    val = int(jax.device_get(token))
    yield val


def _pad_mask(mask: np.ndarray, vocab: int) -> np.ndarray:
    if len(mask) == vocab:
        return mask
    out = np.zeros(vocab, bool)
    out[: len(mask)] = mask
    return out

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

def _masked_decode_fn(lm, sampling: SamplingParams):
    # cache lives ON the model (like the engines' executable caches): a
    # module-global keyed by id(lm) would strongly retain every model ever
    # used for constrained decoding — multi-GB of device params leaked per
    # model swap in a long-lived server process
    cache = lm.__dict__.setdefault("_grammar_step_jit", {})
    if sampling not in cache:

        @partial(jax.jit, donate_argnums=(1,))
        def step(params, state, token, key, mask):
            logits, state = decoder_forward(
                lm.decoder_config, params, token.reshape(1), state, last_only=True
            )
            next_token = sample(logits[0], sampling, key=key, bitmask=mask)
            return state, next_token

        cache[sampling] = step
    return cache[sampling]


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
    speculator=None,
    metrics=None,
):
    """Token generator with per-step grammar masks.

    With `speculator` (e.g. NgramSpeculator), runs grammar-constrained
    SPECULATIVE decoding: the draft chain's per-row masks come from
    GrammarSession.lookahead_masks (the reference fills bitmasks per trie
    node the same way, stream.rs:632-675), verification applies them inside
    one fused dispatch, and each dispatch yields 1 + accepted tokens — the
    plain grammar path pays a full host<->device roundtrip per token."""
    if speculator is not None:
        yield from _speculative_constrained(
            lm, prompt_tokens, max_new_tokens, grammar, speculator,
            sampling=sampling, stop_token_ids=stop_token_ids, seed=seed,
            state=state, metrics=metrics,
        )
        return
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
    # the loop yields `budget` tokens plus the final in-flight one
    budget = max(0, min(max_new_tokens - 1, lm.max_context - int(state["pos"]) - 1))
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


def _masked_verify_fn(lm, sampling: SamplingParams, n: int):
    """Fused grammar-speculative verify: per-row bitmasked sampling,
    exact-match acceptance ON DEVICE, and a deferred state commit of the
    1 + accepted kept tokens — so recurrent mixers (GDN/Mamba2/ShortConv)
    get grammar speculation too (their state replays over the accepted
    prefix instead of relying on attention's free pos-reset)."""
    cache = lm.__dict__.setdefault("_grammar_verify_jit", {})
    key = (sampling, n)
    if key not in cache:
        from ..models.decoder import decoder_commit_deferred

        @partial(jax.jit, donate_argnums=(1,))
        def verify(params, state, tokens, keys, masks, draft_len):
            logits, pending = decoder_forward(
                lm.decoder_config, params, tokens, state, last_only=False,
                defer_ssm=True,
            )
            sampled = jax.vmap(
                lambda l, k, m: sample(l, sampling, key=k, bitmask=m)
            )(logits, keys, masks)
            if n > 1:
                match = (sampled[:-1] == tokens[1:]) & (
                    jnp.arange(n - 1) < draft_len
                )
                accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
            else:
                accepted = jnp.zeros((), jnp.int32)
            new_state = decoder_commit_deferred(
                lm.decoder_config, pending, 1 + accepted
            )
            return new_state, sampled, accepted

        cache[key] = verify
    return cache[key]


def _speculative_constrained(
    lm, prompt_tokens, max_new_tokens, grammar, speculator, *,
    sampling, stop_token_ids, seed, state, metrics=None,
):
    from ..engine.speculation import speculation_supported

    if not speculation_supported(lm.decoder_config):
        raise ValueError("grammar speculation unsupported (KV-shared attention)")
    sampling = sampling or SamplingParams()
    stop = set(
        stop_token_ids
        if stop_token_ids is not None
        else lm.config.generation_config.stop_token_ids
    )
    grammar.stop_token_ids = sorted(stop) or grammar.stop_token_ids
    vocab = lm.decoder_config.vocab_size
    full = np.ones(vocab, bool)

    def dev_mask(m):
        return full if m is None else _pad_mask(m, vocab)

    if hasattr(speculator, "reset"):
        speculator.reset()
    history = [int(t) for t in prompt_tokens]
    if state is None:
        state = lm.new_state()
    logits, state = lm.prefill(state, np.asarray(prompt_tokens, np.int32))
    m0 = grammar.current_mask()
    first = int(jax.device_get(sample(
        logits, sampling, key=jax.random.PRNGKey(seed),
        bitmask=None if m0 is None else jnp.asarray(dev_mask(m0)),
    )))
    pos = len(history)
    produced = 0
    token = first
    # pool must exceed the wrap point (len - 32) by the largest block
    keys = jax.random.split(
        jax.random.PRNGKey(seed ^ 0x6A3), max(max_new_tokens * 4 + 8, 72)
    )
    key_i = 0

    while produced < max_new_tokens:
        yield token
        history.append(token)
        produced += 1
        if token in stop or produced >= max_new_tokens:
            return  # budget exhausted: skip the wasted final verify
        grammar.observe(token)
        room = lm.max_context - pos - 1
        if room <= 0:
            return
        draft = list(speculator.propose(history)) if room > 1 else []
        draft = draft[: min(len(draft), room - 1, max_new_tokens - produced,
                            (1 << 5) - 1)]
        masks = grammar.lookahead_masks(draft)
        draft = draft[: len(masks) - 1]
        n = 1 + len(draft)
        n_pad = 1
        while n_pad < n:
            n_pad *= 2
        n_pad = min(n_pad, 1 << 5)
        block = np.zeros(n_pad, np.int32)
        block[0] = token
        block[1 : 1 + len(draft)] = draft
        mask_rows = np.ones((n_pad, vocab), bool)
        for i, m in enumerate(masks[:n_pad]):
            mask_rows[i] = dev_mask(m)

        verify = _masked_verify_fn(lm, sampling, n_pad)
        state, sampled, accepted_d = verify(
            lm.params, state, jnp.asarray(block),
            keys[key_i : key_i + n_pad], jnp.asarray(mask_rows),
            jnp.asarray(len(draft), jnp.int32),
        )
        key_i = (key_i + n_pad) % (len(keys) - 32)
        vals, accepted = jax.device_get((sampled, accepted_d))
        accepted = int(accepted)
        if metrics is not None:
            metrics.num_verify_passes += 1
            metrics.num_tokens_proposed += len(draft)
            metrics.num_tokens_accepted += accepted
        emit = [int(v) for v in vals[: accepted + 1]]

        # the dispatch committed 1 + accepted tokens (pos + replayed
        # recurrent state); mirror the position on host
        pos = pos + 1 + accepted

        for v in emit[:-1]:
            yield v
            history.append(v)
            produced += 1
            if v in stop or produced >= max_new_tokens:
                return
            grammar.observe(v)
        token = emit[-1]


def _pad_mask(mask: np.ndarray, vocab: int) -> np.ndarray:
    if len(mask) == vocab:
        return mask
    out = np.zeros(vocab, bool)
    out[: len(mask)] = mask
    return out

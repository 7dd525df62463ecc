"""Fused multi-round speculative decoding: R draft+verify rounds per dispatch.

The per-round speculative decoder (speculation.py) pays one host fetch per
round (~25 ms through the remote-PJRT tunnel) because acceptance is decided
on host between rounds. That tax is why unconstrained single-stream
speculation loses to the engine's fused 64-step plain chunks even at high
acceptance (BASELINE r5 tunnel-economics attribution). This module is the
TPU-native answer assessed in DESIGN.md "Future work": run the WHOLE round —
device-side greedy draft chain, (k+1)-row deferred verify, exact-match
acceptance, stop/budget clipping, state commit — inside one `lax.scan` over
R rounds, and fetch once per dispatch. The tunnel cost amortizes R-fold and
the compute economics (fwd-equivalents per token) become the only term.

Reference counterpart: the reference's speculative stream loop
(crates/backend-uzu/src/engine/stream/stream.rs:553-629) also re-plans on
host per round; its GPU keeps latency low enough that this never mattered.
On a remote TPU the dispatch boundary IS the cost, so the rounds move inside
the executable — same XLA static-shape discipline as the engine's fused
decode chunks (engine.py _decode_fn).

Design (all shapes static; every round identical):

- draft chain: k greedy steps of `decoder_forward` on a functional VIEW of
  the draft state (`lax.scan` carry, final state discarded) — the same
  discarded-view trick DraftModelSpeculator uses for hybrid drafts, here
  applied uniformly so attention AND recurrent-mixer drafts take one path;
- verify: one (k+1)-row deferred forward of the target (defer_ssm), a
  sampled token per row, exact-match acceptance via cumprod, commit clipped
  at the first stop token and the remaining budget, then
  `decoder_commit_deferred` — identical math to SpeculativeDecoder._verify_fn
  so fused output is bit-identical to the per-round decoder (and to plain
  greedy decoding, the load-bearing invariant);
- draft-state sync: the tokens the draft must absorb before the next round
  are exactly `block[:commit]` (the verify input's committed prefix — root +
  accepted drafts), so a SEPARATE draft model replays that block through its
  own deferred forward and commits to the same length. A SELF-draft (the
  target's first `draft_layers` layers) needs nothing: the target commit
  already wrote those layers' rows, so next round's chain just re-views the
  committed target state;
- rounds after a stop/budget/context exhaustion no-op through `lax.cond`;
  sampled blocks land in a [R*(k+1)] output buffer at the running produced
  offset (later rounds overwrite the uncommitted tail of earlier blocks;
  the host slices [:produced]).

Greedy output is bit-identical to plain decoding. Sampled (non-greedy)
generation draws a fresh key grid per dispatch, so its stream differs from
the per-round decoder's key sequence (both are valid samples of the same
process); the acceptance rule itself is the same exact-match-on-sampled
rule either way.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import decoder_commit_deferred, decoder_forward
from .sampling import SamplingParams, sample
from .speculation import (
    SpecStream,
    SpeculationMetrics,
    self_draft_model,
    speculation_supported,
)


class FusedSpeculativeDecoder:
    """Chain speculation with R rounds fused into each dispatch.

    Exactly one of `draft_lm` (a separate smaller LanguageModel sharing the
    tokenizer) or `draft_layers` (self-speculation on the target's first n
    layers — no extra weights) selects the draft. `k` drafts per round,
    `rounds` rounds per dispatch.
    """

    def __init__(self, lm, *, draft_lm=None, draft_layers: int | None = None,
                 ngram: bool = False, ngram_window: int = 512,
                 k: int = 4, rounds: int = 8,
                 sampling: SamplingParams | None = None):
        if not speculation_supported(lm.decoder_config):
            raise ValueError("chain speculation unsupported (KV-shared attention)")
        if (draft_lm is not None) + (draft_layers is not None) + ngram != 1:
            raise ValueError(
                "exactly one of draft_lm / draft_layers / ngram required")
        if k < 1 or rounds < 1:
            raise ValueError("k and rounds must be >= 1")
        self.lm = lm
        self.k = k
        self.rounds = rounds
        self.sampling = sampling or SamplingParams()
        self.draft = None
        self._self_layers = None
        self._ngram_window = ngram_window if ngram else None
        self._draft_ctx = lm.max_context
        if draft_lm is not None:
            if not speculation_supported(draft_lm.decoder_config):
                raise ValueError("draft model has KV-shared attention")
            self.draft = draft_lm
            self._draft_ctx = draft_lm.max_context
        elif draft_layers is not None:
            # config/params view only — the fused fn slices the target's own
            # params at trace time, so no second weight pytree exists
            self.draft = self_draft_model(lm, draft_layers)
            self._self_layers = draft_layers
        self._fused_jit = {}

    # -- fused executable ---------------------------------------------------

    def _fused_fn(self, stop_ids: tuple):
        if stop_ids not in self._fused_jit:
            self._fused_jit[stop_ids] = self._build_fused(stop_ids)
        return self._fused_jit[stop_ids]

    def _build_fused(self, stop_ids: tuple):
        tcfg = self.lm.decoder_config
        dcfg = self.draft.decoder_config if self.draft is not None else None
        k, rounds, n = self.k, self.rounds, self.k + 1
        sampling = self.sampling
        self_layers = self._self_layers
        ctx = min(self.lm.max_context, self._draft_ctx)
        mode = ("ngram" if self._ngram_window is not None
                else "self" if self_layers is not None else "model")

        def round_active(dparams, params, carry, rkeys):
            (tstate, dstate, token, remaining, produced, _, out,
             hist, hlen) = carry

            if mode == "ngram":
                from ..ops.ngram import ngram_propose

                draft_toks, dlen = ngram_propose(hist, hlen, k)
            else:
                dview = ({"layers": tstate["layers"][:self_layers],
                          "pos": tstate["pos"]}
                         if mode == "self" else dstate)

                def chain_step(c, _):
                    st, t = c
                    lg, st = decoder_forward(dcfg, dparams, t.reshape(1), st,
                                             last_only=True)
                    nt = jnp.argmax(lg[0]).astype(jnp.int32)
                    return (st, nt), nt

                (_, _), draft_toks = jax.lax.scan(
                    chain_step, (dview, token), None, length=k)
                dlen = jnp.asarray(k, jnp.int32)

            # clip the acceptance window to the remaining budget BEFORE the
            # match (the per-round decoder clips drafts[:remaining-1] before
            # its verify) — keeps num_tokens_proposed honest at budget edges
            # and the acceptance mask identical to per-round
            dlen = jnp.minimum(dlen, jnp.maximum(remaining - 1, 0)
                               .astype(jnp.int32))
            block = jnp.concatenate([token.reshape(1), draft_toks])
            logits, pending = decoder_forward(
                tcfg, params, block, tstate, last_only=False, defer_ssm=True)
            sampled = jax.vmap(lambda l, kk: sample(l, sampling, key=kk))(
                logits, rkeys)
            match = (sampled[:-1] == block[1:]) & (jnp.arange(k) < dlen)
            accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
            commit = 1 + accepted
            rows = jnp.arange(n)
            if stop_ids:
                is_stop = jnp.zeros(n, bool)
                for t in stop_ids:
                    is_stop = is_stop | (sampled == t)
                first_stop = jnp.min(
                    jnp.where(is_stop & (rows < commit), rows, n))
                commit = jnp.minimum(commit, first_stop + 1)
            commit = jnp.minimum(commit, remaining)
            tstate = decoder_commit_deferred(tcfg, pending, commit)
            if mode == "model":
                _, dpending = decoder_forward(
                    dcfg, dparams, block, dstate, last_only=True,
                    defer_ssm=True)
                dstate = decoder_commit_deferred(dcfg, dpending, commit)
            if mode == "ngram":
                hist = jax.lax.dynamic_update_slice(hist, sampled, (hlen,))
                hlen = hlen + commit
            out = jax.lax.dynamic_update_slice(out, sampled, (produced,))
            token = sampled[commit - 1]
            produced = produced + commit
            remaining = remaining - commit
            if stop_ids:
                stop_hit = jnp.any(is_stop & (rows < commit))
            else:
                stop_hit = jnp.asarray(False)
            done = stop_hit | (remaining <= 0) | (tstate["pos"] + n > ctx)
            return ((tstate, dstate, token, remaining, produced, done, out,
                     hist, hlen),
                    (accepted, dlen, jnp.asarray(True)))

        def round_body(dparams, params, carry, rkeys):
            done = carry[5]
            return jax.lax.cond(
                done,
                lambda c, _: (c, (jnp.asarray(0, jnp.int32),
                                  jnp.asarray(0, jnp.int32),
                                  jnp.asarray(False))),
                partial(round_active, dparams, params),
                carry, rkeys,
            )

        def scan_rounds(dparams, params, init, keys):
            carry, (acc, prop, active) = jax.lax.scan(
                partial(round_body, dparams, params), init, keys)
            return carry, (jnp.sum(acc), jnp.sum(prop),
                           jnp.sum(active.astype(jnp.int32)))

        zero = jnp.asarray(0, jnp.int32)

        if mode == "ngram":

            @partial(jax.jit, donate_argnums=(1,))
            def fused(params, tstate, token, remaining, hist, hlen, keys):
                out = jnp.zeros(rounds * n, jnp.int32)
                init = (tstate, 0, token, remaining, zero,
                        jnp.asarray(False), out, hist, hlen)
                carry, sums = scan_rounds(None, params, init, keys)
                tstate, _, token, _, produced, done, out = carry[:7]
                return (tstate, token, out, produced, done) + sums

            return fused

        if mode == "self":

            @partial(jax.jit, donate_argnums=(1,))
            def fused(params, tstate, token, remaining, keys):
                dparams = dict(params)
                dparams["layers"] = list(params["layers"][:self_layers])
                out = jnp.zeros(rounds * n, jnp.int32)
                init = (tstate, 0, token, remaining, zero,
                        jnp.asarray(False), out, zero, zero)
                carry, sums = scan_rounds(dparams, params, init, keys)
                tstate, _, token, _, produced, done, out = carry[:7]
                return (tstate, token, out, produced, done) + sums

            return fused

        @partial(jax.jit, donate_argnums=(2, 3))
        def fused(params, dparams, tstate, dstate, token, remaining, keys):
            out = jnp.zeros(rounds * n, jnp.int32)
            init = (tstate, dstate, token, remaining, zero,
                    jnp.asarray(False), out, zero, zero)
            carry, sums = scan_rounds(dparams, params, init, keys)
            tstate, dstate, token, _, produced, done, out = carry[:7]
            return (tstate, dstate, token, out, produced, done) + sums

        return fused

    # -- host loop ----------------------------------------------------------

    def generate(self, prompt_tokens, max_new_tokens: int, stop_token_ids=None,
                 seed: int = 0, metrics: SpeculationMetrics | None = None,
                 state=None, history_tokens=None):
        """Same contract as SpeculativeDecoder.generate: a SpecStream whose
        `.state` carries the final decoding state once iteration ends."""
        return SpecStream(self, prompt_tokens, max_new_tokens, stop_token_ids,
                          seed, metrics, state, history_tokens)

    def _generate_impl(self, prompt_tokens, max_new_tokens, stop_token_ids,
                       seed, metrics, init_state, history_tokens, out):
        lm = self.lm
        stop = tuple(sorted(set(
            stop_token_ids if stop_token_ids is not None
            else lm.config.generation_config.stop_token_ids)))
        n = self.k + 1
        state = init_state if init_state is not None else lm.new_state()
        base = int(state["pos"])
        logits, state = lm.prefill(state, np.asarray(prompt_tokens, np.int32))
        if self.sampling.is_greedy:
            first = int(jnp.argmax(logits))
        else:
            first = int(sample(logits, self.sampling,
                               key=jax.random.PRNGKey(seed)))
        pos = base + len(prompt_tokens)
        dstate = None
        history = None
        if self.draft is not None and self._self_layers is None:
            # the draft absorbs the full committed history; the root token
            # reaches it inside each round as block[0]
            hist0 = np.asarray(
                history_tokens if history_tokens is not None else prompt_tokens,
                np.int32)
            dstate = self.draft.new_state()
            if len(hist0):
                _, dstate = self.draft.prefill(dstate, hist0)
        if self._ngram_window is not None:
            history = [int(t) for t in (
                history_tokens if history_tokens is not None else prompt_tokens
            )] + [first]

        produced = 1
        token = first
        fused = self._fused_fn(stop)
        dispatch = 0
        yield first
        while (token not in stop and produced < max_new_tokens
               and pos + n <= min(lm.max_context, self._draft_ctx)):
            out.state = None  # invalidated while a dispatch is in flight
            keys = jax.random.split(
                jax.random.PRNGKey(seed ^ (0xF5ED + dispatch)),
                self.rounds * n).reshape(self.rounds, n, -1)
            dispatch += 1
            remaining = jnp.asarray(max_new_tokens - produced, jnp.int32)
            if self._ngram_window is not None:
                w = self._ngram_window
                cbuf = w + self.rounds * n  # room for the in-scan appends
                tail = history[-w:]
                hbuf = np.zeros(cbuf, np.int32)
                hbuf[: len(tail)] = tail
                state, tok_d, buf, n_out, done, acc, prop, rounds_run = fused(
                    lm.params, state, jnp.asarray(token, jnp.int32),
                    remaining, jnp.asarray(hbuf),
                    jnp.asarray(len(tail), jnp.int32), keys)
            elif self._self_layers is not None:
                state, tok_d, buf, n_out, done, acc, prop, rounds_run = fused(
                    lm.params, state, jnp.asarray(token, jnp.int32),
                    remaining, keys)
            else:
                (state, dstate, tok_d, buf, n_out, done, acc, prop,
                 rounds_run) = fused(
                    lm.params, self.draft.params, state, dstate,
                    jnp.asarray(token, jnp.int32), remaining, keys)
            buf, n_out, done, acc, prop, rounds_run = jax.device_get(
                (buf, n_out, done, acc, prop, rounds_run))
            n_out = int(n_out)
            if metrics is not None:
                metrics.num_verify_passes += int(rounds_run)
                metrics.num_tokens_proposed += int(prop)
                metrics.num_tokens_accepted += int(acc)
            for v in buf[:n_out]:
                yield int(v)
            if history is not None:
                history.extend(int(v) for v in buf[:n_out])
            produced += n_out
            pos += n_out
            token = int(buf[n_out - 1]) if n_out else token
            if bool(done) and token not in stop:
                # done for a non-stop reason (budget / context) — nothing
                # more to dispatch either way
                break
        state["pos"] = jnp.asarray(base + len(prompt_tokens)
                                   + max(0, produced - 1), jnp.int32)
        out.state = state


def fused_self_speculative_decoder(lm, *, draft_layers: int | None = None,
                                   k: int = 4, rounds: int = 8, sampling=None):
    """Self-speculation with fused rounds — the zero-artifact configuration
    (mirrors speculation.self_speculative_decoder)."""
    num = len(lm.decoder_config.transformer_config.layer_configs)
    return FusedSpeculativeDecoder(
        lm, draft_layers=draft_layers or max(1, num // 2), k=k, rounds=rounds,
        sampling=sampling)

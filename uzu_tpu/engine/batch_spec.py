"""Speculative continuous batching: per-slot chain drafts, one fused verify.

No reference counterpart on either axis — trymirai/uzu speculates only for a
single session (stream.rs:553-578) and has no cross-request batching at all
(SURVEY.md §2.7); this combines the repo's two from-scratch designs: the
slot-based continuous-batching engines (engine/batch.py, paged_batch.py)
and the deferred-commit chain verify (engine/speculation.py:232).

Design:
- every active slot drafts up to `draft_block` tokens — host-side (per-slot
  ngram speculator over that request's own history) or ON DEVICE
  (``draft_layers=n``: a layer-truncated self-draft chained inside the
  verify dispatch; the truncated model shares weights AND KV with the
  target's first n layers, so the chain runs on a functional VIEW of the
  target state — its writes are discarded and the verify rewrites the
  identical rows);
- ONE dispatch verifies all slots: an (m+1)-row forward, a sampled token at
  every row, exact-match acceptance, stop/budget clipping, and the per-slot
  state commit — all on device; halted slots take commit=0 identity
  transitions;
- the host fetches (sampled, commit) each round and routes emit rows
  [:commit] per slot. Unlike the plain engines' one-chunk-ahead pipelining,
  speculation is inherently synchronous: the NEXT round's drafts need THIS
  round's tokens, so each round pays one host<->device roundtrip and earns
  up to draft_block+1 tokens per slot for one weight stream. At acceptance
  ~0 the plain chunked engine is faster on high-latency links; the server
  picks per workload.

Sampling keys are indexed by the slot's PRODUCED-TOKEN COUNT, not the round
number: rejected rows consume no key, so the emitted stream is a
deterministic function of (prompt, seed) — which keeps the paged engine's
recompute preemption lossless under sampling (a preempted request replays
its exact stream; see PagedBatchEngine._preempt).

Greedy outputs are bit-identical to single-request plain generation (the
verify samples the same greedy argmax rows the plain loop would).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import decoder_commit_deferred, decoder_forward
from ..models.paged_kv import PagePoolOverflow
from .batch import BatchEngine
from .paged_batch import PagedBatchEngine
from .sampling import apply_count_penalties, sample, sample_dynamic
from .speculation import NgramSpeculator, SpeculationMetrics, speculation_supported


def _check_spec_rounds(spec_rounds, draft_layers, device_ngram):
    """Fused rounds need an IN-SCAN draft source: a layer-truncated
    self-draft or the device n-gram matcher (ops/ngram.py). Host ngram
    proposals re-plan between rounds and cannot ride the scan."""
    if spec_rounds > 1 and draft_layers is None and not device_ngram:
        raise ValueError("spec_rounds > 1 requires draft_layers or "
                         "device_ngram (host drafts re-plan every round)")
    if device_ngram and spec_rounds <= 1:
        raise ValueError("device_ngram rides the fused rounds; per-round "
                         "engines already draft on host (make_speculator)")
    if device_ngram and draft_layers is not None:
        raise ValueError("device_ngram and draft_layers are exclusive "
                         "draft sources")


class _SpecScheduling:
    """Host-side round scheduling shared by the dense and paged speculative
    engines (they differ only in device plumbing: state dict vs pools +
    page tables)."""

    def _init_spec(self, lm, draft_block, make_speculator, draft_layers):
        self.draft_block = draft_block
        self.draft_layers = draft_layers
        self._vocab = lm.decoder_config.vocab_size
        if draft_layers is not None:
            n_total = len(lm.decoder_config.transformer_config.layer_configs)
            if not 0 < draft_layers < n_total:
                raise ValueError(f"draft_layers must be in [1, {n_total - 1}]")
            from .speculation import self_draft_model

            # config/shape validation only — weights are sliced from the
            # target params at trace time, no copy
            self._draft_cfg = self_draft_model(lm, draft_layers).decoder_config
        self._make_spec = make_speculator or (
            lambda: NgramSpeculator(max_ngram=3, k=draft_block)
        )
        self._slot_spec = [None] * self.batch_size
        self.metrics = SpeculationMetrics()


    def _ngram_hist(self, m, rounds):
        """(hist [B, W + rounds*(m+1)], hlen [B]) — each live slot's token
        -history tail for the in-scan device n-gram matcher, rebuilt from
        the host's request bookkeeping at every dispatch (256 KB-order
        upload riding the dispatch args)."""
        w = self.ngram_window
        cbuf = w + rounds * (m + 1)
        hist = np.zeros((self.batch_size, cbuf), np.int32)
        hlen = np.zeros(self.batch_size, np.int32)
        for b, slot in enumerate(self.slots):
            if slot.free:
                continue
            tail = (slot.request.prompt + slot.request.tokens)[-w:]
            hist[b, : len(tail)] = tail
            hlen[b] = len(tail)
        return jnp.asarray(hist), jnp.asarray(hlen)

    def _new_slot_spec(self, slot_i):
        self._slot_spec[slot_i] = self._make_spec()
        if hasattr(self._slot_spec[slot_i], "reset"):
            self._slot_spec[slot_i].reset()

    def _fetch_first_tokens(self):
        """Route freshly admitted slots' first tokens (one device_get) so
        every active slot's host history ends at its root token. Runs
        BEFORE any horizon/finish decision — a slot admitted at the edge of
        context must still emit its already-sampled first token."""
        import time

        firsts = {
            b: s.pending_first
            for b, s in enumerate(self.slots)
            if not s.free and s.pending_first is not None
        }
        if not firsts:
            return
        vals = jax.device_get(firsts)
        for b, v in vals.items():
            slot = self.slots[b]
            req = slot.request
            slot.pending_first = None
            req.first_token_at = time.perf_counter()
            if isinstance(v, tuple):  # (token, lp, top_v, top_i)
                tok = int(v[0])
                if req.logprobs:
                    req.logprob_content.append((
                        float(v[1]),
                        [(int(i), float(x)) for i, x in zip(v[3], v[2])],
                    ))
            else:
                tok = int(v)
            req.tokens.append(tok)
            slot.produced += 1
            if tok in self.stop_ids:
                self._finish(b, "stop")
            elif slot.produced >= req.max_new_tokens:
                self._finish(b, "length")
            elif req.grammar is not None:
                # the first token is the root of the next verify round —
                # its lookahead masks start from the state AFTER it
                req.grammar.observe(tok)

    def _build_drafts(self, m):
        """(drafts [B, m], draft_len [B], tracked {slot: req}, masks,
        host_draft); host ngram proposals clip to the remaining generation
        budget (over-proposing only wastes verify rows and skews the
        acceptance metric).

        Grammar slots ALWAYS draft on host (their per-row lookahead masks
        must be computed from the proposed chain before the dispatch —
        grammar/matcher.py lookahead_masks, the batched analogue of
        stream.rs:632-675); in ``draft_layers`` mode `host_draft[b]` marks
        them so the device self-draft is overridden per slot. `masks` is
        None when no active slot is constrained — the unmasked verify
        executable is reused untouched."""
        drafts = np.zeros((self.batch_size, m), np.int32)
        draft_len = np.zeros(self.batch_size, np.int32)
        host_draft = np.zeros(self.batch_size, bool)
        masks = None
        tracked = {}
        for b, slot in enumerate(self.slots):
            if slot.free:
                continue
            req = slot.request
            budget = max(0, req.max_new_tokens - slot.produced - 1)
            if req.grammar is None and self.draft_layers is not None:
                # drafted on device inside the dispatch; mirror the device's
                # budget clip so the metrics count what can be accepted
                draft_len[b] = min(m, budget)
                tracked[b] = req
                continue
            history = req.prompt + req.tokens
            proposal = list(self._slot_spec[b].propose(history))[:m]
            proposal = proposal[:budget]
            if req.grammar is not None:
                from ..grammar.decode import _pad_mask

                look = req.grammar.lookahead_masks(proposal)
                proposal = proposal[: len(look) - 1]
                host_draft[b] = True
                if any(mk is not None for mk in look):
                    if masks is None:
                        masks = np.ones(
                            (self.batch_size, m + 1, self._vocab), bool
                        )
                    for i, mk in enumerate(look):
                        if mk is not None:
                            masks[b, i] = _pad_mask(mk, self._vocab)
            drafts[b, : len(proposal)] = proposal
            draft_len[b] = len(proposal)
            tracked[b] = req
        return drafts, draft_len, tracked, masks, host_draft

    def _spec_keys(self, tracked, m):
        """Per-row sampling keys indexed by the slot's produced-token count:
        row i of this round samples the request's (produced + i)-th token if
        it commits, and rejected rows consume no index — so replay after
        recompute preemption regenerates the identical stream."""
        keys = np.zeros((self.batch_size, m + 1, 2), np.uint32)
        for b in tracked:
            keys[b, :, 0] = np.uint32(self._seeds[b] & 0xFFFFFFFF)
            keys[b, :, 1] = (
                np.uint64(self.slots[b].produced)
                + np.arange(m + 1, dtype=np.uint64)
            ).astype(np.uint32)
        return keys

    def _route_round(self, tracked, vals, commits, draft_len, lp_pack=None):
        """Route one fetched round's committed tokens to requests; finish
        detection mirrors the device-side halt conditions."""
        if tracked:
            # one fused dispatch == one verify pass (keeps the server's
            # acceptance stats comparable with the single-stream decoders)
            self.metrics.num_verify_passes += 1
        for b, req in tracked.items():
            if req.finished:
                continue
            c = int(commits[b])
            slot = self.slots[b]
            self.metrics.num_tokens_proposed += int(draft_len[b])
            self.metrics.num_tokens_accepted += max(0, c - 1)
            slot.pos += c
            for j, v in enumerate(int(x) for x in vals[b, :c]):
                req.tokens.append(v)
                if req.logprobs and lp_pack is not None:
                    lp, top_v, top_i = lp_pack
                    req.logprob_content.append((
                        float(lp[b, j]),
                        [(int(i), float(x))
                         for i, x in zip(top_i[b, j], top_v[b, j])],
                    ))
                slot.produced += 1
                if v in self.stop_ids:
                    self._finish(b, "stop")
                    break
                if slot.produced >= req.max_new_tokens:
                    self._finish(b, "length")
                    break
                if req.grammar is not None:
                    # mirror the single-stream constrained loop's order
                    # (grammar/decode.py:230): observe only tokens the
                    # stream continues past
                    req.grammar.observe(v)
            else:
                if slot.pos >= self.lm.max_context - 1:
                    self._finish(b, "length")

    def _finish_horizon(self, m):
        """A verify writes m+1 KV rows, so a slot finishes once fewer than
        m+2 slots of context remain (slightly earlier than the plain
        engine's ctx_last — the write-room cost of block verification)."""
        for b, slot in enumerate(self.slots):
            if not slot.free and slot.pos >= self.lm.max_context - (m + 2):
                self._finish(b, "length")

    def step(self) -> bool:
        # greedy-fill admission (see BatchEngine.step): a verify round costs
        # the same at any occupancy, so fill slots before paying one
        admitted = False
        while self._admit():
            admitted = True
            if self.num_active and not getattr(self, "admit_greedy", True):
                break
            if self.num_active >= self.batch_size:
                break
        if self.num_active or any(
            not s.free and s.pending_first is not None for s in self.slots
        ):
            self._verify_round()
        return bool(admitted or self.queue or self.num_active or self._admitting)

    def run(self) -> None:
        while self.queue or self.num_active or self._admitting:
            self.step()


class SpeculativeBatchEngine(_SpecScheduling, BatchEngine):
    """BatchEngine whose decode path is a fused batched chain verify (see
    module docstring for the draft sources and the key schedule)."""

    supports_grammar = True
    supports_count_penalties = True

    def __init__(self, lm, *, draft_block: int = 8, make_speculator=None,
                 draft_layers: int | None = None, spec_rounds: int = 1,
                 device_ngram: bool = False, ngram_window: int = 512, **kw):
        if not speculation_supported(lm.decoder_config):
            raise ValueError("chain speculation unsupported (KV-shared attention)")
        _check_spec_rounds(spec_rounds, draft_layers, device_ngram)
        super().__init__(lm, **kw)
        self._init_spec(lm, draft_block, make_speculator, draft_layers)
        self.spec_rounds = spec_rounds
        self.device_ngram = device_ngram
        self.ngram_window = ngram_window
        self._verify_jit = lm.__dict__.setdefault("_batch_verify_jit", {})

    # -- jitted verify ------------------------------------------------------

    def _verify_fn(self, m: int, ctx_bucket=None, masked: bool = False,
                   dynamic: bool = False, logprobs: int = 0,
                   penalties: bool = False, rounds: int = 1):
        """m draft rows + 1 root row per slot, one donated dispatch.
        `masked` adds per-row grammar bitmasks [B, m+1, V] and a per-slot
        host-draft override flag (grammar slots keep host chains even in
        ``draft_layers`` mode); `dynamic` adds per-slot sampling-parameter
        rows [B, 4]; `logprobs` > 0 emits per-row raw-logit logprobs + the
        top alternatives; `penalties` threads per-slot generated-token count
        rows [B, V] through the verify (OpenAI presence/frequency): row i is
        penalized with base counts + the chain prefix drafts[0..i-1] — exact,
        because row i's sample only commits when every earlier draft was
        accepted, and then those drafts ARE the generated tokens. The default
        executable is untouched.

        `rounds` > 1 (device-draft mode only, no grammar/logprob slots):
        the WHOLE round — self-draft chains, verify, acceptance, commit —
        scans R times inside one executable, fetching once per dispatch
        instead of once per round (the batched form of
        engine/fused_spec.py). Sampling keys are built IN-SCAN from the
        same produced-count schedule the host builds, so emitted streams
        are identical to the per-round engine's."""
        assert not penalties or dynamic
        assert rounds == 1 or ((self.draft_layers is not None
                                or self.device_ngram)
                               and not masked and not logprobs)
        key = (self.sampling, m, self.stop_ids, self.batch_size, ctx_bucket,
               self.draft_layers, masked, dynamic, logprobs, penalties,
               rounds, self.device_ngram and rounds > 1)
        if key not in self._verify_jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling
            stop_arr = jnp.asarray(self.stop_ids, jnp.int32) if self.stop_ids else None
            ctx_last = self.lm.max_context - 1
            nd = self.draft_layers
            draft_cfg = self._draft_cfg if nd is not None else None

            def one(params, state, token, drafts, draft_len, halted, remaining,
                    keys, masks_r=None, hd=None, samp=None, counts=None):
                if nd is not None:
                    # device-side self-draft: greedy chain on a functional
                    # VIEW of the target's first nd layer states — the
                    # chain's KV writes die with the view; verify rewrites
                    # the identical rows from the same weights
                    dparams = dict(params)
                    dparams["layers"] = list(params["layers"][:nd])
                    dview = {"layers": list(state["layers"][:nd]),
                             "pos": state["pos"]}

                    def dstep(carry, _):
                        ds, t = carry
                        dlogits, ds = decoder_forward(
                            draft_cfg, dparams, t.reshape(1), ds,
                            last_only=True, ctx_limit=ctx_bucket,
                        )
                        nt = jnp.argmax(dlogits[0]).astype(jnp.int32)
                        return (ds, nt), nt

                    _, self_drafts = jax.lax.scan(
                        dstep, (dview, token), None, length=m
                    )
                    # clip the device draft's ACCEPTANCE WINDOW to the
                    # remaining budget like the host path does — commit
                    # was already budget-clipped (streams identical), but
                    # an unclipped draft_len inflates num_tokens_proposed
                    # and understates the reported acceptance rate
                    dev_len = jnp.minimum(
                        jnp.asarray(m, jnp.int32),
                        jnp.maximum(remaining - 1, 0).astype(jnp.int32))
                    drafts = jnp.where(hd, drafts, self_drafts)
                    draft_len = jnp.where(hd, draft_len, dev_len)
                tokens = jnp.concatenate([token[None], drafts])  # [m+1]
                logits, pending = decoder_forward(
                    cfg, params, tokens, state, last_only=False, defer_ssm=True,
                    ctx_limit=ctx_bucket,
                )
                sampled_from = logits
                if penalties:
                    # row i's counts = base + one-hots of the chain prefix
                    # drafts[0..i-1] (the root token was counted when IT
                    # committed last round); raw logits stay untouched for
                    # the logprob report, mirroring the plain decode scan
                    v = logits.shape[-1]
                    oh = jax.nn.one_hot(tokens[1:], v, dtype=jnp.int32)
                    chain = jnp.concatenate(
                        [jnp.zeros((1, v), jnp.int32),
                         jnp.cumsum(oh, axis=0)], axis=0)  # [m+1, V]
                    sampled_from = apply_count_penalties(
                        logits.astype(jnp.float32), counts[None, :] + chain,
                        samp[4], samp[5])
                def row(l, kk, mm):
                    if dynamic:
                        return sample_dynamic(
                            l, samp[0], samp[1].astype(jnp.int32), samp[2],
                            samp[3], kk, bitmask=mm,
                            banned_tokens=sampling.banned_tokens,
                        )
                    return sample(l, sampling, key=kk, bitmask=mm)

                if masked:
                    sampled = jax.vmap(row)(sampled_from, keys, masks_r)
                else:
                    sampled = jax.vmap(lambda l, kk: row(l, kk, None))(
                        sampled_from, keys
                    )
                match = (sampled[:-1] == tokens[1:]) & (jnp.arange(m) < draft_len)
                accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
                emit_len = 1 + accepted
                commit = emit_len
                rows = jnp.arange(m + 1)
                if stop_arr is not None:
                    is_stop = jnp.any(sampled[:, None] == stop_arr[None, :], axis=1)
                    first_stop = jnp.min(jnp.where(is_stop & (rows < emit_len), rows, m + 1))
                    commit = jnp.minimum(commit, first_stop + 1)
                commit = jnp.minimum(commit, remaining)
                commit = jnp.where(halted, 0, commit)
                new_state = decoder_commit_deferred(cfg, pending, commit)
                nxt = jnp.where(halted, token, sampled[jnp.maximum(commit - 1, 0)])
                remaining = remaining - commit
                stopped = jnp.zeros((), bool)
                if stop_arr is not None:
                    stopped = jnp.any(is_stop & (rows < commit))
                halted = halted | stopped | (remaining <= 0) | (new_state["pos"] >= ctx_last)
                out = (new_state, nxt, halted, remaining, sampled, commit)
                if penalties:
                    v = logits.shape[-1]
                    committed = jax.nn.one_hot(
                        sampled, v, dtype=jnp.int32) * (rows < commit)[:, None]
                    out += (counts + jnp.sum(committed, axis=0),)
                if logprobs:
                    lp_rows = jax.nn.log_softmax(logits.astype(jnp.float32))
                    top_v, top_i = jax.lax.top_k(lp_rows, logprobs)
                    tok_lp = jnp.take_along_axis(
                        lp_rows, sampled[:, None], axis=1)[:, 0]
                    out += (tok_lp, top_v, top_i)
                return out

            @partial(jax.jit, donate_argnums=(1,))
            def verify_b(params, state, tokens, drafts, draft_len, halted,
                         remaining, keys, *extra):
                # extra rides per the variant flags, in order: hd [B] when
                # draft_layers (its own cheap lane — an unengaged grammar
                # trigger must NOT force a ~V-wide all-ones mask upload),
                # masks [B, m+1, V] when masked, samp [B, 6] when dynamic,
                # counts [B, V] when penalties; the default variant's
                # signature stays unchanged
                i = 0
                hd = masks = samp = counts = None
                if nd is not None:
                    hd = extra[i]
                    i += 1
                if masked:
                    masks = extra[i]
                    i += 1
                if dynamic:
                    samp = extra[i]
                    i += 1
                if penalties:
                    counts = extra[i]

                def per_slot(s, t, d, dl, h, r, kk, *xs):
                    j = 0
                    hh = mm = sp = cn = None
                    if nd is not None:
                        hh = xs[j]
                        j += 1
                    if masked:
                        mm = xs[j]
                        j += 1
                    if dynamic:
                        sp = xs[j]
                        j += 1
                    if penalties:
                        cn = xs[j]
                    return one(params, s, t, d, dl, h, r, kk, mm, hh, sp, cn)

                xs = ()
                if nd is not None:
                    xs += (hd,)
                if masked:
                    xs += (masks,)
                if dynamic:
                    xs += (samp,)
                if penalties:
                    xs += (counts,)
                return jax.vmap(per_slot)(
                    state, tokens, drafts, draft_len, halted, remaining,
                    keys, *xs)

            if rounds == 1:
                self._verify_jit[key] = verify_b
                return self._verify_jit[key]

            bsz = self.batch_size
            horizon = ctx_last - (m + 1)  # _finish_horizon, in-scan
            ngram = self.device_ngram

            @partial(jax.jit, donate_argnums=(1,))
            def verify_rounds(params, state, tokens, halted, remaining,
                              produced, seeds, *extra):
                # extras in order: hist [B, C] + hlen [B] when device_ngram,
                # samp [B, 6] when dynamic, counts [B, V] when penalties
                # (all carried through the scan)
                i = 0
                hist0 = hlen0 = jnp.zeros((), jnp.int32)
                if ngram:
                    hist0, hlen0 = extra[i], extra[i + 1]
                    i += 2
                samp = extra[i] if dynamic else None
                if dynamic:
                    i += 1
                counts0 = extra[i] if penalties else jnp.zeros((), jnp.int32)
                zero_d = jnp.zeros((bsz, m), jnp.int32)
                zero_l = jnp.zeros((bsz,), jnp.int32)

                def round_active(carry, _):
                    (state, tokens, halted, remaining, produced, counts,
                     hist, hlen) = carry
                    halted = halted | (state["pos"] >= horizon)
                    # the host key schedule (_spec_keys), rebuilt in-scan:
                    # row i samples the slot's (produced + i)-th token
                    keys = jnp.stack([
                        jnp.broadcast_to(seeds[:, None], (bsz, m + 1)),
                        (produced[:, None]
                         + jnp.arange(m + 1, dtype=jnp.int32)
                         ).astype(jnp.uint32),
                    ], axis=-1)
                    budget = jnp.maximum(remaining - 1, 0).astype(jnp.int32)
                    if ngram:
                        from ..ops.ngram import ngram_propose

                        drafts, dlen = jax.vmap(
                            lambda hb, hl: ngram_propose(hb, hl, m))(
                            hist, hlen)
                        dlen = jnp.minimum(dlen, budget)
                    else:
                        drafts, dlen = zero_d, zero_l
                    proposed = jnp.where(
                        halted, 0,
                        dlen if ngram
                        else jnp.minimum(jnp.asarray(m, jnp.int32), budget))

                    def per_slot(s, t, d, dl, h, r, kk, *xs):
                        j = 0
                        sp = cn = None
                        if dynamic:
                            sp = xs[j]
                            j += 1
                        if penalties:
                            cn = xs[j]
                        return one(params, s, t, d, dl, h, r,
                                   kk, None, jnp.asarray(False), sp, cn)

                    xs = ()
                    if dynamic:
                        xs += (samp,)
                    if penalties:
                        xs += (counts,)
                    out = jax.vmap(per_slot)(
                        state, tokens, drafts, dlen, halted, remaining,
                        keys, *xs)
                    state, tokens, halted, remaining, sampled, commit = out[:6]
                    if penalties:
                        counts = out[6]
                    if ngram:
                        hist = jax.vmap(
                            lambda hb, s_row, hl:
                            jax.lax.dynamic_update_slice(hb, s_row, (hl,)))(
                            hist, sampled, hlen)
                        hlen = hlen + commit
                    produced = produced + commit
                    return ((state, tokens, halted, remaining, produced,
                             counts, hist, hlen),
                            (sampled, commit, proposed, jnp.asarray(True)))

                def round_body(carry, x):
                    all_halted = jnp.all(carry[2] | (carry[0]["pos"]
                                                     >= horizon))
                    return jax.lax.cond(
                        all_halted,
                        lambda c, _: (c, (jnp.zeros((bsz, m + 1), jnp.int32),
                                          jnp.zeros((bsz,), jnp.int32),
                                          jnp.zeros((bsz,), jnp.int32),
                                          jnp.asarray(False))),
                        round_active, carry, x)

                init = (state, tokens, halted, remaining, produced, counts0,
                        hist0, hlen0)
                carry, ys = jax.lax.scan(round_body, init, None, length=rounds)
                state, tokens, halted, remaining, produced, counts = carry[:6]
                out = (state, tokens, halted, remaining, produced) + ys
                if penalties:
                    out += (counts,)
                return out

            self._verify_jit[key] = verify_rounds
        return self._verify_jit[key]

    # -- scheduling ---------------------------------------------------------

    def _finish_admission(self, slot_i, req, first):
        super()._finish_admission(slot_i, req, first)
        self._new_slot_spec(slot_i)


    def _verify_round(self):
        m = self.draft_block
        self._fetch_first_tokens()
        self._finish_horizon(m)
        if not self.num_active:
            return
        if self.spec_rounds > 1 and not any(
            not s.free and (s.request.grammar is not None
                            or s.request.logprobs)
            for s in self.slots
        ):
            return self._verify_round_fused(m)
        drafts, draft_len, tracked, masks, host_draft = self._build_drafts(m)
        keys = self._spec_keys(tracked, m)
        max_pos = max((s.pos for s in self.slots if not s.free), default=0)
        # grow the batched KV capacity before the round (see BatchEngine
        # _ensure_ctx; the verify advances <= m+1 positions per round)
        self._ensure_ctx(max_pos + 2 * (m + 2))
        dynamic = self._dynamic_now()
        penalties = self._penalized_now()
        n_lp = max((s.request.logprobs for s in self.slots if not s.free),
                   default=0)
        verify = self._verify_fn(m, self.lm._ctx_bucket(max_pos + m + 2),
                                 masked=masks is not None, dynamic=dynamic,
                                 logprobs=n_lp, penalties=penalties)
        extra = ()
        if self.draft_layers is not None:
            extra += (jnp.asarray(host_draft),)
        if masks is not None:
            extra += (jnp.asarray(masks),)
        if dynamic:
            extra += (jnp.asarray(self._samp),)
        if penalties:
            extra += (self._ensure_counts(),)
        (self._state, self._tokens, self._halted, self._remaining,
         sampled, commit, *rest) = verify(
            self.lm.params, self._state, self._tokens, jnp.asarray(drafts),
            jnp.asarray(draft_len), self._halted, self._remaining,
            jnp.asarray(keys), *extra,
        )
        if penalties:
            self._counts = rest[0]
            rest = rest[1:]
        vals, commits, lp_pack = jax.device_get(
            (sampled, commit, tuple(rest) or None))
        self._route_round(tracked, np.asarray(vals), commits, draft_len,
                          lp_pack)

    def _verify_round_fused(self, m):
        """R whole rounds in ONE dispatch (spec_rounds > 1): the scan form
        of _verify_round for the all-device configuration — self-drafts
        only, no grammar masks or logprob fetches in flight. Streams are
        identical to the per-round path (same per-slot `one` body, same
        produced-count key schedule, rebuilt in-scan)."""
        rounds = self.spec_rounds
        tracked = {b: s.request for b, s in enumerate(self.slots)
                   if not s.free}
        max_pos = max((s.pos for s in self.slots if not s.free), default=0)
        # capacity for the worst case: R rounds x (m+1) rows each
        self._ensure_ctx(max_pos + (rounds + 1) * (m + 2))
        dynamic = self._dynamic_now()
        penalties = self._penalized_now()
        verify = self._verify_fn(
            m, self.lm._ctx_bucket(max_pos + rounds * (m + 1) + 1),
            dynamic=dynamic, penalties=penalties, rounds=rounds)
        seeds = np.asarray(
            [self._seeds[b] & 0xFFFFFFFF for b in range(self.batch_size)],
            np.uint32)
        produced = np.asarray(
            [0 if s.free else s.produced for s in self.slots], np.int32)
        extra = ()
        if self.device_ngram:
            extra += self._ngram_hist(m, rounds)
        if dynamic:
            extra += (jnp.asarray(self._samp),)
        if penalties:
            extra += (self._ensure_counts(),)
        (self._state, self._tokens, self._halted, self._remaining, _,
         sampled_r, commit_r, prop_r, active_r, *rest) = verify(
            self.lm.params, self._state, self._tokens, self._halted,
            self._remaining, jnp.asarray(produced), jnp.asarray(seeds),
            *extra,
        )
        if penalties:
            self._counts = rest[0]
        vals, commits, props, actives = jax.device_get(
            (sampled_r, commit_r, prop_r, active_r))
        vals = np.asarray(vals)
        for r in range(rounds):
            if not actives[r]:
                break
            self._route_round(tracked, vals[r], commits[r], props[r])


class SpeculativePagedBatchEngine(_SpecScheduling, PagedBatchEngine):
    """Chain speculation over the PAGED engine: the same per-slot drafts
    verified by ONE batched multi-row forward straight into the page pools
    (paged_verify_step). Rollback is the paged layout's pos-visibility
    contract: positions advance by the accepted length and rejected rows
    stay invisible behind lengths until the next round overwrites them in
    place. Recompute preemption stays lossless under sampling thanks to the
    produced-count key schedule (module docstring)."""

    supports_grammar = True
    supports_count_penalties = True

    def __init__(self, lm, *, draft_block: int = 8, make_speculator=None,
                 draft_layers: int | None = None, spec_rounds: int = 1,
                 device_ngram: bool = False, ngram_window: int = 512, **kw):
        _check_spec_rounds(spec_rounds, draft_layers, device_ngram)
        super().__init__(lm, **kw)
        self._init_spec(lm, draft_block, make_speculator, draft_layers)
        self.spec_rounds = spec_rounds
        self.device_ngram = device_ngram
        self.ngram_window = ngram_window

    def _verify_fn(self, m: int, ctx_pages: int, masked: bool = False,
                   dynamic: bool = False, logprobs: int = 0,
                   penalties: bool = False, rounds: int = 1):
        assert not penalties or dynamic
        assert rounds == 1 or ((self.draft_layers is not None
                                or self.device_ngram)
                               and not masked and not logprobs)
        key = ("spec_verify", m, self.sampling, self.stop_ids, self._geom,
               ctx_pages, self.draft_layers, masked, dynamic, logprobs,
               penalties, rounds, self.device_ngram and rounds > 1)
        if key not in self._jit:
            from ..models.paged_decode import paged_decode_step, paged_verify_step

            cfg = self.lm.decoder_config
            sampling = self.sampling
            stop_arr = jnp.asarray(self.stop_ids, jnp.int32) if self.stop_ids else None
            max_pos = self.lm.max_context - 1
            nd = self.draft_layers
            draft_cfg = self._draft_cfg if nd is not None else None

            def core(params, pools, tokens, drafts, draft_len, positions,
                     halted, remaining, tables_s, keys, hd, masks_in,
                     samp_rows, counts):
                b = tokens.shape[0]
                if nd is not None:
                    # device-side self-draft over a functional VIEW of the
                    # first nd layers' pools; chain writes are discarded —
                    # verify rewrites the identical rows
                    dparams = dict(params)
                    dparams["layers"] = list(params["layers"][:nd])
                    dpools = pools[:nd]

                    def dstep(carry, _):
                        dp, t, pos = carry
                        dlogits, dp = paged_decode_step(
                            draft_cfg, dparams, dp, t, tables_s[:, :-1], pos)
                        nt = jnp.argmax(dlogits, axis=-1).astype(jnp.int32)
                        nt = jnp.where(halted, t, nt)
                        return (dp, nt, pos + 1), nt

                    _, drafts_t = jax.lax.scan(
                        dstep, (dpools, tokens, positions), None, length=m)
                    self_drafts = jnp.swapaxes(drafts_t, 0, 1)  # [B, m]
                    # budget-clip the device acceptance window (metrics
                    # honesty; commit was already budget-clipped)
                    dev_len = jnp.minimum(
                        jnp.full((b,), m, jnp.int32),
                        jnp.maximum(remaining - 1, 0).astype(jnp.int32))
                    drafts = jnp.where(hd[:, None], drafts, self_drafts)
                    draft_len = jnp.where(hd, draft_len, dev_len)

                blk = jnp.concatenate([tokens[:, None], drafts], axis=1)
                logits, pools = paged_verify_step(
                    cfg, params, pools, blk, tables_s, positions, ~halted,
                    ctx_pages,
                )
                sampled_from = logits
                if penalties:
                    # row i's counts = base + the chain prefix blk[1..i]
                    # one-hots (exact under cumulative acceptance — see the
                    # dense engine's _verify_fn docstring); raw logits keep
                    # feeding the logprob report like the plain decode scan
                    v = logits.shape[-1]
                    oh = jax.nn.one_hot(blk[:, 1:], v, dtype=jnp.int32)
                    chain = jnp.concatenate(
                        [jnp.zeros((b, 1, v), jnp.int32),
                         jnp.cumsum(oh, axis=1)], axis=1)  # [B, m+1, V]
                    sampled_from = apply_count_penalties(
                        logits.astype(jnp.float32),
                        counts[:, None, :] + chain,
                        samp_rows[:, 4][:, None, None],
                        samp_rows[:, 5][:, None, None])
                def slot_rows(l_rows, k_rows, m_rows, sp):
                    def row(l, kk, mm):
                        if dynamic:
                            return sample_dynamic(
                                l, sp[0], sp[1].astype(jnp.int32), sp[2],
                                sp[3], kk, bitmask=mm,
                                banned_tokens=sampling.banned_tokens,
                            )
                        return sample(l, sampling, key=kk, bitmask=mm)

                    if m_rows is None:
                        return jax.vmap(lambda l, kk: row(l, kk, None))(
                            l_rows, k_rows)
                    return jax.vmap(row)(l_rows, k_rows, m_rows)

                if masked:
                    sampled = jax.vmap(slot_rows)(
                        sampled_from, keys, masks_in, samp_rows)  # [B, m+1]
                else:
                    sampled = jax.vmap(
                        lambda l_rows, k_rows, sp: slot_rows(
                            l_rows, k_rows, None, sp)
                    )(sampled_from, keys, samp_rows)  # [B, m+1]
                match = (sampled[:, :-1] == blk[:, 1:]) & (
                    jnp.arange(m)[None, :] < draft_len[:, None]
                )
                accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)
                emit_len = 1 + accepted
                commit = emit_len
                rows = jnp.arange(m + 1)[None, :]
                if stop_arr is not None:
                    is_stop = jnp.any(
                        sampled[:, :, None] == stop_arr[None, None, :], axis=2)
                    first_stop = jnp.min(
                        jnp.where(is_stop & (rows < emit_len[:, None]), rows, m + 1),
                        axis=1,
                    )
                    commit = jnp.minimum(commit, first_stop + 1)
                commit = jnp.minimum(commit, remaining)
                commit = jnp.where(halted, 0, commit)
                nxt = jnp.take_along_axis(
                    sampled, jnp.maximum(commit - 1, 0)[:, None], axis=1)[:, 0]
                nxt = jnp.where(halted, tokens, nxt)
                positions = positions + commit
                remaining = remaining - commit
                stopped = jnp.zeros((b,), bool)
                if stop_arr is not None:
                    stopped = jnp.any(is_stop & (rows < commit[:, None]), axis=1)
                halted = halted | stopped | (remaining <= 0) | (positions >= max_pos)
                out = (pools, nxt, positions, halted, remaining, sampled, commit)
                if penalties:
                    v = logits.shape[-1]
                    committed = jax.nn.one_hot(sampled, v, dtype=jnp.int32) \
                        * (rows < commit[:, None])[:, :, None]
                    out += (counts + jnp.sum(committed, axis=1),)
                if logprobs:
                    lp_rows = jax.nn.log_softmax(logits.astype(jnp.float32))
                    top_v, top_i = jax.lax.top_k(lp_rows, logprobs)
                    tok_lp = jnp.take_along_axis(
                        lp_rows, sampled[:, :, None], axis=2)[:, :, 0]
                    out += (tok_lp, top_v, top_i)
                return out

            @partial(jax.jit, donate_argnums=(1,))
            def verify(params, pools, tokens, drafts, draft_len, positions,
                       halted, remaining, tables_s, keys, *extra):
                # extras in order: hd [B] when draft_layers (own cheap lane
                # — an unengaged grammar trigger must not force a V-wide
                # all-ones mask upload), masks when masked, samp when
                # dynamic, counts [B, V] when penalties
                b = tokens.shape[0]
                i = 0
                hd = masks_in = counts = None
                if nd is not None:
                    hd = extra[i]
                    i += 1
                if masked:
                    masks_in = extra[i]
                    i += 1
                samp_rows = (extra[i] if dynamic
                             else jnp.zeros((b, 6), jnp.float32))
                if dynamic:
                    i += 1
                if penalties:
                    counts = extra[i]
                return core(params, pools, tokens, drafts, draft_len,
                            positions, halted, remaining, tables_s, keys,
                            hd, masks_in, samp_rows, counts)

            if rounds == 1:
                self._jit[key] = verify
                return self._jit[key]

            horizon = self.lm.max_context - (m + 2)  # _finish_horizon
            ngram = self.device_ngram

            @partial(jax.jit, donate_argnums=(1,))
            def verify_rounds(params, pools, tokens, positions, halted,
                              remaining, produced, seeds, tables_s, *extra):
                # fused R rounds over STATIC tables (pages pre-ensured for
                # the worst case by the host); extras: hist [B, C] + hlen
                # [B] when device_ngram, samp [B, 6] when dynamic, counts
                # [B, V] when penalties
                i = 0
                hist0 = hlen0 = jnp.zeros((), jnp.int32)
                if ngram:
                    hist0, hlen0 = extra[i], extra[i + 1]
                    i += 2
                samp = extra[i] if dynamic else None
                if dynamic:
                    i += 1
                counts0 = extra[i] if penalties else jnp.zeros((), jnp.int32)
                b = tokens.shape[0]
                zero_d = jnp.zeros((b, m), jnp.int32)
                zero_l = jnp.zeros((b,), jnp.int32)
                hd_off = jnp.zeros((b,), bool)

                def round_active(carry, _):
                    (pools, tokens, positions, halted, remaining, produced,
                     counts, hist, hlen) = carry
                    halted = halted | (positions >= horizon)
                    keys = jnp.stack([
                        jnp.broadcast_to(seeds[:, None], (b, m + 1)),
                        (produced[:, None]
                         + jnp.arange(m + 1, dtype=jnp.int32)
                         ).astype(jnp.uint32),
                    ], axis=-1)
                    budget = jnp.maximum(remaining - 1, 0).astype(jnp.int32)
                    if ngram:
                        from ..ops.ngram import ngram_propose

                        drafts, dlen = jax.vmap(
                            lambda hb, hl: ngram_propose(hb, hl, m))(
                            hist, hlen)
                        dlen = jnp.minimum(dlen, budget)
                    else:
                        drafts, dlen = zero_d, zero_l
                    proposed = jnp.where(
                        halted, 0,
                        dlen if ngram
                        else jnp.minimum(jnp.asarray(m, jnp.int32), budget))
                    samp_rows = (samp if dynamic
                                 else jnp.zeros((b, 6), jnp.float32))
                    out = core(params, pools, tokens, drafts, dlen,
                               positions, halted, remaining, tables_s, keys,
                               hd_off, None, samp_rows,
                               counts if penalties else None)
                    (pools, tokens, positions, halted, remaining, sampled,
                     commit) = out[:7]
                    if penalties:
                        counts = out[7]
                    if ngram:
                        hist = jax.vmap(
                            lambda hb, s_row, hl:
                            jax.lax.dynamic_update_slice(hb, s_row, (hl,)))(
                            hist, sampled, hlen)
                        hlen = hlen + commit
                    produced = produced + commit
                    return ((pools, tokens, positions, halted, remaining,
                             produced, counts, hist, hlen),
                            (sampled, commit, proposed, jnp.asarray(True)))

                def round_body(carry, x):
                    all_halted = jnp.all(carry[3] | (carry[2] >= horizon))
                    return jax.lax.cond(
                        all_halted,
                        lambda c, _: (c, (jnp.zeros((b, m + 1), jnp.int32),
                                          jnp.zeros((b,), jnp.int32),
                                          jnp.zeros((b,), jnp.int32),
                                          jnp.asarray(False))),
                        round_active, carry, x)

                init = (pools, tokens, positions, halted, remaining,
                        produced, counts0, hist0, hlen0)
                carry, ys = jax.lax.scan(round_body, init, None,
                                         length=rounds)
                pools, tokens, positions, halted, remaining, produced, \
                    counts = carry[:7]
                out = (pools, tokens, positions, halted, remaining) + ys
                if penalties:
                    out += (counts,)
                return out

            self._jit[key] = verify_rounds
        return self._jit[key]

    # admission bookkeeping: per-slot speculator instances
    def _admit_advance(self) -> bool:
        done_before = self._admitting
        out = super()._admit_advance()
        if self._admitting is None and done_before is not None:
            self._new_slot_spec(done_before[2])
        return out

    def _ensure_verify_pages(self, rows: int):
        """Page growth for `rows` upcoming verify rows per slot, with the
        decode path's preemption/backpressure discipline."""
        for i, slot in enumerate(self.slots):
            while not slot.free:
                want = min(slot.pos + rows, self.lm.max_context)
                try:
                    self.pool.ensure(i, want)
                    break
                except PagePoolOverflow:
                    # prefix cache yields first, sized to the REAL shortfall
                    short = (-(-want // self.page_size)
                             - len(self.pool.pages(i)))
                    if self._evict_retired(short):
                        continue
                    live = [j for j in self._admit_order if not self.slots[j].free]
                    youngest = max(live, key=self._admit_order.__getitem__)
                    if youngest == i and len(live) == 1:
                        self._finish(i, "length")
                    else:
                        self._preempt(youngest)

    def _verify_round(self):
        m = self.draft_block
        self._fetch_first_tokens()
        self._finish_horizon(m)
        if not self.num_active:
            return
        if self.spec_rounds > 1 and not any(
            not s.free and (s.request.grammar is not None
                            or s.request.logprobs)
            for s in self.slots
        ):
            return self._verify_round_fused(m)
        # page growth for the m+1 verify rows (+1 margin)
        self._ensure_verify_pages(m + 2)
        if not self.num_active:
            return
        drafts, draft_len, tracked, masks, host_draft = self._build_drafts(m)
        keys = self._spec_keys(tracked, m)
        tables = self._tables_host()
        tables_s = np.concatenate(
            [tables, np.full((self.batch_size, 1), self._trash_page, np.int32)],
            axis=1,
        )
        max_pos = max((s.pos for s in self.slots if not s.free), default=0)
        dynamic = self._dynamic_now()
        penalties = self._penalized_now()
        n_lp = max((s.request.logprobs for s in self.slots if not s.free),
                   default=0)
        verify = self._verify_fn(m, self._ctx_pages(max_pos + m + 2),
                                 masked=masks is not None, dynamic=dynamic,
                                 logprobs=n_lp, penalties=penalties)
        extra = ()
        if self.draft_layers is not None:
            extra += (jnp.asarray(host_draft),)
        if masks is not None:
            extra += (jnp.asarray(masks),)
        if dynamic:
            extra += (jnp.asarray(self._samp),)
        if penalties:
            extra += (self._ensure_counts(),)
        (self.pools, self._tokens, self._positions, self._halted,
         self._remaining, sampled, commit, *rest) = verify(
            self.lm.params, self.pools, self._tokens, jnp.asarray(drafts),
            jnp.asarray(draft_len), self._positions, self._halted,
            self._remaining, jnp.asarray(tables_s), jnp.asarray(keys), *extra,
        )
        if penalties:
            self._counts = rest[0]
            rest = rest[1:]
        vals, commits, lp_pack = jax.device_get(
            (sampled, commit, tuple(rest) or None))
        self._route_round(tracked, np.asarray(vals), commits, draft_len,
                          lp_pack)

    def _verify_round_fused(self, m):
        """R whole rounds in one dispatch over the page pools
        (spec_rounds > 1): pages are pre-ensured for the R-round worst
        case so the tables stay static across the scan; preemption /
        prefix-cache eviction keep the decode path's discipline at the
        (larger) reservation. Streams identical to per-round (same core,
        same in-scan produced-count key schedule)."""
        rounds = self.spec_rounds
        self._ensure_verify_pages(rounds * (m + 1) + 2)
        if not self.num_active:
            return
        tracked = {b: s.request for b, s in enumerate(self.slots)
                   if not s.free}
        tables = self._tables_host()
        tables_s = np.concatenate(
            [tables, np.full((self.batch_size, 1), self._trash_page,
                             np.int32)], axis=1)
        max_pos = max((s.pos for s in self.slots if not s.free), default=0)
        dynamic = self._dynamic_now()
        penalties = self._penalized_now()
        verify = self._verify_fn(
            m, self._ctx_pages(max_pos + rounds * (m + 1) + 2),
            dynamic=dynamic, penalties=penalties, rounds=rounds)
        seeds = np.asarray(
            [self._seeds[b] & 0xFFFFFFFF for b in range(self.batch_size)],
            np.uint32)
        produced = np.asarray(
            [0 if s.free else s.produced for s in self.slots], np.int32)
        extra = ()
        if self.device_ngram:
            extra += self._ngram_hist(m, rounds)
        if dynamic:
            extra += (jnp.asarray(self._samp),)
        if penalties:
            extra += (self._ensure_counts(),)
        (self.pools, self._tokens, self._positions, self._halted,
         self._remaining, sampled_r, commit_r, prop_r, active_r,
         *rest) = verify(
            self.lm.params, self.pools, self._tokens, self._positions,
            self._halted, self._remaining, jnp.asarray(produced),
            jnp.asarray(seeds), jnp.asarray(tables_s), *extra,
        )
        if penalties:
            self._counts = rest[0]
        vals, commits, props, actives = jax.device_get(
            (sampled_r, commit_r, prop_r, active_r))
        vals = np.asarray(vals)
        for r in range(rounds):
            if not actives[r]:
                break
            self._route_round(tracked, vals[r], commits[r], props[r])

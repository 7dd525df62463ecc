"""Continuous batching: multi-request serving on one model.

No reference counterpart — trymirai/uzu serves one request at a time per
LanguageModelState (SURVEY.md §2.7); this is the from-scratch TPU design
that replaces its single-session server loop.

Design (XLA static shapes throughout):
- the engine owns B slots; the batched decoding state is the per-slot state
  stacked on a leading batch dim (KV [B, C, G, Dh], pos [B]);
- decode runs as ONE dispatch of K fused steps vmapped over slots, with a
  per-slot halt flag: finished/empty slots take identity transitions
  (true_length=0 — pos frozen, KV writes land in the masked slot at pos),
  so ragged completion needs no recompilation;
- a new request is prefilled into a fresh single-sequence state with the
  ordinary chunked prefill, then inserted into its slot with one donated
  at[i].set dispatch — the TPU analogue of paged-KV slot assignment
  (pages = whole-slot caches at this milestone);
- the host scheduler interleaves: admit pending requests into free slots
  (prefill + insert), then run decode chunks for active slots, routing the
  fetched [K, B] token matrix to per-request output queues.

Greedy/sampled outputs are bit-identical to single-request generation (the
batched math is the same vmapped computation; tests pin this).
"""

from __future__ import annotations

import dataclasses
import itertools
import time
from collections import deque
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import decoder_forward
from .engine import LanguageModel, StreamMetrics
from .sampling import SamplingParams, pack_dynamic, sample, sample_dynamic


@dataclasses.dataclass
class Request:
    id: int
    prompt: list[int]
    max_new_tokens: int
    seed: int = 0
    # optional grammar constraint (a grammar.GrammarSession); only the
    # speculative engines support it — their synchronous rounds give the
    # host a natural point to compute per-row lookahead masks (the batched
    # analogue of the reference's per-step bitmask fill, stream.rs:632-675)
    grammar: Optional[object] = None
    # optional per-REQUEST sampling override (OpenAI requests each carry
    # their own temperature/top_k/top_p/min_p): the step switches to the
    # dynamic-sampling executable while any active slot overrides — one
    # executable serves every parameter combination (sampling.sample_dynamic
    # is pinned token-exact against the static pipeline)
    sampling: Optional[SamplingParams] = None
    # OpenAI logprobs: number of top alternatives to report per emitted
    # token (0 = off). Logprobs are log-softmax of the RAW model logits
    # (pre-temperature/masking), the convention OpenAI-compatible servers
    # use. Filled as [(token_logprob, [(alt_id, alt_logprob), ...]), ...]
    logprobs: int = 0
    logprob_content: list = dataclasses.field(default_factory=list)
    # OpenAI presence/frequency penalties over the request's GENERATED
    # token counts (all batch engines: the counts live in a per-slot [V]
    # device row updated inside the fused step / verify)
    presence_penalty: float = 0.0
    frequency_penalty: float = 0.0
    # filled by the engine:
    tokens: list[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    finish_reason: str = ""
    preempted: int = 0  # times evicted for recompute (paged engine)
    submitted_at: float = 0.0
    first_token_at: float = 0.0
    finished_at: float = 0.0

    @property
    def ttft(self) -> float:
        return self.first_token_at - self.submitted_at if self.first_token_at else 0.0


@dataclasses.dataclass
class _Slot:
    request: Optional[Request] = None
    produced: int = 0
    pos: int = 0  # host mirror of device pos
    # first token of a freshly admitted request, still on device: fetched
    # together with the next chunk's tokens (one roundtrip), so admission
    # never blocks the host
    pending_first: Optional[jax.Array] = None

    @property
    def free(self) -> bool:
        return self.request is None


class BatchEngine:
    #: grammar-constrained requests need per-round host masks; the fused
    #: K-step chunk engines reject them (use the speculative engines)
    supports_grammar = False
    #: presence/frequency penalties thread per-slot count rows through the
    #: fused chunk (plain engines) or chain-cumulative per-row counts
    #: through the verify (speculative engines); every shipped engine
    #: supports them — the flag guards future engines that cannot
    supports_count_penalties = True

    def __init__(
        self,
        lm: LanguageModel,
        *,
        batch_size: int = 4,
        decode_chunk: int = 8,
        sampling: SamplingParams | None = None,
        stop_token_ids=None,
        prefix_min: int = 64,
        admit_greedy: bool = True,
    ):
        """prefix_min: shortest shared prompt prefix worth admitting via the
        KV-copy path (below it the copy dispatch costs more than the saved
        prefill; 0 disables sharing).
        admit_greedy: fill every free slot before dispatching a decode chunk
        (throughput-optimal; live-stream stall grows with backlog depth x
        prompt length — see step()); False restores the one-admission-per-
        cycle interleave (minimum jitter for live streams)."""
        self.lm = lm
        self.batch_size = batch_size
        self.decode_chunk = decode_chunk
        self.admit_greedy = admit_greedy
        if lm.mesh is not None:
            from ..parallel.mesh import dp_size

            if batch_size % dp_size(lm.mesh):
                raise ValueError(
                    f"batch_size={batch_size} must be a multiple of the mesh's "
                    f"dp={dp_size(lm.mesh)} (slots shard over dp)"
                )
        self.sampling = sampling or SamplingParams()
        self.stop_ids = tuple(
            sorted(
                stop_token_ids
                if stop_token_ids is not None
                else lm.config.generation_config.stop_token_ids
            )
        )
        self.slots = [_Slot() for _ in range(batch_size)]
        self.queue: deque[Request] = deque()
        self._ids = itertools.count()
        # KV capacity starts at one ctx bucket and GROWS on crossing (r4):
        # a max_context-sized batched cache measured +3.5 ms per B=4 step
        # over a right-sized one at identical read buckets (CHIP_JOBS_r4
        # batch_step 82.7 -> 138.5 ms per fused chunk at 8k max_context).
        # ring_windows layouts are position-modulo and cannot be row-copied
        # across capacities, so they pin capacity at max_context.
        self._ctx_cap = (lm.max_context if lm.ring_windows
                         else (lm._ctx_bucket(1) or lm.max_context))
        self._state = lm.new_state(batch_size=batch_size,
                                   ctx_capacity=self._ctx_cap)
        self._tokens = jnp.zeros((batch_size,), jnp.int32)  # next input per slot
        self._halted = jnp.ones((batch_size,), bool)  # empty slots are halted
        # per-slot device-side token budget: lets the scheduler keep a decode
        # chunk IN FLIGHT while the previous chunk's tokens are still being
        # fetched (pipelining) — a slot halts itself at budget/context end,
        # so an overrun chunk can never produce extra state transitions
        self._remaining = jnp.zeros((batch_size,), jnp.int32)
        self._pending = None  # (emitted array [K, B], snapshot {slot: req})
        # in-progress LONG-prompt admission: [req, fresh_state, consumed,
        # slot_i]. Long prefills advance ONE chunk per scheduler step,
        # interleaved with decode chunks, so admitting a max_context prompt
        # never stalls active streams (head-of-line blocking fix); the slot
        # is reserved but stays halted until the insert.
        self._admitting = None
        # executable caches live on the model so engines are cheap to build
        self._decode_jit = lm.__dict__.setdefault("_batch_decode_jit", {})
        self._insert_cache = lm.__dict__.setdefault("_batch_insert_jit", {})
        self._seeds = np.zeros(batch_size, np.int64)
        self._steps = np.zeros(batch_size, np.int64)
        # per-slot dynamic sampling parameters (engine default everywhere
        # until a request overrides); _samp_custom tracks which slots do
        self._samp = np.tile(np.asarray(pack_dynamic(self.sampling), np.float32),
                             (batch_size, 1))
        self._samp_custom = np.zeros(batch_size, bool)
        from ..config.model import AttentionConfig

        # shared-prefix admission (the dense counterpart of the paged
        # engine's page sharing): attention-only full-layout caches ONLY —
        # a recurrent mixer's state cannot be sliced at an arbitrary prefix
        # length, and ring windows don't map slot j to position j
        self.prefix_min = prefix_min if (
            not lm.ring_windows
            and all(isinstance(lc.mixer_config, AttentionConfig)
                    for lc in lm.decoder_config.transformer_config.layer_configs)
        ) else 0

    def _set_slot_sampling(self, slot_i: int, req: "Request") -> None:
        sp = req.sampling if req.sampling is not None else self.sampling
        row = np.asarray(pack_dynamic(sp), np.float32)
        row[4] = req.presence_penalty
        row[5] = req.frequency_penalty
        self._samp[slot_i] = row
        self._samp_custom[slot_i] = (req.sampling is not None
                                     or row[4] != 0.0 or row[5] != 0.0)

    def _penalized_now(self) -> bool:
        return any(
            (self._samp[b, 4] != 0.0 or self._samp[b, 5] != 0.0)
            for b, s in enumerate(self.slots) if not s.free
        )

    def _ensure_counts(self):
        """Lazy per-slot generated-token count rows [B, V] (4 MB at vocab
        128k, B=8 — allocated only once a penalized request arrives)."""
        if getattr(self, "_counts", None) is None:
            self._counts = jnp.zeros(
                (self.batch_size, self.lm.decoder_config.vocab_size),
                jnp.int32)
        return self._counts

    def _note_admission_counts(self, slot_i: int, req: "Request", first):
        """Zero the admitted slot's count row and count its FIRST token (the
        decode scan counts only tokens it samples itself)."""
        if req.presence_penalty == 0.0 and req.frequency_penalty == 0.0:
            return
        self._ensure_counts()
        tok = first[0] if isinstance(first, tuple) else first
        cache = self.lm.__dict__.setdefault("_batch_counts_jit", {})
        if "admit" not in cache:

            @partial(jax.jit, donate_argnums=(0,))
            def reset(counts, slot_i, tok):
                row = jnp.zeros((counts.shape[1],), jnp.int32).at[tok].set(1)
                return jax.lax.dynamic_update_index_in_dim(
                    counts, row, slot_i, 0)

            cache["admit"] = reset
        self._counts = cache["admit"](self._counts, np.int32(slot_i),
                                      jnp.asarray(tok, jnp.int32))

    def _dynamic_now(self) -> bool:
        return any(self._samp_custom[b] for b, s in enumerate(self.slots)
                   if not s.free)

    def _check_sampling_override(self, sampling: SamplingParams | None) -> None:
        """Reject overrides of fields the dynamic path cannot honor —
        compared against the ENGINE DEFAULT, not truthiness: a server
        default that itself carries banned_tokens/repetition_penalty (the
        documented place for them) flows through every request unchanged."""
        if sampling is None:
            return
        if sampling.repetition_penalty != self.sampling.repetition_penalty:
            raise ValueError(
                "per-request repetition_penalty is not supported in batched "
                "serving (no per-slot recent-token ring)")
        if tuple(sampling.banned_tokens) != tuple(self.sampling.banned_tokens):
            raise ValueError(
                "per-request banned_tokens is not supported in batched "
                "serving (set it on the engine's default SamplingParams)")

    # -- jitted pieces -----------------------------------------------------

    def _ensure_ctx(self, needed: int) -> None:
        """Grow the batched KV capacity to the ctx bucket covering `needed`
        positions. One fresh-build + one donated copy per crossing (rare,
        amortized); executables re-specialize per capacity exactly like
        ctx-bucketed reads do."""
        cap = self.lm._ctx_bucket(needed) or self.lm.max_context
        if cap <= self._ctx_cap:
            return
        old_cap, self._ctx_cap = self._ctx_cap, cap
        self._state = self._grown(self._state, cap, batch=True)
        if self._admitting is not None:
            # the in-progress long-prompt admission's single-slot state must
            # insert into the grown batch later: grow it in lockstep
            self._admitting[1] = self._grown(self._admitting[1], cap,
                                             batch=False)

    def _grown(self, state, new_cap: int, *, batch: bool):
        import jax

        fresh = self.lm.new_state(
            batch_size=self.batch_size if batch else 0, ctx_capacity=new_cap)
        axis = 1 if batch else 0
        cache = self.lm.__dict__.setdefault("_state_grow_jit", {})
        if axis not in cache:

            @partial(jax.jit, donate_argnums=(0, 1), static_argnums=(2,))
            def copy(fresh_s, old_s, ax):
                def cp(f, o):
                    if f.shape == o.shape:
                        return o
                    return jax.lax.dynamic_update_slice_in_dim(
                        f, o.astype(f.dtype), 0, axis=ax)

                return jax.tree.map(cp, fresh_s, old_s)

            cache[axis] = copy
        return cache[axis](fresh, state, axis)

    def _insert_fn(self):
        if "fn" not in self._insert_cache:

            @partial(jax.jit, donate_argnums=(0,), static_argnames=("i",))
            def insert(batch_state, slot_state, token, halted, tokens, halted_v,
                       remaining_v, remaining, i):
                new_state = jax.tree.map(
                    lambda b, s: b.at[i].set(s), batch_state, slot_state
                )
                return (
                    new_state,
                    tokens.at[i].set(token),
                    halted_v.at[i].set(halted),
                    remaining_v.at[i].set(remaining),
                )

            self._insert_cache["fn"] = insert
        return self._insert_cache["fn"]

    def _admit_fn(self, bucket: int, ctx_bucket=None, masked: bool = False,
                  dynamic: bool = False, logprobs: int = 0, cap: int = 0):
        """Fused admission: fresh state + prefill chunk + first-token sample
        + slot insert in ONE donated dispatch (the multi-dispatch path costs
        ~50 ms of launch overhead per admission on a remote-tunnel chip).
        Handles prompts up to the largest prefill bucket; longer prompts take
        the chunked fallback path in _admit. `masked` adds a grammar bitmask
        over the first sample and `dynamic` a per-request sampling-parameter
        row (separate cache keys, so default serving keeps its existing
        executables byte-identical)."""
        cap = cap or self.lm.max_context
        key = (self.sampling, bucket, self.batch_size, ctx_bucket, masked,
               dynamic, logprobs, cap)
        cache = self.lm.__dict__.setdefault("_batch_admit_jit", {})
        if key not in cache:
            lm = self.lm
            cfg = lm.decoder_config
            sampling = self.sampling

            @partial(jax.jit, donate_argnums=(1, 2, 3, 4))
            def admit(params, batch_state, tokens_v, halted_v, remaining_v,
                      chunk, true_len, seed, remaining0, slot_i, *extra):
                from ..models.state import init_state

                mask = extra[0] if masked else None
                samp = extra[1 if masked else 0] if dynamic else None
                fresh = init_state(
                    cfg, cap, kv_quant=lm.kv_quant,
                    ring_windows=lm.ring_windows, ring_extra=max(lm.prefill_buckets),
                )
                logits, fresh = decoder_forward(
                    cfg, params, chunk, fresh, last_only=True, true_length=true_len,
                    ctx_limit=ctx_bucket,
                )
                if dynamic:
                    first = sample_dynamic(
                        logits[0], samp[0], samp[1].astype(jnp.int32), samp[2],
                        samp[3], jax.random.PRNGKey(seed), bitmask=mask,
                        banned_tokens=sampling.banned_tokens,
                    )
                else:
                    first = sample(logits[0], sampling,
                                   key=jax.random.PRNGKey(seed), bitmask=mask)

                def put(b, s):
                    return jax.lax.dynamic_update_index_in_dim(
                        b, s.astype(b.dtype), slot_i, axis=0
                    )

                first_pack = (first,)
                if logprobs:
                    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
                    top_v, top_i = jax.lax.top_k(lp, logprobs)
                    first_pack = (first, lp[first], top_v, top_i)
                return (
                    jax.tree.map(put, batch_state, fresh),
                    jax.lax.dynamic_update_index_in_dim(tokens_v, first, slot_i, 0),
                    jax.lax.dynamic_update_index_in_dim(
                        halted_v, jnp.asarray(False), slot_i, 0
                    ),
                    jax.lax.dynamic_update_index_in_dim(remaining_v, remaining0, slot_i, 0),
                    first_pack,
                )

            cache[key] = admit
        return cache[key]

    def _decode_fn(self, k: int, ctx_bucket=None, dynamic: bool = False,
                   logprobs: int = 0, penalties: bool = False):
        """`dynamic` samples with per-slot traced parameters ([B, 6]
        temperature/top_k/top_p/min_p/presence/frequency rows) instead of
        the engine-static SamplingParams — one executable serves every
        request combination. `logprobs` > 0 additionally emits, per step,
        the sampled token's raw-logit log-softmax and the top-`logprobs`
        alternatives. `penalties` threads per-slot generated-token count
        rows [B, V] through the scan (OpenAI presence/frequency)."""
        assert not penalties or dynamic
        key = (self.sampling, k, self.stop_ids, self.batch_size, ctx_bucket,
               dynamic, logprobs, penalties)
        if key not in self._decode_jit:
            from .sampling import apply_count_penalties

            cfg = self.lm.decoder_config
            sampling = self.sampling
            stop_arr = jnp.asarray(self.stop_ids, jnp.int32) if self.stop_ids else None
            ctx_last = self.lm.max_context - 1

            def one_step(params, state, token, halted, remaining, key_t, samp,
                         counts):
                true_length = jnp.where(halted, 0, 1).astype(jnp.int32)
                logits, state = decoder_forward(
                    cfg, params, token.reshape(1), state, last_only=True,
                    true_length=true_length, ctx_limit=ctx_bucket,
                )
                raw = logits[0]
                sampled_from = raw
                if penalties:
                    sampled_from = apply_count_penalties(
                        raw.astype(jnp.float32), counts, samp[4], samp[5])
                if dynamic:
                    nxt = sample_dynamic(
                        sampled_from, samp[0], samp[1].astype(jnp.int32),
                        samp[2], samp[3], key_t,
                        banned_tokens=sampling.banned_tokens,
                    )
                else:
                    nxt = sample(sampled_from, sampling, key=key_t)
                nxt = jnp.where(halted, token, nxt)
                if penalties:
                    counts = counts.at[nxt].add(
                        jnp.where(halted, 0, 1).astype(jnp.int32))
                extra = ()
                if logprobs:
                    lp = jax.nn.log_softmax(raw.astype(jnp.float32))
                    top_v, top_i = jax.lax.top_k(lp, logprobs)
                    extra = (lp[nxt], top_v, top_i)
                remaining = remaining - jnp.where(halted, 0, 1)
                if stop_arr is not None:
                    halted = halted | jnp.any(nxt == stop_arr)
                # device-side budget/context halt mirrors the host's finish
                # conditions so an in-flight chunk can't overrun them
                halted = halted | (remaining <= 0) | (state["pos"] >= ctx_last)
                return (state, nxt, halted, remaining, counts) + extra

            @partial(jax.jit, donate_argnums=(1,))
            def decode_k(params, state, tokens, halted, remaining, keys,
                         *extra_args):
                # *extra_args keeps the static variant's signature (and its
                # cached executable) byte-identical: samp [B, 6] rides along
                # only when dynamic, counts [B, V] only when penalties
                i = 0
                if dynamic:
                    samp = extra_args[i]
                    i += 1
                else:
                    samp = jnp.zeros((tokens.shape[0], 6), jnp.float32)
                counts0 = (extra_args[i] if penalties
                           else jnp.zeros((tokens.shape[0], 1), jnp.int32))

                def body(carry, keys_t):
                    state, tokens, halted, remaining, counts = carry
                    out = jax.vmap(
                        lambda s, t, h, r, kk, sp, cn: one_step(
                            params, s, t, h, r, kk, sp, cn)
                    )(state, tokens, halted, remaining, keys_t, samp, counts)
                    state, tokens, halted, remaining, counts = out[:5]
                    emit = (tokens,) + out[5:]
                    return (state, tokens, halted, remaining, counts), emit

                (state, tokens, halted, remaining, counts), emitted = jax.lax.scan(
                    body, (state, tokens, halted, remaining, counts0), keys
                )
                # emitted: (tokens [K, B][, lp [K, B], top_v/top_i [K, B, n]])
                return state, tokens, halted, remaining, counts, emitted

            self._decode_jit[key] = decode_k
        return self._decode_jit[key]

    # -- public API ---------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int, seed: int = 0,
               grammar=None, sampling: SamplingParams | None = None,
               logprobs: int = 0, presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0) -> Request:
        if not 0 <= logprobs <= 20:
            raise ValueError("logprobs must be in [0, 20]")
        if (presence_penalty or frequency_penalty) and \
                not self.supports_count_penalties:
            raise ValueError(
                "presence/frequency penalties are not supported by this "
                "engine")
        if grammar is not None:
            if not self.supports_grammar:
                raise ValueError(
                    "grammar-constrained requests need per-round masks; use a "
                    "speculative engine (SpeculativeBatchEngine / "
                    "SpeculativePagedBatchEngine, server speculate=...)"
                )
            grammar.stop_token_ids = (
                sorted(self.stop_ids) or grammar.stop_token_ids
            )
        if sampling == self.sampling:
            sampling = None  # engine default: stay on the static executables
        self._check_sampling_override(sampling)
        req = Request(
            id=next(self._ids),
            prompt=[int(t) for t in prompt],
            max_new_tokens=max_new_tokens,
            seed=seed,
            grammar=grammar,
            sampling=sampling,
            logprobs=logprobs,
            presence_penalty=float(presence_penalty),
            frequency_penalty=float(frequency_penalty),
            submitted_at=time.perf_counter(),
        )
        self.queue.append(req)
        return req

    @property
    def num_active(self) -> int:
        return sum(0 if s.free else 1 for s in self.slots)

    def cancel(self, req: Request, reason: str = "cancelled") -> bool:
        """Cancel a queued, admitting, or in-flight request (client
        disconnects, server-side stop sequences). Immediate mid-pipeline
        cancellation is safe: the device executes dispatches in program
        order, so an in-flight chunk's writes to this slot land before any
        later dispatch (admission into a reused slot) executes, and the
        token router drops emissions for finished requests."""
        import time as _time

        if req.finished:
            return False
        if req in self.queue:
            self.queue.remove(req)
            req.finished = True
            req.finish_reason = reason
            req.finished_at = _time.perf_counter()
            return True
        if self._admitting is not None and self._admitting[0] is req:
            self._cancel_admitting()
            req.finished = True
            req.finish_reason = reason
            req.finished_at = _time.perf_counter()
            return True
        for b, slot in enumerate(self.slots):
            if slot.request is req:
                self._finish(b, reason)
                return True
        return False

    def _cancel_admitting(self) -> None:
        self._admitting = None

    def _copy_prefix_fn(self, bucket: int | None):
        """Jitted: fresh single-sequence state whose first L cache rows are
        COPIED from live slot `src` (full layout: slot j == position j, so
        the rows are bit-identical to what the new request's own prefill
        would write — the bucketed-prefill invariance tests pin that), with
        pos = L. The chunked admission then prefills only the tail.
        `bucket` bounds the copied window (the smallest ctx bucket covering
        L): without it the masked copy streams every max_context row of
        every cache — more HBM traffic than the prefill it saves whenever
        L << max_context."""
        cache = self.lm.__dict__.setdefault("_batch_prefix_jit", {})
        cap = self._ctx_cap
        key = (self.batch_size, bucket, cap)
        if key not in cache:
            lm = self.lm
            cfg = lm.decoder_config

            @jax.jit
            def copy(batch_state, src, prefix_len):
                from ..models.state import init_state

                fresh = init_state(
                    cfg, cap, kv_quant=lm.kv_quant,
                    ring_windows=lm.ring_windows,
                    ring_extra=max(lm.prefill_buckets),
                )

                def take(f, b):
                    row = jax.lax.dynamic_index_in_dim(b, src, 0, keepdims=False)
                    win = row if bucket is None else row[:bucket]
                    mask = (jnp.arange(win.shape[0]) < prefix_len).reshape(
                        (-1,) + (1,) * (f.ndim - 1))
                    keep = jnp.where(mask, win.astype(f.dtype),
                                     f[: win.shape[0]])
                    return jax.lax.dynamic_update_slice_in_dim(f, keep, 0, 0)

                fresh["layers"] = jax.tree.map(
                    take, fresh["layers"], batch_state["layers"])
                fresh["pos"] = prefix_len.astype(jnp.int32)
                return fresh

            cache[key] = copy
        return cache[key]

    @staticmethod
    def _common_prefix(hist: list[int], prompt: list[int]) -> int:
        """Shared-prefix length, capped at len(prompt)-1 so the tail
        prefill always feeds >= 1 token (and, in the paged engine, always
        writes AT or past the shared-page boundary). The ONE definition of
        prefix matching for live slots, retired prefix-cache entries, and
        both engines."""
        common = 0
        for a, c in zip(hist, prompt):
            if a != c:
                break
            common += 1
        return min(common, len(prompt) - 1)

    def _best_prefix(self, prompt: list[int]):
        """(src_slot, L): the longest common prefix between the new prompt
        and a live slot's KV-resident history — its prompt plus every
        routed token except the last (the final routed token may not have
        been FED yet, so its cache row is not guaranteed written)."""
        best_b, best_l = None, 0
        for b, s in enumerate(self.slots):
            if s.free:
                continue
            hist = s.request.prompt + s.request.tokens[:-1]
            common = self._common_prefix(hist, prompt)
            if common > best_l:
                best_b, best_l = b, common
        return best_b, best_l

    def _grammar_first_mask(self, req: Request):
        """Bitmask for a grammar request's FIRST sampled token (the
        constrained loop masks the prefill sample too, grammar/decode.py:84);
        None when unconstrained or the grammar trigger has not engaged."""
        if req.grammar is None:
            return None
        m = req.grammar.current_mask()
        if m is None:
            return None
        from ..grammar.decode import _pad_mask

        return _pad_mask(m, self.lm.decoder_config.vocab_size)

    def _admit(self) -> bool:
        """Advance admission by ONE dispatch of work. A short prompt (fits
        the largest prefill bucket) admits in one fused dispatch; a long
        prompt prefills one chunk per call into a reserved slot's fresh
        state and inserts when complete. Returns True if any admission work
        was done — the scheduler interleaves these calls with decode chunks
        so active streams never stall behind a long admission."""
        if self._admitting is not None:
            return self._admit_advance_long()
        if not self.queue:
            return False
        slot_i = next(
            (i for i, s in enumerate(self.slots) if s.free), None
        )
        if slot_i is None:
            return False
        req = self.queue.popleft()

        n = len(req.prompt)
        # capacity before anything touches the batched state this admission
        self._ensure_ctx(n + 2 * self.decode_chunk + 1)
        if self.prefix_min:
            src, pl = self._best_prefix(req.prompt)
            if src is not None and pl >= self.prefix_min:
                # shared-prefix admission: copy the KV rows, prefill only
                # the tail through the chunked path (which also handles
                # the first sample's grammar mask / dynamic sampling /
                # logprobs variants)
                state = self._copy_prefix_fn(self.lm._ctx_bucket(pl))(
                    self._state, np.int32(src), jnp.asarray(pl, jnp.int32))
                self._admitting = [req, state, pl, slot_i]
                return self._admit_advance_long()
        if n > self.lm.prefill_buckets[-1]:
            self._admitting = [req, self.lm.new_state(
                ctx_capacity=self._ctx_cap), 0, slot_i]
            return self._admit_advance_long()
        remaining0 = np.int32(max(0, req.max_new_tokens - 1))
        bucket = next(b for b in self.lm.prefill_buckets if b >= n)
        chunk = np.zeros(bucket, np.int32)
        chunk[:n] = req.prompt
        mask = self._grammar_first_mask(req)
        admit = self._admit_fn(bucket, self.lm._ctx_bucket(bucket),
                               masked=mask is not None,
                               dynamic=req.sampling is not None,
                               logprobs=req.logprobs, cap=self._ctx_cap)
        extra = () if mask is None else (jnp.asarray(mask),)
        if req.sampling is not None:
            extra += (jnp.asarray(pack_dynamic(req.sampling), jnp.float32),)
        (self._state, self._tokens, self._halted, self._remaining,
         first_pack) = admit(
            self.lm.params, self._state, self._tokens, self._halted,
            self._remaining, jnp.asarray(chunk), np.int32(n),
            np.uint32(req.seed), remaining0, np.int32(slot_i), *extra,
        )
        self._finish_admission(
            slot_i, req, first_pack if req.logprobs else first_pack[0])
        return True

    def _admit_advance_long(self) -> bool:
        """One prefill chunk of the in-progress long admission; inserts the
        finished state into its reserved slot on the last chunk."""
        req, state, i, slot_i = self._admitting
        prompt = req.prompt
        n = len(prompt)
        max_chunk = self.lm.prefill_buckets[-1]
        take = min(n - i, max_chunk)
        bucket = next(b for b in self.lm.prefill_buckets if b >= take)
        chunk = np.zeros(bucket, np.int32)
        chunk[:take] = prompt[i : i + take]
        fn = self.lm._prefill_fn(bucket, self.lm._ctx_bucket(i + bucket))
        logits, state = fn(self.lm.params, jnp.asarray(chunk), state,
                           jnp.asarray(take, jnp.int32))
        i += take
        if i < n:
            self._admitting = [req, state, i, slot_i]
            return True
        self._admitting = None
        mask = self._grammar_first_mask(req)
        dyn = req.sampling is not None
        fs = self.lm._first_sample_fn(self.sampling, False,
                                      masked=mask is not None, dynamic=dyn,
                                      logprobs=req.logprobs)
        extra = () if mask is None else (jnp.asarray(mask),)
        if dyn:
            extra += (jnp.asarray(pack_dynamic(req.sampling), jnp.float32),)
        first_pack = fs(logits, np.uint32(req.seed), *extra)
        first = first_pack[0] if req.logprobs else first_pack
        insert = self._insert_fn()
        remaining0 = np.int32(max(0, req.max_new_tokens - 1))
        self._state, self._tokens, self._halted, self._remaining = insert(
            self._state, state, first, jnp.asarray(False),
            self._tokens, self._halted, self._remaining,
            jnp.asarray(remaining0), slot_i,
        )
        self._finish_admission(slot_i, req,
                               first_pack if req.logprobs else first)
        return True

    def _finish_admission(self, slot_i: int, req: Request, first) -> None:
        # no fetch here: the first token rides the next chunk's device_get
        slot = self.slots[slot_i]
        slot.request = req
        slot.produced = 0
        slot.pos = len(req.prompt)
        slot.pending_first = first
        self._seeds[slot_i] = req.seed ^ 0xBA7C
        self._steps[slot_i] = 0
        self._set_slot_sampling(slot_i, req)
        self._note_admission_counts(slot_i, req, first)

    def _finish(self, slot_i: int, reason: str):
        slot = self.slots[slot_i]
        req = slot.request
        req.finished = True
        req.finish_reason = reason
        req.finished_at = time.perf_counter()
        slot.request = None
        self._halted = self._halted.at[slot_i].set(True)

    def _dispatch_decode(self):
        """Enqueue one decode chunk; returns (emitted array, slot snapshot).
        The emitted tokens are NOT fetched here — the caller processes them
        one chunk behind the dispatch so the host<->device roundtrip overlaps
        the next chunk's compute (the batched analogue of the reference's
        chain_copy pipelining, stream.rs:580-609)."""
        k = self.decode_chunk
        # per-slot per-step key material, deterministic per request, built in
        # pure numpy (no device roundtrips in the scheduling loop; the PRNG
        # key is just a (hi, lo) uint32 counter pair for threefry)
        keys = np.zeros((k, self.batch_size, 2), np.uint32)
        for b in range(self.batch_size):
            keys[:, b, 0] = np.uint32(self._seeds[b] & 0xFFFFFFFF)
            keys[:, b, 1] = (
                np.arange(k, dtype=np.uint64) + np.uint64(self._steps[b]) * np.uint64(k)
            ).astype(np.uint32)
        # context bucket from the host position mirror; +2k margin covers
        # the in-flight chunk the mirror has not processed yet (pipelining)
        max_pos = max((s.pos for s in self.slots if not s.free), default=0)
        self._ensure_ctx(max_pos + 2 * k + 1)
        dynamic = self._dynamic_now()
        penalized = self._penalized_now()
        n_lp = max((s.request.logprobs for s in self.slots if not s.free),
                   default=0)
        decode = self._decode_fn(k, self.lm._ctx_bucket(max_pos + 2 * k + 1),
                                 dynamic=dynamic or penalized, logprobs=n_lp,
                                 penalties=penalized)
        extra = ()
        if dynamic or penalized:
            extra += (jnp.asarray(self._samp),)
        if penalized:
            extra += (self._ensure_counts(),)
        (self._state, self._tokens, self._halted, self._remaining, counts,
         emitted) = decode(
            self.lm.params, self._state, self._tokens, self._halted,
            self._remaining, jnp.asarray(keys), *extra,
        )
        if penalized:
            self._counts = counts
        snapshot = {}
        for b, slot in enumerate(self.slots):
            if not slot.free:
                self._steps[b] += 1
                snapshot[b] = (slot.request, slot.pending_first)
                slot.pending_first = None
        return emitted, snapshot

    @staticmethod
    def _lp_entry(lp_pack, s, b):
        """(token_logprob, [(alt_id, alt_logprob), ...]) from fetched
        logprob arrays at step s, slot b — None when logprobs are off."""
        if lp_pack is None:
            return None
        lp, top_v, top_i = lp_pack
        return (float(lp[s, b]),
                [(int(i), float(v)) for i, v in zip(top_i[s, b], top_v[s, b])])

    def _process_emitted(self, emitted, snapshot):
        """Fetch a dispatched chunk's tokens (and any admitted-but-unfetched
        first tokens) in ONE device_get, then route them to requests. Finish
        detection mirrors the device-side halt conditions exactly, so the
        host can lag one chunk behind without divergence."""
        firsts = {b: f for b, (_, f) in snapshot.items() if f is not None}
        fetched, first_vals = jax.device_get((emitted, firsts))
        vals = np.asarray(fetched[0])  # [K, B]
        lp_pack = fetched[1:] if len(fetched) > 1 else None
        k = vals.shape[0]
        for b, (req, _) in snapshot.items():
            if req is None or req.finished:
                continue  # slot halted on device; emitted identity repeats
            slot = self.slots[b]
            stream = []
            if b in first_vals:
                fv = first_vals[b]
                if isinstance(fv, tuple):  # (token, lp, top_v, top_i)
                    stream.append((int(fv[0]), 0, (
                        float(fv[1]),
                        [(int(i), float(v)) for i, v in zip(fv[3], fv[2])],
                    )))
                else:
                    stream.append((int(fv), 0, None))
                req.first_token_at = time.perf_counter()
            stream.extend(
                (int(vals[s, b]), 1, self._lp_entry(lp_pack, s, b))
                for s in range(k)
            )
            for v, adv, lpe in stream:
                req.tokens.append(v)
                if req.logprobs and lpe is not None:
                    req.logprob_content.append(lpe)
                slot.produced += 1
                slot.pos += adv
                if v in self.stop_ids:
                    self._finish(b, "stop")
                    break
                if slot.produced >= req.max_new_tokens:
                    self._finish(b, "length")
                    break
                if slot.pos >= self.lm.max_context - 1:
                    self._finish(b, "length")
                    break

    def _drains_all(self, snapshot) -> bool:
        """True if the in-flight chunk provably finishes every active slot
        (length/context bound), so dispatching another chunk would only
        produce discarded identity steps."""
        k = self.decode_chunk
        for b, slot in enumerate(self.slots):
            if slot.free:
                continue
            entry = snapshot.get(b)
            if entry is None:
                return False  # admitted after the dispatch; needs a chunk
            req, first = entry
            budget = slot.produced + (1 if first is not None else 0) + k
            if budget < req.max_new_tokens and slot.pos + k < self.lm.max_context - 1:
                return False
        return True

    def step(self) -> bool:
        """One scheduling action; returns False when fully idle."""
        # Admission policy (r5): GREEDY-FILL — keep admitting until every
        # slot is live (or the backlog can't progress) BEFORE dispatching a
        # decode chunk. A decode chunk costs the same at occupancy 1 as at
        # occupancy B but produces B/L fewer tokens, so running it while
        # free slots + backlog exist wastes capacity; at the 8k-prompt
        # paged shape the old one-admission-per-cycle interleave serialized
        # ~112 prefill chunks against ~112 mostly-idle decode chunks and
        # read 43 tok/s e2e vs 475 steady (VERDICT r4 #1). The latency
        # cost to live streams is UNBOUNDED in backlog depth x prompt
        # length (filling 7 free slots with 8k prompts stalls a live
        # stream for the full ~112-chunk prefill burst) — the same trade
        # vLLM's prefill-priority default makes; latency-sensitive
        # deployments set `admit_greedy=False` for the old interleave
        # (at most one admission dispatch between decode chunks).
        admitted = False
        while self._admit():
            admitted = True
            if self.num_active and not getattr(self, "admit_greedy", True):
                break
            if self.num_active >= self.batch_size:
                break
        pending, self._pending = self._pending, None
        # drain-first: if the in-flight chunk provably finishes every active
        # slot and nothing is queued, process it instead of dispatching a
        # ghost chunk of pure identity steps
        if pending is not None and not self.queue and self._drains_all(pending[1]):
            self._process_emitted(*pending)
            pending = None
        if self.num_active:
            self._pending = self._dispatch_decode()
        if pending is not None:
            self._process_emitted(*pending)
        return bool(self._pending or pending or admitted or self.queue
                    or self._admitting)

    def run(self) -> None:
        """Drive until all submitted requests finish."""
        while (self.queue or self.num_active or self._pending
               or self._admitting):
            self.step()

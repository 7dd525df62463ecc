"""Continuous batching over a PAGED KV cache.

The capacity milestone past `BatchEngine`'s slot-per-request caches
(SURVEY §0: the reference has "no paged KV cache across requests"): slots
draw fixed pages from shared per-layer pools, so total KV memory follows
actual tokens — B slots at max_context no longer preallocate
B x max_context, and a shared prompt prefix can be one set of physical
pages (PagePool.share_prefix).

Numerics: with the Pallas paged kernel engaged (real TPU), streams are
numerically equivalent but not bit-identical to the dense engine — the
kernel's bf16 dot rounding differs from the XLA einsum path's, and greedy
argmax near-ties can pick differently (verified on-chip: the engine runs
end-to-end; the kernel itself matches its gather oracle to 4e-4). On the
CPU oracle path the streams are bit-exact (tests pin this).

v2: paged prefill (admission chunks write K/V straight into the slot's
pages — no dense state allocation, no copy pass, and prefix-shared
admissions SKIP the shared prefix's prefill compute), one-chunk-ahead
pipelined dispatch with a device-side generation budget (the host mirror
lags one chunk), K fused decode steps per dispatch with device-side
identity transitions for halted slots, recompute preemption under pool
pressure, and overflow backpressure instead of scheduler-killing raises.
"""

from __future__ import annotations

import dataclasses
from collections import deque
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..models.paged_decode import paged_decode_step, paged_supported
from ..models.paged_kv import PagePool, PagePoolOverflow, init_pools
from .batch import BatchEngine, Request, _Slot
from .engine import LanguageModel
from .sampling import SamplingParams, pack_dynamic, sample, sample_dynamic


class PagedBatchEngine:
    def __init__(
        self,
        lm: LanguageModel,
        *,
        batch_size: int = 4,
        decode_chunk: int = 8,
        num_pages: int = 256,
        page_size: int | None = None,
        sampling: SamplingParams | None = None,
        stop_token_ids=None,
        apc_max_entries: int = 16,
        admit_greedy: bool = True,
    ):
        """apc_max_entries: automatic prefix cache — finished requests'
        full KV pages are RETAINED (refcounted, LRU-capped at this many
        entries; 0 disables) so a later request extending their history
        (the next turn of a conversation) shares them instead of
        re-prefilling; pool pressure evicts retired entries before any
        live request is preempted."""
        if not paged_supported(lm.decoder_config):
            raise ValueError("paged engine supports standard attention-only models")
        if lm.ring_windows:
            raise ValueError("paged engine uses full-layout pools (no ring)")
        if page_size is None:
            # measured on-chip (CHIP_JOBS_r3.log page sweeps, B=8 C=8k):
            # the paged kernel is bound by a ~0.4 us per-grid-step floor at
            # page=64 (43.3 ms/step); page=256 moves 4x the bytes per step
            # (16.76 ms/step) and page=512 another +11% (15.07 — beating
            # the dense engine's 17.2 at 8k). Long contexts take 512 (16+
            # pages per stream keep pool granularity workable); shorter
            # contexts take 256 to limit internal fragmentation.
            if lm.max_context >= 4096 and lm.max_context % 512 == 0:
                page_size = 512
            else:
                page_size = next((p for p in (256, 128, 64)
                                  if lm.max_context % p == 0
                                  and lm.max_context >= 4 * p), 64)
        if lm.max_context % page_size:
            raise ValueError("max_context must be a multiple of page_size")
        self.lm = lm
        self.batch_size = batch_size
        self.decode_chunk = decode_chunk
        self.admit_greedy = admit_greedy
        self.page_size = page_size
        self.max_pages = -(-lm.max_context // page_size)
        # last page is the scratch target for masked admission writes
        self.pool = PagePool(num_pages=num_pages - 1, page_size=page_size)
        self._trash_page = num_pages - 1
        self.pools = init_pools(lm.decoder_config, num_pages, page_size,
                                quantized=lm.kv_quant)
        if lm.mesh is not None:
            # the page pools are GLOBAL (shared across slots), so only the
            # kv-head dim shards (over tp); slots do not split over dp here —
            # a dp>1 mesh simply replicates the pools across dp rows
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import TP_AXIS

            def shard(x):  # codes are 4D, scale planes 3D — both G-major
                spec = P(TP_AXIS, *([None] * (x.ndim - 1)))
                return jax.device_put(x, NamedSharding(lm.mesh, spec))

            self.pools = [
                None if pk is None else tuple(shard(x) for x in pk)
                for pk in self.pools
            ]
        self.sampling = sampling or SamplingParams()
        self.stop_ids = tuple(sorted(
            stop_token_ids if stop_token_ids is not None
            else lm.config.generation_config.stop_token_ids
        ))
        self.slots = [_Slot() for _ in range(batch_size)]
        self.queue: deque[Request] = deque()
        self._admit_order: dict[int, int] = {}  # slot -> admission seq
        self._admit_seq = 0
        # automatic prefix cache: retired-id (negative pool keys, disjoint
        # from slot indices) -> KV-resident history; insertion order is the
        # LRU order (move-to-end on reuse)
        from collections import OrderedDict

        self.apc_max_entries = apc_max_entries
        self._retired: "OrderedDict[int, list[int]]" = OrderedDict()
        self._retire_seq = -1
        self._next_id = 0
        self._tokens = jnp.zeros((batch_size,), jnp.int32)
        self._positions = jnp.zeros((batch_size,), jnp.int32)
        self._halted = jnp.ones((batch_size,), bool)
        # device-side generation budget (mirrors the host finish conditions
        # so a pipelined in-flight chunk cannot overrun them)
        self._remaining = jnp.zeros((batch_size,), jnp.int32)
        # in-progress admission prefill [req, consumed, slot_i, table]: long
        # prompts advance one chunk per scheduler step (interleaved with
        # decode chunks — no head-of-line blocking)
        self._admitting = None
        # one-chunk-ahead pipelining: (emitted [K, B], snapshot)
        self._pending = None
        self._seeds = np.zeros(batch_size, np.int64)
        self._steps = np.zeros(batch_size, np.int64)
        # per-slot dynamic sampling rows (see BatchEngine): engine default
        # until a request overrides
        self._samp = np.tile(np.asarray(pack_dynamic(self.sampling), np.float32),
                             (batch_size, 1))
        self._samp_custom = np.zeros(batch_size, bool)
        # executable cache lives on the MODEL keyed by engine geometry, so
        # rebuilding an engine (server restart, bench A/B) never recompiles
        # (an engine-local cache cost ~30-90 s of remote AOT per rebuild)
        self._geom = (batch_size, num_pages, page_size, lm.kv_quant)
        self._jit = lm.__dict__.setdefault("_paged_jit", {})

    # -- jitted pieces -----------------------------------------------------

    def _ctx_pages(self, needed_tokens: int) -> int:
        """Pages covering the smallest dense context bucket for a prefill
        chunk's reads (bounds the gather like the dense engine's
        CTX_BUCKET read-slicing bounds its cache stream)."""
        b = self.lm._ctx_bucket(needed_tokens)
        ctx = b if b is not None else self.lm.max_context
        return min(-(-ctx // self.page_size), self.max_pages)

    def _prefill_fn(self, bucket: int, ctx_pages: int, aligned: bool = False):
        """One slot's prefill chunk written directly into the pools (v2:
        no dense-prefill + copy-in detour, no dense state allocation).
        `aligned` (pos0 and bucket both page multiples — every chunk of a
        non-prefix-shared admission at the serving page sizes) takes the
        page-granular write path (r5, exp_paged_prefill)."""
        key = ("prefill", bucket, ctx_pages, aligned, self._geom)
        if key not in self._jit:
            from ..models.paged_decode import paged_prefill_chunk

            cfg = self.lm.decoder_config

            @partial(jax.jit, donate_argnums=(1,))
            def prefill(params, pools, tokens, table, pos0, true_length):
                return paged_prefill_chunk(
                    cfg, params, pools, tokens, table, pos0, true_length,
                    ctx_pages, aligned=aligned,
                )

            self._jit[key] = prefill
        return self._jit[key]

    def _decode_fn(self, k: int, dynamic: bool = False, logprobs: int = 0,
                   penalties: bool = False):
        assert not penalties or dynamic
        key = ("decode", k, self.sampling, self.stop_ids, self._geom, dynamic,
               logprobs, penalties)
        if key not in self._jit:
            from .sampling import apply_count_penalties

            cfg = self.lm.decoder_config
            sampling = self.sampling
            stop_arr = jnp.asarray(self.stop_ids, jnp.int32) if self.stop_ids else None
            max_pos = self.lm.max_context - 1

            @partial(jax.jit, donate_argnums=(1,))
            def decode_k(params, pools, tokens, positions, halted, remaining,
                         tables, keys, *extra_args):
                i = 0
                if dynamic:
                    samp = extra_args[i]
                    i += 1
                else:
                    samp = jnp.zeros((tokens.shape[0], 6), jnp.float32)
                counts0 = (extra_args[i] if penalties
                           else jnp.zeros((tokens.shape[0], 1), jnp.int32))

                def body(carry, key_t):
                    pools, tokens, positions, halted, remaining, counts = carry
                    fed = ~halted  # slots whose input token is REAL this step
                    logits, pools = paged_decode_step(
                        cfg, params, pools, tokens, tables, positions)
                    sampled_from = logits
                    if penalties:
                        sampled_from = apply_count_penalties(
                            logits.astype(jnp.float32), counts,
                            samp[:, 4:5], samp[:, 5:6])
                    if dynamic:
                        nxt = jax.vmap(lambda l, kk, sp: sample_dynamic(
                            l, sp[0], sp[1].astype(jnp.int32), sp[2], sp[3],
                            kk, banned_tokens=sampling.banned_tokens,
                        ))(sampled_from, key_t, samp)
                    else:
                        nxt = jax.vmap(lambda l, kk: sample(l, sampling, key=kk))(
                            sampled_from, key_t)
                    nxt = jnp.where(halted, tokens, nxt)
                    if penalties:
                        counts = counts.at[
                            jnp.arange(counts.shape[0]), nxt
                        ].add(jnp.where(halted, 0, 1).astype(jnp.int32))
                    emit = (nxt,)
                    if logprobs:
                        lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                        top_v, top_i = jax.lax.top_k(lp, logprobs)
                        tok_lp = jnp.take_along_axis(
                            lp, nxt[:, None], axis=1)[:, 0]
                        emit = (nxt, tok_lp, top_v, top_i)
                    remaining = remaining - jnp.where(halted, 0, 1)
                    if stop_arr is not None:
                        halted = halted | jnp.any(
                            nxt[:, None] == stop_arr[None, :], axis=1)
                    # advance for every slot that FED a real token this step
                    # — including the step that samples a stop. Freezing on
                    # the stop step parked the write offset ON the last
                    # history row, so the held stop token's K/V scatters
                    # overwrote it every subsequent identity step — a latent
                    # corruption of exactly the rows prefix sharing and the
                    # automatic prefix cache hand to other requests.
                    positions = positions + fed.astype(jnp.int32)
                    # device-side budget/context halt mirrors the host's
                    # finish conditions so an in-flight chunk can't overrun
                    # them while the host lags one chunk (pipelining)
                    halted = halted | (positions >= max_pos) | (remaining <= 0)
                    return (pools, nxt, positions, halted, remaining,
                            counts), emit

                (pools, tokens, positions, halted, remaining, counts), emitted = (
                    jax.lax.scan(
                        body, (pools, tokens, positions, halted, remaining,
                               counts0),
                        keys.reshape(k, -1, 2)))
                return (pools, tokens, positions, halted, remaining, counts,
                        emitted)

            self._jit[key] = decode_k
        return self._jit[key]

    # -- scheduling --------------------------------------------------------

    #: same contract as BatchEngine: grammar needs the speculative engines
    supports_grammar = False

    def submit(self, prompt, max_new_tokens: int, seed: int = 0,
               grammar=None, sampling: SamplingParams | None = None,
               logprobs: int = 0, presence_penalty: float = 0.0,
               frequency_penalty: float = 0.0) -> Request:
        import time

        if not 0 <= logprobs <= 20:
            raise ValueError("logprobs must be in [0, 20]")
        if (presence_penalty or frequency_penalty) and \
                not self.supports_count_penalties:
            raise ValueError(
                "presence/frequency penalties are served by the plain "
                "chunked engines")
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
        BatchEngine._check_sampling_override(self, sampling)
        req = Request(id=self._next_id, prompt=[int(t) for t in prompt],
                      max_new_tokens=max_new_tokens, seed=seed,
                      grammar=grammar, sampling=sampling, logprobs=logprobs,
                      presence_penalty=float(presence_penalty),
                      frequency_penalty=float(frequency_penalty),
                      submitted_at=time.perf_counter())
        self._next_id += 1
        self.queue.append(req)
        return req

    @property
    def num_active(self) -> int:
        return sum(0 if s.free else 1 for s in self.slots)

    def _admit(self) -> bool:
        import time

        if self._admitting is not None:
            return self._admit_advance()
        if not self.queue:
            return False
        slot_i = next((i for i, s in enumerate(self.slots) if s.free), None)
        if slot_i is None:
            return False
        # backpressure: a pool-exhausted admission must not raise out of the
        # scheduler loop (it would hang every in-flight request). A prompt
        # that can NEVER fit fails immediately; one that can fit later waits
        # in the queue until decode growth/releases free enough pages.
        peek = self.queue[0]
        needed = -(-(len(peek.prompt) + 1) // self.page_size)
        if needed > self.pool.num_pages:
            self.queue.popleft()
            peek.finished = True
            peek.finish_reason = "length"
            peek.finished_at = time.perf_counter()
            return True
        if peek.preempted:
            # a once-preempted request re-enters only when its FULL need
            # fits, else admission/preemption would ping-pong (each cycle
            # re-prefilling it from scratch)
            needed = -(-(len(peek.prompt) + peek.max_new_tokens + 1)
                       // self.page_size)
            needed = min(needed, self.pool.num_pages)

        # prefix match FIRST — sharing both reduces how many NEW pages the
        # admission needs and names a donor that eviction must spare (the
        # old evict-then-match order could evict the exact retired prefix
        # this continuation was about to reuse, then fully re-prefill it):
        # FULL pages of the longest common prefix with a live slot's or a
        # RETIRED (prefix-cache) entry's KV-resident history — prompt plus
        # every routed token except the last — point at the same physical
        # pages (their KV is deterministic-identical), and the chunk loop
        # STARTS past them: the shared prefix's prefill compute is skipped
        # entirely. _common_prefix caps the match at len(prompt)-1, so the
        # >=1-token tail prefill always writes AT or past the shared-page
        # boundary — the admission never writes a donor-owned page — and
        # decode writes land at page indices >= the shared range: no COW.
        n = len(peek.prompt)
        best_src, common = BatchEngine._best_prefix(self, peek.prompt)
        shared_pages = common // self.page_size if best_src is not None else 0
        for rid in reversed(self._retired):  # MRU-first
            cand = BatchEngine._common_prefix(
                self._retired[rid], peek.prompt) // self.page_size
            if cand > shared_pages:
                best_src, shared_pages = rid, cand
        needed_new = max(0, needed - shared_pages)
        if needed_new > self.pool.free_pages:
            # prefix-cache entries yield to live admissions — except the
            # chosen donor itself
            self._evict_retired(needed_new, keep=best_src)
        if needed_new > self.pool.free_pages:
            return False
        req = self.queue.popleft()

        if best_src is not None and shared_pages > 0:
            self.pool.share_prefix(best_src, slot_i, shared_pages)
            if best_src in self._retired:
                self._retired.move_to_end(best_src)  # LRU refresh
        else:
            self.pool.release(slot_i)
        # pages for the whole prompt allocate up-front within this call (no
        # decode interleaves mid-call, so the free-page pre-check above
        # guarantees this cannot overflow)
        pages = self.pool.ensure(slot_i, n + 1)
        # table rows beyond the allocation AND the sentinel entry [maxp]
        # point at the trash page (padded prefill rows write there)
        table_row = np.full(self.max_pages + 1, self._trash_page, np.int32)
        table_row[: len(pages)] = pages
        # keep at least one token to prefill so the last chunk yields the
        # first-sample logits even for a fully page-shared prompt
        start = min(shared_pages * self.page_size, max(0, n - 1))
        self._admitting = [req, start, slot_i, jnp.asarray(table_row)]
        return self._admit_advance()

    def _admit_advance(self) -> bool:
        """One PAGED prefill chunk of the in-progress admission (K/V rows
        written straight into the slot's pages); the last chunk's logits
        sample the first token. The scheduler interleaves these calls with
        decode chunks."""
        import time

        req, i, slot_i, table_row = self._admitting
        prompt = req.prompt
        n = len(prompt)
        max_chunk = self.lm.prefill_buckets[-1]
        take = min(n - i, max_chunk)
        bucket = next(b for b in self.lm.prefill_buckets if b >= take)
        chunk = np.zeros(bucket, np.int32)
        chunk[:take] = prompt[i : i + take]
        aligned = i % self.page_size == 0 and bucket % self.page_size == 0
        fn = self._prefill_fn(bucket, self._ctx_pages(i + bucket), aligned)
        logits, self.pools = fn(
            self.lm.params, self.pools, jnp.asarray(chunk), table_row,
            jnp.asarray(i, jnp.int32), jnp.asarray(take, jnp.int32),
        )
        i += take
        if i < n:
            self._admitting = [req, i, slot_i, table_row]
            return True
        self._admitting = None
        slot = self.slots[slot_i]
        mask = BatchEngine._grammar_first_mask(self, req)
        dyn = req.sampling is not None
        fs = self.lm._first_sample_fn(self.sampling, False,
                                      masked=mask is not None, dynamic=dyn,
                                      logprobs=req.logprobs)
        extra = () if mask is None else (jnp.asarray(mask),)
        if dyn:
            extra += (jnp.asarray(pack_dynamic(req.sampling), jnp.float32),)
        first_pack = fs(logits, np.uint32(req.seed), *extra)
        first = first_pack[0] if req.logprobs else first_pack
        self._tokens = self._tokens.at[slot_i].set(first)
        self._positions = self._positions.at[slot_i].set(n)
        self._halted = self._halted.at[slot_i].set(False)
        self._remaining = self._remaining.at[slot_i].set(
            max(0, req.max_new_tokens - 1))

        # no fetch here: the first token rides the next chunk's device_get
        # (pipelined, like the dense engine's admission)
        slot.request = req
        slot.produced = 0
        slot.pos = n
        slot.pending_first = first_pack if req.logprobs else first
        self._seeds[slot_i] = req.seed ^ 0xBA7C
        self._steps[slot_i] = 0
        BatchEngine._set_slot_sampling(self, slot_i, req)
        BatchEngine._note_admission_counts(self, slot_i, req, first)
        self._admit_order[slot_i] = self._admit_seq
        self._admit_seq += 1
        return True

    # same semantics and mid-pipeline safety argument as BatchEngine.cancel
    # (device program order: an in-flight chunk's page writes land before
    # any later dispatch — admission prefill into reused pages — executes);
    # the predicates/count helpers share the per-slot override machinery
    supports_count_penalties = True
    cancel = BatchEngine.cancel
    _dynamic_now = BatchEngine._dynamic_now
    _common_prefix = staticmethod(BatchEngine._common_prefix)
    _penalized_now = BatchEngine._penalized_now
    _ensure_counts = BatchEngine._ensure_counts
    _note_admission_counts = BatchEngine._note_admission_counts

    def _cancel_admitting(self) -> None:
        _, _, slot_i, _ = self._admitting
        self._admitting = None
        self.pool.release(slot_i)

    def _retire_slot(self, slot_i: int, req: Request) -> None:
        """Move the slot's complete KV pages into the automatic prefix
        cache before release. Only pages fully covered by the request's
        KV-resident history (prompt + routed tokens minus the possibly
        unfed last one) retire — an in-flight chunk's writes land at
        positions past that history, never inside retired pages."""
        if not self.apc_max_entries:
            return
        hist = req.prompt + req.tokens[:-1]
        full = len(hist) // self.page_size
        full = min(full, len(self.pool.pages(slot_i)))
        if full <= 0:
            return
        rid = self._retire_seq
        self._retire_seq -= 1
        self.pool.share_prefix(slot_i, rid, full)
        self._retired[rid] = hist[: full * self.page_size]
        while len(self._retired) > self.apc_max_entries:
            old, _ = self._retired.popitem(last=False)
            self.pool.release(old)

    def _evict_retired(self, need_pages: int, keep=None) -> bool:
        """Free LRU prefix-cache entries until `need_pages` pages are free
        (or the cache is drained); live requests always win over cached
        prefixes. `keep` spares one entry (the donor an admission is about
        to share from). Returns True if anything was evicted."""
        evicted = False
        for rid in list(self._retired):
            if self.pool.free_pages >= need_pages:
                break
            if rid == keep:
                continue
            del self._retired[rid]
            self.pool.release(rid)
            evicted = True
        return evicted

    def _finish(self, slot_i: int, reason: str):
        import time

        slot = self.slots[slot_i]
        req = slot.request
        req.finished = True
        req.finish_reason = reason
        req.finished_at = time.perf_counter()
        slot.request = None
        self._retire_slot(slot_i, req)
        self.pool.release(slot_i)
        self._admit_order.pop(slot_i, None)
        self._halted = self._halted.at[slot_i].set(True)

    def _preempt(self, slot_i: int):
        """Evict a slot for recompute: release its pages and requeue the
        request from scratch (queue FRONT). Sampling keys are deterministic
        per (seed, produced-index), so the re-run reproduces the exact same
        stream — vLLM's recompute preemption, made lossless by design."""
        slot = self.slots[slot_i]
        req = slot.request
        req.tokens = []
        req.logprob_content = []
        req.preempted += 1
        if req.grammar is not None:
            # the replayed stream re-observes every token from scratch
            req.grammar.reset()
        slot.request = None
        self.pool.release(slot_i)
        self._admit_order.pop(slot_i, None)
        self._halted = self._halted.at[slot_i].set(True)
        self.queue.appendleft(req)

    def _tables_host(self) -> np.ndarray:
        """[B, MAXP] page tables ON HOST. Free/halted slots and unused tail
        entries point at the reserved trash page: a halted slot keeps
        scattering its (stale) K/V every fused step at its parked
        (pos // page, pos % page) — with a zero-filled table those writes
        land in physical page 0, which is the first page the allocator
        hands to a LIVE slot, silently corrupting its prompt KV. Reads are
        masked by lengths either way, so pointing every inactive entry at
        the trash page makes the writes harmless without branching in the
        kernel."""
        trash = self._trash_page
        rows = np.full((self.batch_size, self.max_pages), trash, np.int32)
        for i, slot in enumerate(self.slots):
            if slot.free:
                continue
            pages = self.pool.pages(i)
            rows[i, : len(pages)] = pages
        return rows

    def _tables(self) -> jnp.ndarray:
        return jnp.asarray(self._tables_host())

    def _dispatch_decode(self):
        """Dispatch one fused K-step chunk WITHOUT fetching its tokens —
        the caller processes them one chunk behind so the host<->device
        roundtrip overlaps the next chunk's compute (same pipelining as the
        dense engine). Pages pre-allocate with a 2K margin because the host
        position mirror lags the in-flight chunk."""
        k = self.decode_chunk
        # Growth overflow preempts the YOUNGEST live slot for recompute
        # (FCFS completes; the evictee reproduces its exact stream later);
        # if the overflowing slot is alone it is capacity-bound — finish it
        # as "length" rather than raising out of the scheduler loop.
        for i, slot in enumerate(self.slots):
            while not slot.free:
                budget = slot.request.max_new_tokens - slot.produced
                steps = min(2 * k, max(budget, 1))
                want = min(slot.pos + steps, self.lm.max_context)
                try:
                    self.pool.ensure(i, want)
                    break
                except PagePoolOverflow:
                    # prefix cache yields before any preemption — evict for
                    # the REAL shortfall (an understated need here would
                    # preempt/truncate a live request with evictable pages
                    # still cached)
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
        if not self.num_active:
            return None
        keys = np.zeros((k, self.batch_size, 2), np.uint32)
        for b in range(self.batch_size):
            keys[:, b, 0] = np.uint32(self._seeds[b] & 0xFFFFFFFF)
            keys[:, b, 1] = (
                np.arange(k, dtype=np.uint64)
                + np.uint64(self._steps[b]) * np.uint64(k)
            ).astype(np.uint32)
        dynamic = self._dynamic_now()
        penalized = self._penalized_now()
        n_lp = max((s.request.logprobs for s in self.slots if not s.free),
                   default=0)
        decode = self._decode_fn(k, dynamic=dynamic or penalized,
                                 logprobs=n_lp, penalties=penalized)
        extra = ()
        if dynamic or penalized:
            extra += (jnp.asarray(self._samp),)
        if penalized:
            extra += (self._ensure_counts(),)
        # Ctx-bucketed tables (r4): the paged-attention grid scales with
        # the table width, so a max_context-sized table burns per-grid-
        # step floor on dead pages — at max_context 8192 / page 64
        # (maxp 128) with ~4 live pages per slot the fused chunk measured
        # 533 ms vs 131 ms right-sized (CHIP_JOBS_r4 paged_e2e vs
        # paged_step_v4). Slice to the live ctx bucket's pages + one
        # guaranteed-trash column (halted-slot write redirect reads the
        # LAST entry), the same shape discipline the speculative paged
        # verify already uses (batch_spec.py tables_s); jit retraces per
        # width, bucketing executables exactly like dense ctx buckets.
        # the host pos mirror lags the in-flight chunk by <= k, and this
        # chunk advances <= k more: cover pos + 2k (the ensure() margin)
        max_pos = max((s.pos for s in self.slots if not s.free), default=0)
        ctx_pages = self._ctx_pages(max_pos + 2 * k + 1)
        th = self._tables_host()
        tables = jnp.asarray(np.concatenate(
            [th[:, :ctx_pages],
             np.full((self.batch_size, 1), self._trash_page, np.int32)],
            axis=1))
        (self.pools, self._tokens, self._positions, self._halted,
         self._remaining, counts, emitted) = decode(
            self.lm.params, self.pools, self._tokens, self._positions,
            self._halted, self._remaining, tables, jnp.asarray(keys),
            *extra)
        if penalized:
            self._counts = counts
        snapshot = {}
        for b, slot in enumerate(self.slots):
            if not slot.free:
                self._steps[b] += 1
                snapshot[b] = (slot.request, slot.pending_first,
                               slot.request.preempted)
                slot.pending_first = None
        return emitted, snapshot

    def _process_emitted(self, emitted, snapshot):
        """Fetch a dispatched chunk's tokens (plus admitted-but-unfetched
        first tokens) in ONE device_get and route them to requests. Finish
        detection mirrors the device-side halt conditions exactly, so the
        host can lag one chunk behind without divergence. A request
        preempted while its chunk was in flight is skipped — its stream
        restarts from scratch on re-admission."""
        import time

        firsts = {b: f for b, (_, f, _) in snapshot.items() if f is not None}
        fetched, first_vals = jax.device_get((emitted, firsts))
        vals = np.asarray(fetched[0])  # [K, B]
        lp_pack = fetched[1:] if len(fetched) > 1 else None
        k = vals.shape[0]
        for b, (req, _, preempted) in snapshot.items():
            if req is None or req.finished or req.preempted != preempted:
                continue
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
                (int(vals[s, b]), 1, BatchEngine._lp_entry(lp_pack, s, b))
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
        """True if the in-flight chunk provably finishes every active slot,
        so another chunk would only run discarded identity steps."""
        k = self.decode_chunk
        for b, slot in enumerate(self.slots):
            if slot.free:
                continue
            entry = snapshot.get(b)
            if entry is None:
                return False  # admitted after the dispatch; needs a chunk
            req, first, _ = entry
            budget = slot.produced + (1 if first is not None else 0) + k
            if budget < req.max_new_tokens and slot.pos + k < self.lm.max_context - 1:
                return False
        return True

    def step(self) -> bool:
        """One scheduling action (the BatchedChatServer scheduler-thread
        contract); returns False when fully idle."""
        # admission policy mirrors BatchEngine.step (r5 greedy-fill): admit
        # until every slot is live before paying a decode chunk — at the
        # 8k-prompt shape the old one-chunk-per-cycle interleave serialized
        # ~112 admission chunks against ~112 mostly-idle ~150-270 ms fused
        # decode chunks (43 tok/s e2e vs 475 steady, VERDICT r4 #1)
        admitted = False
        while self._admit():
            admitted = True
            if self.num_active and not getattr(self, "admit_greedy", True):
                break
            if self.num_active >= self.batch_size:
                break
        pending, self._pending = self._pending, None
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
        while (self.queue or self.num_active or self._pending
               or self._admitting):
            self.step()

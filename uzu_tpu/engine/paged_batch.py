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

v1 scope: greedy/sampled decode correctness with host-side scheduling —
admission via the dense chunked prefill (then one jitted copy of the
prompt KV into the slot's pages), K fused decode steps per dispatch with
device-side identity transitions for halted slots. Pipelined dispatch and
COW prefix sharing follow the dense engine's path in a later round.
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
from .batch import Request, _Slot
from .engine import LanguageModel
from .sampling import SamplingParams, sample


class PagedBatchEngine:
    def __init__(
        self,
        lm: LanguageModel,
        *,
        batch_size: int = 4,
        decode_chunk: int = 8,
        num_pages: int = 256,
        page_size: int = 64,
        sampling: SamplingParams | None = None,
        stop_token_ids=None,
    ):
        if not paged_supported(lm.decoder_config):
            raise ValueError("paged engine supports standard attention-only models")
        if lm.kv_quant or lm.ring_windows:
            raise ValueError("paged engine v1 uses bf16 full-layout pools")
        if lm.max_context % page_size:
            raise ValueError("max_context must be a multiple of page_size")
        self.lm = lm
        self.batch_size = batch_size
        self.decode_chunk = decode_chunk
        self.page_size = page_size
        self.max_pages = -(-lm.max_context // page_size)
        # last page is the scratch target for masked admission writes
        self.pool = PagePool(num_pages=num_pages - 1, page_size=page_size)
        self._trash_page = num_pages - 1
        self.pools = init_pools(lm.decoder_config, num_pages, page_size)
        if lm.mesh is not None:
            # the page pools are GLOBAL (shared across slots), so only the
            # kv-head dim shards (over tp); slots do not split over dp here —
            # a dp>1 mesh simply replicates the pools across dp rows
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel.mesh import TP_AXIS

            s = NamedSharding(lm.mesh, P(TP_AXIS, None, None, None))
            self.pools = [
                None if pk is None else tuple(jax.device_put(x, s) for x in pk)
                for pk in self.pools
            ]
        self.sampling = sampling or SamplingParams()
        self.stop_ids = tuple(sorted(
            stop_token_ids if stop_token_ids is not None
            else lm.config.generation_config.stop_token_ids
        ))
        self.slots = [_Slot() for _ in range(batch_size)]
        self.queue: deque[Request] = deque()
        self._slot_prompts: dict[int, list[int]] = {}
        self._admit_order: dict[int, int] = {}  # slot -> admission seq
        self._admit_seq = 0
        self._next_id = 0
        self._tokens = jnp.zeros((batch_size,), jnp.int32)
        self._positions = jnp.zeros((batch_size,), jnp.int32)
        self._halted = jnp.ones((batch_size,), bool)
        # in-progress admission prefill [req, state, consumed, slot_i]: long
        # prompts advance one chunk per scheduler step (interleaved with
        # decode chunks — no head-of-line blocking)
        self._admitting = None
        self._jit = {}

    # -- jitted pieces -----------------------------------------------------

    def _copy_in_fn(self):
        """Scatter a dense prefill cache's rows into a slot's pages."""
        if "copy" not in self._jit:
            page = self.page_size
            maxp = self.max_pages
            trash = self._trash_page

            @partial(jax.jit, donate_argnums=(0,))
            def copy_in(pools, dense_caches, page_arr, n_pages, skip_below):
                out = []
                for pool_kv, cache in zip(pools, dense_caches):
                    k_pool, v_pool = pool_kv
                    k_t = jnp.swapaxes(cache["k"], 0, 1)  # [G, C, Dh]
                    v_t = jnp.swapaxes(cache["v"], 0, 1)

                    def body(j, kv):
                        kp, vp = kv
                        dest = jnp.where(
                            (j >= skip_below) & (j < n_pages), page_arr[j], trash
                        )
                        src_k = jax.lax.dynamic_slice(
                            k_t, (0, j * page, 0),
                            (k_t.shape[0], page, k_t.shape[2]),
                        ).astype(kp.dtype)
                        src_v = jax.lax.dynamic_slice(
                            v_t, (0, j * page, 0),
                            (v_t.shape[0], page, v_t.shape[2]),
                        ).astype(vp.dtype)
                        kp = jax.lax.dynamic_update_slice(
                            kp, src_k[:, None], (0, dest, 0, 0))
                        vp = jax.lax.dynamic_update_slice(
                            vp, src_v[:, None], (0, dest, 0, 0))
                        return kp, vp

                    k_pool, v_pool = jax.lax.fori_loop(
                        0, maxp, body, (k_pool, v_pool))
                    out.append((k_pool, v_pool))
                return out

            self._jit["copy"] = copy_in
        return self._jit["copy"]

    def _decode_fn(self, k: int):
        key = ("decode", k, self.sampling, self.stop_ids)
        if key not in self._jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling
            stop_arr = jnp.asarray(self.stop_ids, jnp.int32) if self.stop_ids else None
            max_pos = self.lm.max_context - 1

            @partial(jax.jit, donate_argnums=(1,))
            def decode_k(params, pools, tokens, positions, halted, tables, keys):
                def body(carry, key_t):
                    pools, tokens, positions, halted = carry
                    logits, pools = paged_decode_step(
                        cfg, params, pools, tokens, tables, positions)
                    nxt = jax.vmap(lambda l, kk: sample(l, sampling, key=kk))(
                        logits, key_t)
                    nxt = jnp.where(halted, tokens, nxt)
                    if stop_arr is not None:
                        halted = halted | jnp.any(
                            nxt[:, None] == stop_arr[None, :], axis=1)
                    positions = jnp.where(halted, positions, positions + 1)
                    halted = halted | (positions >= max_pos)
                    return (pools, nxt, positions, halted), nxt

                (pools, tokens, positions, halted), emitted = jax.lax.scan(
                    body, (pools, tokens, positions, halted),
                    keys.reshape(k, -1, 2))
                return pools, tokens, positions, halted, emitted

            self._jit[key] = decode_k
        return self._jit[key]

    # -- scheduling --------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int, seed: int = 0) -> Request:
        import time

        req = Request(id=self._next_id, prompt=[int(t) for t in prompt],
                      max_new_tokens=max_new_tokens, seed=seed,
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
        if needed > self.pool.free_pages:
            return False
        req = self.queue.popleft()
        self._admitting = [req, self.lm.new_state(), 0, slot_i]
        return self._admit_advance()

    def _admit_advance(self) -> bool:
        """One prefill chunk of the in-progress admission; on the last chunk
        the dense prompt KV copies into the slot's pages and the first token
        samples. The scheduler interleaves these with decode chunks."""
        import time

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
        slot = self.slots[slot_i]
        fs = self.lm._first_sample_fn(self.sampling, False)
        first = fs(logits, np.uint32(req.seed))

        # prompt prefix sharing: FULL pages of the longest common prefix
        # with a live slot's prompt point at the same physical pages (the
        # KV there is deterministic-identical); decode writes always land
        # at page indices >= the shared range, so no COW is needed
        shared_pages = 0
        best_src = None
        for src_i, src_prompt in self._slot_prompts.items():
            if self.slots[src_i].free or src_i == slot_i:
                continue
            common = 0
            for a, b in zip(src_prompt, req.prompt):
                if a != b:
                    break
                common += 1
            cand = common // self.page_size
            if cand > shared_pages:
                shared_pages, best_src = cand, src_i
        if best_src is not None and shared_pages > 0:
            self.pool.share_prefix(best_src, slot_i, shared_pages)
        else:
            self.pool.release(slot_i)
        # decode growth during the interleaved prefill may have consumed the
        # pages the admission pre-check saw: preempt the youngest live slot
        # (recompute) until the prompt fits — the pre-check guarantees it
        # fits an empty pool, so this terminates
        while True:
            try:
                pages = self.pool.ensure(slot_i, n + 1)
                break
            except PagePoolOverflow:
                live = [j for j in self._admit_order if not self.slots[j].free]
                if not live:
                    raise  # cannot happen: pre-check bounded the prompt
                self._preempt(max(live, key=self._admit_order.__getitem__))
        page_arr = np.zeros(self.max_pages, np.int32)
        page_arr[: len(pages)] = pages
        dense = [st for st in state["layers"]]
        self.pools = self._copy_in_fn()(
            self.pools, dense, jnp.asarray(page_arr),
            np.int32(-(-n // self.page_size)), np.int32(shared_pages),
        )
        self._slot_prompts[slot_i] = list(req.prompt)
        self._tokens = self._tokens.at[slot_i].set(first)
        self._positions = self._positions.at[slot_i].set(n)
        self._halted = self._halted.at[slot_i].set(False)

        val = int(jax.device_get(self._tokens[slot_i]))
        req.tokens.append(val)
        req.first_token_at = time.perf_counter()
        slot.request = req
        slot.produced = 1
        slot.pos = n
        self._admit_order[slot_i] = self._admit_seq
        self._admit_seq += 1
        if val in self.stop_ids or req.max_new_tokens <= 1:
            self._finish(slot_i, "stop" if val in self.stop_ids else "length")
        return True

    def _finish(self, slot_i: int, reason: str):
        import time

        slot = self.slots[slot_i]
        req = slot.request
        req.finished = True
        req.finish_reason = reason
        req.finished_at = time.perf_counter()
        slot.request = None
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
        req.preempted += 1
        slot.request = None
        self.pool.release(slot_i)
        self._slot_prompts.pop(slot_i, None)
        self._admit_order.pop(slot_i, None)
        self._halted = self._halted.at[slot_i].set(True)
        self.queue.appendleft(req)

    def _tables(self) -> jnp.ndarray:
        """[B, MAXP] page tables. Free/halted slots and unused tail entries
        point at the reserved trash page: a halted slot keeps scattering its
        (stale) K/V every fused step at frozen (pos // page, pos % page) —
        with a zero-filled table those writes land in physical page 0, which
        is the first page the allocator hands to a LIVE slot, silently
        corrupting its prompt KV. Reads are masked by lengths either way, so
        pointing every inactive entry at the trash page makes the writes
        harmless without branching in the kernel."""
        trash = self._trash_page
        rows = np.full((self.batch_size, self.max_pages), trash, np.int32)
        for i, slot in enumerate(self.slots):
            if slot.free:
                continue
            pages = self.pool.pages(i)
            rows[i, : len(pages)] = pages
        return jnp.asarray(rows)

    def _decode_chunk(self):
        k = self.decode_chunk
        # pre-allocate pages covering the whole chunk for every live slot.
        # Growth overflow preempts the YOUNGEST live slot for recompute
        # (FCFS completes; the evictee reproduces its exact stream later);
        # if the overflowing slot is alone it is capacity-bound — finish it
        # as "length" rather than raising out of the scheduler loop.
        for i, slot in enumerate(self.slots):
            while not slot.free:
                # the chunk appends K/V at positions pos .. pos+steps-1
                # (device steps past the budget are discarded by the host
                # and their writes land on the trash page)
                steps = min(k, slot.request.max_new_tokens - slot.produced)
                try:
                    self.pool.ensure(i, slot.pos + max(steps, 1))
                    break
                except PagePoolOverflow:
                    live = [j for j in self._admit_order if not self.slots[j].free]
                    youngest = max(live, key=self._admit_order.__getitem__)
                    if youngest == i and len(live) == 1:
                        self._finish(i, "length")
                    else:
                        self._preempt(youngest)
        if not self.num_active:
            return
        keys = np.zeros((k, self.batch_size, 2), np.uint32)
        for b, slot in enumerate(self.slots):
            if not slot.free:
                keys[:, b, 0] = np.uint32(slot.request.seed ^ 0xBA7C)
                keys[:, b, 1] = (np.arange(k, dtype=np.uint64)
                                 + np.uint64(slot.produced)).astype(np.uint32)
        decode = self._decode_fn(k)
        (self.pools, self._tokens, self._positions, self._halted,
         emitted) = decode(self.lm.params, self.pools, self._tokens,
                           self._positions, self._halted, self._tables(),
                           jnp.asarray(keys))
        vals = np.asarray(jax.device_get(emitted))
        for b, slot in enumerate(self.slots):
            if slot.free:
                continue
            req = slot.request
            for step in range(k):
                v = int(vals[step, b])
                req.tokens.append(v)
                slot.produced += 1
                slot.pos += 1
                if v in self.stop_ids:
                    self._finish(b, "stop")
                    break
                if slot.produced >= req.max_new_tokens:
                    self._finish(b, "length")
                    break
                if slot.pos >= self.lm.max_context - 1:
                    self._finish(b, "length")
                    break

    def step(self) -> bool:
        """One scheduling action (the BatchedChatServer scheduler-thread
        contract); returns False when fully idle."""
        # admission budget mirrors BatchEngine.step: ONE admission dispatch
        # between decode chunks while streams are active, greedy until the
        # first stream goes live otherwise
        admitted = False
        while self._admit():
            admitted = True
            if self.num_active:
                break
        if self.num_active:
            self._decode_chunk()
            return True
        return admitted or bool(self.queue) or self._admitting is not None

    def run(self) -> None:
        while self.queue or self.num_active or self._admitting:
            self.step()

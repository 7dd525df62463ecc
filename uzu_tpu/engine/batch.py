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
from .sampling import SamplingParams, sample


@dataclasses.dataclass
class Request:
    id: int
    prompt: list[int]
    max_new_tokens: int
    seed: int = 0
    # filled by the engine:
    tokens: list[int] = dataclasses.field(default_factory=list)
    finished: bool = False
    finish_reason: str = ""
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

    @property
    def free(self) -> bool:
        return self.request is None


class BatchEngine:
    def __init__(
        self,
        lm: LanguageModel,
        *,
        batch_size: int = 4,
        decode_chunk: int = 8,
        sampling: SamplingParams | None = None,
        stop_token_ids=None,
    ):
        self.lm = lm
        self.batch_size = batch_size
        self.decode_chunk = decode_chunk
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
        self._state = self._stack_states([lm.new_state() for _ in range(batch_size)])
        self._tokens = jnp.zeros((batch_size,), jnp.int32)  # next input per slot
        self._halted = jnp.ones((batch_size,), bool)  # empty slots are halted
        # executable caches live on the model so engines are cheap to build
        self._decode_jit = lm.__dict__.setdefault("_batch_decode_jit", {})
        self._insert_cache = lm.__dict__.setdefault("_batch_insert_jit", {})
        self._seeds = np.zeros(batch_size, np.int64)
        self._steps = np.zeros(batch_size, np.int64)

    # -- jitted pieces -----------------------------------------------------

    @staticmethod
    def _stack_states(states):
        return jax.tree.map(lambda *xs: jnp.stack(xs), *states)

    def _insert_fn(self):
        if "fn" not in self._insert_cache:

            @partial(jax.jit, donate_argnums=(0,), static_argnames=("i",))
            def insert(batch_state, slot_state, token, halted, tokens, halted_v, i):
                new_state = jax.tree.map(
                    lambda b, s: b.at[i].set(s), batch_state, slot_state
                )
                return (
                    new_state,
                    tokens.at[i].set(token),
                    halted_v.at[i].set(halted),
                )

            self._insert_cache["fn"] = insert
        return self._insert_cache["fn"]

    def _decode_fn(self, k: int):
        key = (self.sampling, k, self.stop_ids, self.batch_size)
        if key not in self._decode_jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling
            stop_arr = jnp.asarray(self.stop_ids, jnp.int32) if self.stop_ids else None

            def one_step(params, state, token, halted, key_t):
                true_length = jnp.where(halted, 0, 1).astype(jnp.int32)
                logits, state = decoder_forward(
                    cfg, params, token.reshape(1), state, last_only=True,
                    true_length=true_length,
                )
                nxt = sample(logits[0], sampling, key=key_t)
                nxt = jnp.where(halted, token, nxt)
                if stop_arr is not None:
                    halted = halted | jnp.any(nxt == stop_arr)
                return state, nxt, halted

            @partial(jax.jit, donate_argnums=(1,))
            def decode_k(params, state, tokens, halted, keys):
                def body(carry, keys_t):
                    state, tokens, halted = carry
                    state, tokens, halted = jax.vmap(
                        lambda s, t, h, kk: one_step(params, s, t, h, kk)
                    )(state, tokens, halted, keys_t)
                    return (state, tokens, halted), tokens

                (state, tokens, halted), emitted = jax.lax.scan(
                    body, (state, tokens, halted), keys
                )
                return state, tokens, halted, emitted  # emitted [K, B]

            self._decode_jit[key] = decode_k
        return self._decode_jit[key]

    # -- public API ---------------------------------------------------------

    def submit(self, prompt, max_new_tokens: int, seed: int = 0) -> Request:
        req = Request(
            id=next(self._ids),
            prompt=[int(t) for t in prompt],
            max_new_tokens=max_new_tokens,
            seed=seed,
            submitted_at=time.perf_counter(),
        )
        self.queue.append(req)
        return req

    @property
    def num_active(self) -> int:
        return sum(0 if s.free else 1 for s in self.slots)

    def _admit(self) -> bool:
        """Prefill the next queued request into a free slot. Returns True if
        a request was admitted."""
        if not self.queue:
            return False
        slot_i = next((i for i, s in enumerate(self.slots) if s.free), None)
        if slot_i is None:
            return False
        req = self.queue.popleft()
        slot = self.slots[slot_i]

        state = self.lm.new_state()
        logits, state = self.lm.prefill(state, np.asarray(req.prompt, np.int32))
        first = sample(logits, self.sampling, key=jax.random.PRNGKey(req.seed))

        insert = self._insert_fn()
        self._state, self._tokens, self._halted = insert(
            self._state, state, first, jnp.asarray(False),
            self._tokens, self._halted, slot_i,
        )
        val = int(jax.device_get(self._tokens[slot_i]))
        req.tokens.append(val)
        req.first_token_at = time.perf_counter()
        slot.request = req
        slot.produced = 1
        slot.pos = len(req.prompt)
        self._seeds[slot_i] = req.seed ^ 0xBA7C
        self._steps[slot_i] = 0
        if val in self.stop_ids or req.max_new_tokens <= 1:
            self._finish(slot_i, "stop" if val in self.stop_ids else "length")
        return True

    def _finish(self, slot_i: int, reason: str):
        slot = self.slots[slot_i]
        req = slot.request
        req.finished = True
        req.finish_reason = reason
        req.finished_at = time.perf_counter()
        slot.request = None
        self._halted = self._halted.at[slot_i].set(True)

    def _decode_chunk(self):
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
        decode = self._decode_fn(k)
        self._state, self._tokens, self._halted, emitted = decode(
            self.lm.params, self._state, self._tokens, self._halted,
            jnp.asarray(keys),
        )
        vals = np.asarray(jax.device_get(emitted))  # [K, B]
        for b, slot in enumerate(self.slots):
            if slot.free:
                continue
            req = slot.request
            self._steps[b] += 1
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
        """One scheduling action; returns False when fully idle."""
        # admit as many as fit before decoding (batch efficiency)
        admitted = False
        while self._admit():
            admitted = True
        if self.num_active:
            self._decode_chunk()
            return True
        return admitted or bool(self.queue)

    def run(self) -> None:
        """Drive until all submitted requests finish."""
        while self.queue or self.num_active:
            self.step()

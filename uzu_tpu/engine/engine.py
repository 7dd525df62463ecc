"""The inference engine: model load, jitted prefill/decode, token stream.

Role parity with the reference's Engine + LanguageModelStream
(crates/backend-uzu/src/engine/language_model/{mod.rs,stream/stream.rs}),
redesigned for XLA's compile-once execution model:

- prefill runs in fixed-size chunks; ragged tails pad up to a small bucket
  set (one compiled program per bucket) — padding lands in future cache
  slots the causal mask hides, so no masking plumbing is needed;
- the decode step is one jitted function (forward + sampling fused) whose
  state buffers are donated, so the KV update is in-place in HBM;
- the host loop never blocks on the current token before enqueuing the next
  step: the sampled token stays on device and feeds the next step directly
  (JAX async dispatch ≈ the reference's chain_copy GPU-side token forwarding,
  stream.rs:580-609).
"""

from __future__ import annotations

import dataclasses
import os
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LanguageModelConfig, load_language_model_config
from ..models.decoder import decoder_forward
from ..models.loader import load_decoder
from ..models.state import init_state
from ..params.tree import ParameterLoader
from .sampling import SamplingParams, push_ring, sample

DEFAULT_PREFILL_BUCKETS = (16, 64, 256)

# Context buckets: attention reads only the smallest power-of-two bucket of
# cache slots covering the current position (the reference's sparse
# grow-on-demand property, state.rs:153-185) — at max_context 8k, early
# decode streams 1k slots of KV instead of 8k. Executables multiply per
# bucket in use, so the floor is high enough that short-context configs
# (max_context <= 1024, e.g. the bench flagship) keep a single bucket.
CTX_BUCKET_MIN = 1024


class ContextOverflowError(RuntimeError):
    """Prompt + generated tokens exceed the state's max context
    (parity with the reference's overflow check, stream.rs:141-146)."""


@dataclasses.dataclass
class StreamMetrics:
    """Parity with shoji TokenStreamMetrics (chat_token.rs:15-22)."""

    num_forward_passes: int = 0
    num_tokens_prefilled: int = 0
    num_tokens_generated: int = 0
    prefill_seconds: float = 0.0
    decode_seconds: float = 0.0

    @property
    def prefill_tokens_per_second(self) -> float:
        return self.num_tokens_prefilled / self.prefill_seconds if self.prefill_seconds else 0.0

    @property
    def decode_tokens_per_second(self) -> float:
        return self.num_tokens_generated / self.decode_seconds if self.decode_seconds else 0.0


class LanguageModel:
    def __init__(
        self,
        config: LanguageModelConfig,
        params,
        *,
        max_context: int = 4096,
        prefill_buckets=DEFAULT_PREFILL_BUCKETS,
        shard_fn=None,
        mesh=None,
        tp: int | None = None,
        dp: int | None = None,
        kv_quant: bool = False,
        ring_windows: bool = False,
    ):
        self.config = config
        self.decoder_config = config.decoder_config
        self.max_context = max_context
        self.prefill_buckets = tuple(sorted(prefill_buckets))
        # largest number of decode steps fused into one dispatch (one host
        # fetch per chunk; chunks grow 1,2,4,... up to this). 64 measured
        # ~10% faster than 32 on the v5e flagship (fetch amortization).
        self.max_decode_chunk = 64
        self.kv_quant = kv_quant
        self.ring_windows = ring_windows
        # multi-chip: a (dp, tp) mesh makes THIS model a distributed model —
        # params get Megatron-style GSPMD shardings, every state this model
        # creates is sharded to match, and the existing jitted steps compile
        # over the mesh with XLA-inserted collectives (no separate code path;
        # the parallel/ layer provides the partition specs). `tp=`/`dp=`
        # build the mesh over all visible devices.
        if mesh is None and (tp is not None or dp is not None):
            from ..parallel import make_mesh

            mesh = make_mesh(tp=tp, dp=dp)
        self.mesh = mesh
        if shard_fn is not None:
            self.params = shard_fn(params)
        elif mesh is not None:
            from ..parallel import shard_decoder_params

            self.params = shard_decoder_params(self.decoder_config, params, mesh)
        else:
            self.params = params
        self._prefill_jit = {}
        self._decode_jit = {}

    # -- loading ---------------------------------------------------------

    @classmethod
    def from_dir(cls, model_dir: str, *, random_seed: int | None = None, **kw) -> "LanguageModel":
        from ..runtime import enable_compilation_cache

        enable_compilation_cache()  # TPU-only; no-op on CPU (runtime.py)
        config = load_language_model_config(os.path.join(model_dir, "config.json"))
        loader = ParameterLoader(os.path.join(model_dir, "model.safetensors"), random_seed=random_seed)
        tree = loader.tree()
        params = load_decoder(tree, config.decoder_config)
        tree.assert_all_validated()
        return cls(config, params, **kw)

    @classmethod
    def from_dir_sharded(cls, model_dir: str, mesh, *,
                         random_seed: int | None = None, **kw) -> "LanguageModel":
        """Multi-host sharded load: streams the model group-by-group so no
        single process ever materializes the full parameter tree (see
        parallel.distributed.load_params_sharded). Use for models larger
        than one host's memory; from_dir + mesh= is fine otherwise."""
        from ..parallel.distributed import load_params_sharded
        from ..runtime import enable_compilation_cache

        enable_compilation_cache()
        config, params, stats = load_params_sharded(
            model_dir, mesh, random_seed=random_seed)
        lm = cls(config, params, mesh=mesh, shard_fn=lambda p: p, **kw)
        lm.shard_load_stats = stats
        return lm

    # -- state -----------------------------------------------------------

    def new_state(self, ring_size: int = 0, batch_size: int = 0,
                  ctx_capacity: int | None = None) -> dict:
        """Fresh decoding state. One jitted executable builds the whole
        pytree (a naive per-buffer construction is ~35 tiny dispatches — tens
        of ms of pure launch overhead on a remote-tunnel chip). batch_size>0
        returns the batched state with a leading [B] dim on every leaf (the
        continuous-batching engine's slot stack). ctx_capacity < max_context
        allocates a SHORTER KV (the batch engines grow capacity by ctx
        bucket — r4: a max_context-sized batched cache measured +3.5 ms per
        B=4 decode step vs a right-sized one, CHIP_JOBS_r4 batch_step_8k)."""
        cap = ctx_capacity or self.max_context
        key = (ring_size, batch_size, cap)
        cache = self.__dict__.setdefault("_state_init_jit", {})
        if key not in cache:

            def build():
                state = init_state(
                    self.decoder_config,
                    cap,
                    kv_quant=self.kv_quant,
                    ring_windows=self.ring_windows,
                    ring_extra=max(self.prefill_buckets),
                )
                if ring_size:
                    state["ring"] = jnp.full((ring_size,), -1, jnp.int32)
                if batch_size:
                    state = jax.tree.map(
                        lambda l: jnp.broadcast_to(l, (batch_size,) + l.shape), state
                    )
                return state

            if self.mesh is not None:
                # the fresh state comes out of the compiled builder already
                # sharded (KV heads over tp, slot dim over dp when batched) —
                # no host round-trip or resharding transfer afterwards
                from ..parallel.sharding import state_specs

                shapes = jax.eval_shape(build)
                specs = state_specs(
                    self.decoder_config, shapes, self.mesh,
                    batched=batch_size > 0,
                )
                cache[key] = jax.jit(build, out_shardings=specs)
            else:
                cache[key] = jax.jit(build)
        return cache[key]()

    def recommended_max_context(self, memory_budget_bytes: int | None = None,
                                batch_size: int = 1) -> int:
        """Largest max_context the device memory supports for this model
        (parity: recommended_context_length policy, engine/language_model/
        mod.rs:140-165 — the reference sizes its sparse KV budget from free
        memory the same way). Leaves 10% headroom plus a workspace reserve;
        clamps to the model's trained context when the config declares one."""
        import jax

        if memory_budget_bytes is None:
            try:
                stats = jax.devices()[0].memory_stats() or {}
                memory_budget_bytes = stats.get("bytes_limit", 0)
            except Exception:
                memory_budget_bytes = 0
            if not memory_budget_bytes:
                memory_budget_bytes = 16 * 1024**3  # v5e-class default
        weight_bytes = sum(x.nbytes for x in jax.tree.leaves(self.params))
        kv_per_token = 0
        from ..config.model import AttentionConfig

        for lc in self.decoder_config.transformer_config.layer_configs:
            m = lc.mixer_config
            if isinstance(m, AttentionConfig) and not m.is_kv_sharing \
                    and lc.kv_source_layer_index is None:
                dtype_bytes = 1 if self.kv_quant else 2
                kv_per_token += 2 * m.num_groups * m.head_dim * dtype_bytes
        workspace = max(256 * 1024**2, weight_bytes // 8)
        avail = int(memory_budget_bytes * 0.9) - weight_bytes - workspace
        if kv_per_token <= 0 or avail <= 0:
            ctx = 4096 if avail > 0 else 1024
        else:
            ctx = avail // (kv_per_token * max(1, batch_size))
        # round down to a friendly power of two in [1k, 1M]
        p = 1024
        while p * 2 <= ctx and p < (1 << 20):
            p *= 2
        ctx = p
        # trained context lives on the RoPE configs
        for lc in self.decoder_config.transformer_config.layer_configs:
            trained = getattr(lc.rope_config, "max_sequence_length", None)
            if trained:
                ctx = min(ctx, trained)
                break
        return max(1024, ctx)

    # -- compiled steps ----------------------------------------------------

    def _ctx_bucket(self, needed: int) -> int | None:
        """Smallest context bucket covering `needed` slots; None = full."""
        if self.max_context <= CTX_BUCKET_MIN:
            return None
        b = CTX_BUCKET_MIN
        while b < needed:
            b *= 2
        return None if b >= self.max_context else b

    def _prefill_fn(self, chunk: int, ctx_bucket: int | None = None):
        # params are an explicit jit argument (never closure constants): the
        # weights must stay HBM-resident arguments so XLA doesn't embed them
        # in the executable and sharding/donation stay controllable.
        key = (chunk, ctx_bucket)
        if key not in self._prefill_jit:

            @partial(jax.jit, donate_argnums=(2,))
            def prefill(params, tokens, state, true_length):
                ring = state.pop("ring", None)
                logits, state = decoder_forward(
                    self.decoder_config, params, tokens, state, last_only=True,
                    true_length=true_length, ctx_limit=ctx_bucket,
                )
                if ring is not None:
                    state["ring"] = _ring_push_chunk(ring, tokens, true_length)
                return logits[0], state

            self._prefill_jit[key] = prefill
        return self._prefill_jit[key]

    def _decode_fn(self, sampling: SamplingParams, steps: int, stop_ids: tuple,
                   ctx_bucket: int | None = None, logprobs: int = 0):
        """K decode steps fused into ONE dispatch via lax.scan, with an
        on-device halt flag: after a stop token every remaining step is an
        identity transition (true_length=0 — pos frozen, recurrent states
        masked, KV writes land in the invisible slot at pos). The host
        fetches K tokens per roundtrip instead of one — the TPU-side
        extension of the reference's chain_copy GPU token forwarding
        (stream.rs:580-609), sized for dispatch/transfer latency.
        `logprobs` > 0 also emits per-step raw-logit log-softmax of the
        sampled token + the top alternatives (separate executable)."""
        cache_key = (sampling, steps, stop_ids, ctx_bucket, logprobs)
        if cache_key not in self._decode_jit:
            stop_arr = jnp.asarray(stop_ids, jnp.int32) if stop_ids else None

            def one_step(params, state, token, halted, remaining, key):
                true_length = jnp.where(halted, 0, 1).astype(jnp.int32)
                ring = state.pop("ring", None)
                logits, state = decoder_forward(
                    self.decoder_config,
                    params,
                    token.reshape(1),
                    state,
                    last_only=True,
                    true_length=true_length,
                    ctx_limit=ctx_bucket,
                )
                next_token = sample(logits[0], sampling, key=key, ring=ring)
                next_token = jnp.where(halted, token, next_token)
                emit = (next_token,)
                if logprobs:
                    lp = jax.nn.log_softmax(logits[0].astype(jnp.float32))
                    top_v, top_i = jax.lax.top_k(lp, logprobs)
                    emit = (next_token, lp[next_token], top_v, top_i)
                if ring is not None:
                    state["ring"] = jax.tree.map(
                        lambda new, old: jnp.where(halted, old, new),
                        push_ring(ring, next_token),
                        ring,
                    )
                # budget halt: a chunk may overrun the generation budget
                # (the host rounds the tail up to an existing power-of-two
                # executable instead of paying one roundtrip per 4/2/1-step
                # shard); steps past the budget are identity transitions
                remaining = remaining - jnp.where(halted, 0, 1)
                halted = halted | (remaining <= 0)
                if stop_arr is not None:
                    halted = halted | jnp.any(next_token == stop_arr)
                return state, next_token, halted, remaining, emit

            @partial(jax.jit, donate_argnums=(1,))
            def decode_k(params, state, token, halted, remaining, keys):
                def body(carry, key_t):
                    state, token, halted, remaining = carry
                    state, next_token, halted, remaining, emit = one_step(
                        params, state, token, halted, remaining, key_t)
                    return (state, next_token, halted, remaining), emit

                (state, token, halted, remaining), emitted = jax.lax.scan(
                    body, (state, token, halted,
                           jnp.asarray(remaining, jnp.int32)), keys
                )
                # emitted: (tokens [K][, lp [K], top_v/top_i [K, n]])
                return state, emitted, halted

            self._decode_jit[cache_key] = decode_k
        return self._decode_jit[cache_key]

    def _first_sample_fn(self, sampling: SamplingParams, has_ring: bool,
                         masked: bool = False, dynamic: bool = False,
                         logprobs: int = 0):
        """Jitted first-token sample (prefill logits -> token). Eager sample()
        is ~10 op-by-op dispatches — pure launch overhead on a remote chip.
        `masked` appends a grammar bitmask argument, `dynamic` a per-request
        sampling-parameter row [4], `logprobs` > 0 returns (token, logprob,
        top values, top ids) instead of the bare token (separate cache
        entries so default paths keep their existing executables)."""
        cache = self.__dict__.setdefault("_first_sample_jit", {})
        # the ring variant does not compose with the others — a masked+ring
        # call would silently bind the grammar bitmask to the ring argument
        assert not (has_ring and (masked or dynamic)), \
            "ring sampling does not compose with masked/dynamic first samples"
        key = (sampling, has_ring, masked, dynamic, logprobs)
        if key not in cache:
            if has_ring:

                def pick(logits, seed, ring):
                    return sample(logits, sampling, key=jax.random.PRNGKey(seed), ring=ring)

            elif dynamic:
                from .sampling import sample_dynamic

                def pick(logits, seed, *extra):
                    mask = extra[0] if masked else None
                    samp = extra[1 if masked else 0]
                    return sample_dynamic(
                        logits, samp[0], samp[1].astype(jnp.int32), samp[2],
                        samp[3], jax.random.PRNGKey(seed), bitmask=mask,
                        banned_tokens=sampling.banned_tokens,
                    )

            elif masked:

                def pick(logits, seed, mask):
                    return sample(logits, sampling, key=jax.random.PRNGKey(seed),
                                  bitmask=mask)

            else:

                def pick(logits, seed):
                    return sample(logits, sampling, key=jax.random.PRNGKey(seed))

            if logprobs:

                @jax.jit
                def fs(logits, seed, *extra):
                    tok = pick(logits, seed, *extra)
                    lp = jax.nn.log_softmax(logits.astype(jnp.float32))
                    top_v, top_i = jax.lax.top_k(lp, logprobs)
                    return tok, lp[tok], top_v, top_i

            else:
                fs = jax.jit(pick)

            cache[key] = fs
        return cache[key]

    # -- public API --------------------------------------------------------

    def prefill(self, state: dict, tokens: np.ndarray):
        """Feed prompt tokens through the model in chunks; returns
        (last_logits, state)."""
        tokens = np.asarray(tokens, np.int32)
        n = len(tokens)
        if n == 0:
            raise ValueError("prefill requires at least one token")
        pos = int(state["pos"])
        if pos + n > self.max_context:
            raise ContextOverflowError(
                f"prompt of {n} tokens at position {pos} exceeds max_context={self.max_context}"
            )
        max_chunk = self.prefill_buckets[-1]
        logits = None
        i = 0
        while i < n:
            remaining = n - i
            take = min(remaining, max_chunk)
            bucket = next(b for b in self.prefill_buckets if b >= take)
            chunk = np.zeros(bucket, np.int32)
            chunk[:take] = tokens[i : i + take]
            fn = self._prefill_fn(bucket, self._ctx_bucket(pos + i + bucket))
            from ..tools.profile import profiled

            logits, state = profiled(
                "prefill", fn, self.params, jnp.asarray(chunk), state,
                jnp.asarray(take, jnp.int32))
            i += take
        return logits, state

    def generate(
        self,
        prompt_tokens,
        max_new_tokens: int,
        sampling: SamplingParams | None = None,
        stop_token_ids=None,
        seed: int = 0,
        metrics: StreamMetrics | None = None,
    ):
        """Token generator. Yields ints; stops on stop token or limit."""
        return self.generate_resumable(
            None,
            prompt_tokens,
            max_new_tokens,
            sampling=sampling,
            stop_token_ids=stop_token_ids,
            seed=seed,
            metrics=metrics,
        )

    def generate_resumable(
        self,
        state: dict | None,
        prompt_tokens,
        max_new_tokens: int,
        sampling: SamplingParams | None = None,
        stop_token_ids=None,
        seed: int = 0,
        metrics: StreamMetrics | None = None,
        logprobs: int = 0,
    ) -> "TokenStream":
        """Like generate(), but continues an existing decoding state (for
        prefix-cached chat sessions) and exposes the final state as
        `.state` on the returned TokenStream once iteration finishes.
        `logprobs` > 0 fills `.logprob_content` with one (token_logprob,
        [(alt_id, alt_logprob), ...]) entry per yielded token."""
        return TokenStream(
            self, state, prompt_tokens, max_new_tokens, sampling,
            stop_token_ids, seed, metrics, logprobs,
        )

    def _generate_impl(
        self,
        init_state,
        prompt_tokens,
        max_new_tokens: int,
        sampling,
        stop_token_ids,
        seed: int,
        metrics,
        logprobs: int,
        out: "TokenStream",
    ):
        import time

        sampling = sampling or SamplingParams.from_generation_config(self.config.generation_config)
        stop = set(
            stop_token_ids if stop_token_ids is not None else self.config.generation_config.stop_token_ids
        )
        ring_size = sampling.suffix_repetition_length if sampling.repetition_penalty else 0
        if init_state is None:
            state = self.new_state(ring_size=ring_size)
        else:
            state = init_state
            if ring_size and "ring" not in state:
                state["ring"] = jnp.full((ring_size,), -1, jnp.int32)

        start_pos = int(state["pos"])
        t0 = time.perf_counter()
        logits, state = self.prefill(state, prompt_tokens)
        ring = state.get("ring")
        fs = self._first_sample_fn(sampling, ring is not None,
                                   logprobs=logprobs)
        extra = (ring,) if ring is not None else ()
        first_pack = fs(logits, np.uint32(seed), *extra)
        first_val = None
        if logprobs:
            fp = jax.device_get(first_pack)
            first = first_pack[0]
            first_val = int(fp[0])  # already on host: skip the re-fetch
            out.logprob_content.append((
                float(fp[1]),
                [(int(i), float(x)) for i, x in zip(fp[3], fp[2])],
            ))
        else:
            first = first_pack
        first.block_until_ready()
        t1 = time.perf_counter()
        if metrics is not None:
            metrics.num_tokens_prefilled += len(prompt_tokens)
            metrics.prefill_seconds += t1 - t0
            metrics.num_forward_passes += -(-len(prompt_tokens) // self.prefill_buckets[-1])

        stop_ids = tuple(sorted(stop))
        # + max_decode_chunk: the budget-tail chunk rounds UP to a power of
        # two, so dispatched steps can overrun the budget by up to one
        # chunk; a short key slice would silently retrace the decode
        # executable at an odd scan length (a fresh ~90 s remote compile)
        keys = jax.random.split(jax.random.PRNGKey(seed ^ 0x5EED),
                                max_new_tokens + self.max_decode_chunk + 1)
        token = first
        if state.get("ring") is not None:
            state["ring"] = push_ring(state["ring"], token)
        produced = 0
        t2 = time.perf_counter()
        # stop before the KV cache would overflow (decode writes one slot per
        # step at the current position)
        budget = min(max_new_tokens, self.max_context - start_pos - len(prompt_tokens))

        # First token: fetch immediately (TTFT), then decode in growing
        # chunks — K fused steps per dispatch, K tokens per host fetch.
        val = first_val if first_val is not None else int(jax.device_get(token))
        produced += 1
        yield val
        if val in stop:
            budget = 0
        halted = jnp.asarray(False)
        step = 0
        chunk_idx = 0
        dispatched = produced
        pending = None  # in-flight chunk's token array (pipelining: the next
        # chunk is dispatched before the previous chunk's tokens are fetched,
        # hiding the host<->device roundtrip behind compute; the on-device
        # halt flag makes an overrun chunk a no-op whose output we discard)
        done = False
        while True:
            new_pending = None
            if not done and dispatched < budget:
                # powers of two only (bounded executable count), starting at
                # 8: a smaller chunk's compute (< ~30 ms) cannot hide the
                # host<->device fetch roundtrip behind the next dispatch, so
                # the pipeline stalls; 8-token bursts are imperceptible at
                # streaming cadence. The budget tail rounds UP to the
                # smallest power-of-two executable that covers it — the
                # device budget-halt makes overrun steps identity no-ops —
                # instead of sharding it into 4/2/1-step dispatches that
                # each pay a full host<->device roundtrip.
                rem = budget - dispatched
                k = min(8 << chunk_idx, self.max_decode_chunk)
                while k // 2 >= rem:
                    k //= 2
                chunk_idx += 1
                # steps dispatched so far touch positions < base + dispatched;
                # this chunk reaches base + dispatched - 1 + k (first token
                # came from prefill, hence -1)
                base = start_pos + len(prompt_tokens)
                decode = self._decode_fn(
                    sampling, k, stop_ids,
                    self._ctx_bucket(base + dispatched + k),
                    logprobs=logprobs,
                )
                from ..tools.profile import profiled

                state, emitted, halted = profiled(
                    "decode", decode,
                    self.params, state, token, halted, rem,
                    keys[step : step + k]
                )
                step += k
                dispatched = min(dispatched + k, budget)
                token = emitted[0][-1]
                new_pending = emitted
                if metrics is not None:
                    metrics.num_forward_passes += k
            if pending is not None and not done:
                fetched = jax.device_get(pending)
                toks = np.asarray(fetched[0])
                for s, v in enumerate(int(x) for x in toks):
                    if produced >= budget:
                        # overrun-chunk tail: identity repeats past the
                        # device budget halt — discard
                        done = True
                        break
                    if logprobs:
                        lp, top_v, top_i = fetched[1], fetched[2], fetched[3]
                        out.logprob_content.append((
                            float(lp[s]),
                            [(int(i), float(x))
                             for i, x in zip(top_i[s], top_v[s])],
                        ))
                    produced += 1
                    yield v
                    if v in stop:
                        done = True
                        break
            pending = new_pending
            # a stop discards the in-flight chunk unfetched: the device halt
            # (same stop set) froze the state at the stop token, so the
            # overrun chunk emitted only identity repeats
            if pending is None or done:
                break
        if metrics is not None:
            metrics.num_tokens_generated += produced
            metrics.decode_seconds += time.perf_counter() - t2
        out.state = state

    def generate_list(self, prompt_tokens, max_new_tokens: int, **kw) -> list[int]:
        return list(self.generate(prompt_tokens, max_new_tokens, **kw))


class TokenStream:
    """Iterable of generated token ids; `.state` holds the final decoding
    state after iteration completes (the session layer's prefix cache);
    `.logprob_content` fills per yielded token when logprobs requested."""

    def __init__(self, lm, state, prompt_tokens, max_new_tokens, sampling,
                 stop_token_ids, seed, metrics, logprobs: int = 0):
        self.state = None
        self.logprob_content: list = []
        self._gen = lm._generate_impl(
            state, prompt_tokens, max_new_tokens, sampling, stop_token_ids,
            seed, metrics, logprobs, self,
        )

    def __iter__(self):
        return self._gen

    def __next__(self):
        return next(self._gen)


def _ring_push_chunk(ring: jax.Array, tokens: jax.Array, true_length) -> jax.Array:
    """Push `true_length` tokens of a chunk into the ring (static shapes)."""
    r = ring.shape[0]
    s = tokens.shape[0]
    buf = jnp.concatenate([ring, tokens])  # [r + s]
    # after pushing true_length tokens, the window ends at r + true_length
    start = true_length  # == (r + true_length) - r
    return jax.lax.dynamic_slice_in_dim(buf, start, r)

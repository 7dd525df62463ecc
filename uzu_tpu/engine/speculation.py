"""Speculative decoding: draft proposal + single-dispatch verification.

Reference counterpart: crates/backend-uzu/src/speculators/dflash_tfm.rs +
engine stream speculative path (stream/stream.rs:553-629) + host trie accept
(trie.rs:211). The reference grows a token tree on-GPU (Weaver) and verifies
over a linearized trie; this TPU build provides BOTH chain speculation
(SpeculativeDecoder) and tree speculation (TreeSpeculativeDecoder, below),
redesigned for XLA's static shapes:

- the verify step is ONE jitted dispatch: a (k+1)-token forward with logits
  at every row, greedy/sampled token per row;
- acceptance runs on host over the fetched [k+1] sampled tokens (exact-match
  rule, like the reference's accept-path matching);
- rollback is free by construction: the KV cache is slot-per-position and
  slots at indices >= pos are invisible to the causal mask, so rejecting
  tokens is just not advancing `pos` (the reference needs KVCacheUpdate
  copies; the TPU layout avoids them);
- recurrent mixers (GDN/Mamba2/ShortConv) verify via DEFERRED COMMIT: the
  forward returns replay aux instead of committed state (defer_ssm), the
  exact-match acceptance is computed ON DEVICE in the same dispatch, and the
  recurrent state is then replayed over just the accepted prefix
  (ssm_commit) — the TPU redesign of the reference's dedicated tree-verify
  kernels (encodable_block/mixer/delta_net/tree_verify.rs, short_conv.rs:7)
  that costs one tiny scan, not a second weight stream. Tree speculation
  and draft-state rollback still need slot-addressable KV and stay
  attention-only (tree_speculation_supported).

Speculators:
- NgramSpeculator: model-free prompt-lookup (longest recent n-gram match in
  the token history proposes its continuation);
- DraftModelSpeculator: a smaller LanguageModel proposes k tokens greedily
  (the role of uzu's DFlash draft transformer, run as a standalone model).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import AttentionConfig
from ..models.decoder import decoder_commit_deferred, decoder_forward
from .sampling import SamplingParams, sample


def speculation_supported(decoder_config) -> bool:
    """Chain speculation works for EVERY mixer family: attention rolls back
    by pos-reset, recurrent mixers by deferred commit + prefix replay. Only
    KV-shared attention is excluded (the shared read would see the source
    layer's uncommitted speculative rows)."""
    return all(
        not (
            isinstance(lc.mixer_config, AttentionConfig)
            and lc.mixer_config.is_kv_sharing
        )
        for lc in decoder_config.transformer_config.layer_configs
    )


def tree_speculation_supported(decoder_config) -> bool:
    """Tree verification and draft-model state rollback require
    slot-addressable KV (per-node position slots, free pos-reset):
    attention-only, non-KV-shared."""
    return all(
        isinstance(lc.mixer_config, AttentionConfig)
        and not lc.mixer_config.is_kv_sharing
        for lc in decoder_config.transformer_config.layer_configs
    )


@dataclasses.dataclass
class SpeculationMetrics:
    """Parity with shoji TokenStreamMetrics speculation counters."""

    num_tokens_proposed: int = 0
    num_tokens_accepted: int = 0
    num_verify_passes: int = 0

    @property
    def acceptance_rate(self) -> float:
        return self.num_tokens_accepted / self.num_tokens_proposed if self.num_tokens_proposed else 0.0


class NgramSpeculator:
    """Prompt-lookup decoding: propose the continuation of the longest
    recent occurrence of the current suffix n-gram."""

    def __init__(self, max_ngram: int = 3, k: int = 8):
        self.max_ngram = max_ngram
        self.k = k

    def propose(self, history: list[int]) -> list[int]:
        h = history
        for n in range(self.max_ngram, 0, -1):
            if len(h) < n + 1:
                continue
            suffix = h[-n:]
            # scan backwards for the most recent earlier occurrence
            for start in range(len(h) - n - 1, -1, -1):
                if h[start : start + n] == suffix:
                    cont = h[start + n : start + n + self.k]
                    if cont:
                        return cont
        return []

    def observe(self, tokens: list[int]) -> None:
        pass  # history passed on every propose


class DraftModelSpeculator:
    """Greedy k-step draft from a smaller model sharing the tokenizer.

    The k draft steps run as ONE fused dispatch (the engine's scan-based
    decode chunk) and ONE host fetch; the draft keeps its own prefix state
    across proposals and rolls back rejected tokens:

    - attention-only drafts: pos-reset (speculative KV slots masked; the
      donated decode chunk stays the fast path);
    - HYBRID drafts (recurrent mixers — GDN/Mamba2/ShortConv): the chain
      runs on a functional VIEW of the committed state (non-donated scan;
      its state writes are discarded, the role the reference's GDN
      tree-verify kernels play — gdn/tree_verify/tree_update_solve.metal),
      and the committed state only ever advances by REAL history tokens
      prefilled on the next propose.
    """

    def __init__(self, draft_lm, k: int = 4):
        if not speculation_supported(draft_lm.decoder_config):
            raise ValueError("draft model has KV-shared attention")
        self.draft = draft_lm
        self.k = k
        # recurrent state cannot pos-reset; those drafts chain on a view
        self._hybrid = not tree_speculation_supported(draft_lm.decoder_config)
        self._state = None
        self._fed = 0  # tokens of history the draft state covers
        self._keys = jax.random.split(jax.random.PRNGKey(0), k)
        self._chain_jit = None

    def reset(self):
        self._state = None
        self._fed = 0

    def _chain_fn(self):
        """Greedy k-step chain on a functional view: state threads through
        the scan but is NOT returned (and the committed input is not
        donated), so the caller's state stays pinned to real history."""
        if self._chain_jit is None:
            cfg = self.draft.decoder_config
            k = self.k

            @jax.jit
            def chain(params, state, token):
                def step(carry, _):
                    st, t = carry
                    logits, st = decoder_forward(
                        cfg, params, t.reshape(1), st, last_only=True)
                    nt = jnp.argmax(logits[0]).astype(jnp.int32)
                    return (st, nt), nt

                _, toks = jax.lax.scan(step, (state, token), None, length=k)
                return toks

            self._chain_jit = chain
        return self._chain_jit

    def propose(self, history: list[int]) -> list[int]:
        if self._state is None:
            self._state = self.draft.new_state()
            self._fed = 0
        new = history[self._fed :]
        if not new:
            return []
        if self._fed + len(new) + self.k + 1 > self.draft.max_context:
            return []
        if self._hybrid:
            # commit all real history EXCEPT the root token, then chain
            # from the root on a discarded view; the root joins the
            # committed state as part of the NEXT propose's `new`
            if len(new) > 1:
                _, self._state = self.draft.prefill(
                    self._state, np.asarray(new[:-1], np.int32)
                )
                self._fed += len(new) - 1
            toks = self._chain_fn()(
                self.draft.params, self._state,
                jnp.asarray(new[-1], jnp.int32),
            )
            return [int(t) for t in np.asarray(jax.device_get(toks))]
        if len(new) > 1:
            _, self._state = self.draft.prefill(
                self._state, np.asarray(new[:-1], np.int32)
            )
        decode = self.draft._decode_fn(SamplingParams(), self.k, ())
        self._state, emitted, _ = decode(
            self.draft.params,
            self._state,
            jnp.asarray(new[-1], jnp.int32),
            jnp.asarray(False),
            self.k,  # no budget halt: every draft step is wanted
            self._keys,
        )
        out = [int(t) for t in np.asarray(jax.device_get(emitted[0]))]
        # state now also covers new[-1] plus k-1 speculative tokens; keep
        # only the real history (pos-reset rollback, slots masked)
        self._fed += len(new)
        self._state["pos"] = jnp.asarray(self._fed, jnp.int32)
        return out


def self_draft_model(lm, num_layers: int):
    """A layer-truncated view of `lm` usable as a draft model
    (self-speculative decoding, LayerSkip / Draft-and-Verify style): the
    first `num_layers` transformer layers plus the shared embedding,
    output norm, and readout. Weight arrays are SHARED with the target —
    the draft costs only its own KV state, and its early-layer compute is
    exactly the target's, which is what makes its proposals correlate."""
    from .engine import LanguageModel
    from ..config.model import (
        DecoderConfig,
        LanguageModelConfig,
        TransformerConfig,
    )

    dc = lm.decoder_config
    tc = dc.transformer_config
    if not 0 < num_layers <= len(tc.layer_configs):
        raise ValueError(f"num_layers must be in [1, {len(tc.layer_configs)}]")
    for lc in tc.layer_configs[:num_layers]:
        src = lc.kv_source_layer_index
        if src is not None and src >= num_layers:
            raise ValueError("truncation cuts a KV-share source layer")
    cfg = LanguageModelConfig(
        decoder_config=DecoderConfig(
            embedding_config=dc.embedding_config,
            transformer_config=TransformerConfig(
                layer_configs=tc.layer_configs[:num_layers],
                output_norm_config=tc.output_norm_config,
                model_dim=tc.model_dim,
                hidden_dim=tc.hidden_dim,
            ),
            vocab_size=dc.vocab_size,
            ple_model_config=dc.ple_model_config,
        ),
        generation_config=lm.config.generation_config,
    )
    params = dict(lm.params)
    params["layers"] = list(lm.params["layers"][:num_layers])
    return LanguageModel(
        cfg, params, max_context=lm.max_context,
        prefill_buckets=lm.prefill_buckets, mesh=lm.mesh,
        kv_quant=lm.kv_quant, ring_windows=lm.ring_windows,
    )


def self_speculative_decoder(lm, *, draft_layers: int | None = None,
                             k: int = 4, sampling=None):
    """SpeculativeDecoder whose draft is the target's own first layers
    (half the stack by default). No extra weights, no training artifact —
    the zero-dependency realistic-acceptance speculation path."""
    n = len(lm.decoder_config.transformer_config.layer_configs)
    draft = self_draft_model(lm, draft_layers or max(1, n // 2))
    return SpeculativeDecoder(
        lm, DraftModelSpeculator(draft, k=k), sampling=sampling
    )


class SpeculativeDecoder:
    """Chain-speculative generation loop over a LanguageModel."""

    def __init__(self, lm, speculator, *, sampling: SamplingParams | None = None):
        if not speculation_supported(lm.decoder_config):
            raise ValueError("chain speculation unsupported (KV-shared attention)")
        self.lm = lm
        self.speculator = speculator
        self.sampling = sampling or SamplingParams()
        self._verify_jit = {}

    def _verify_fn(self, n: int, stop_ids: tuple):
        """ONE dispatch: (k+1)-token deferred forward, a sampled token at
        every row, exact-match acceptance ON DEVICE, and a state commit
        clipped to the tokens the host loop will actually keep (first stop
        token / generation budget) — so recurrent state never needs the
        rewind that slot-addressable KV gets for free."""
        key = (n, stop_ids)
        if key not in self._verify_jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling

            @partial(jax.jit, donate_argnums=(1,))
            def verify(params, state, tokens, keys, draft_len, remaining):
                logits, pending = decoder_forward(
                    cfg, params, tokens, state, last_only=False, defer_ssm=True
                )
                sampled = jax.vmap(lambda l, k: sample(l, sampling, key=k))(
                    logits, keys
                )
                if n > 1:
                    match = (sampled[:-1] == tokens[1:]) & (
                        jnp.arange(n - 1) < draft_len
                    )
                    accepted = jnp.sum(jnp.cumprod(match.astype(jnp.int32)))
                else:
                    accepted = jnp.zeros((), jnp.int32)
                emit_len = 1 + accepted  # tokens the host emit loop covers
                commit = emit_len
                if stop_ids:
                    rows = jnp.arange(n)
                    is_stop = jnp.zeros(n, bool)
                    for t in stop_ids:
                        is_stop = is_stop | (sampled == t)
                    first_stop = jnp.min(
                        jnp.where(is_stop & (rows < emit_len), rows, n)
                    )
                    commit = jnp.minimum(commit, first_stop + 1)
                commit = jnp.minimum(commit, remaining)
                new_state = decoder_commit_deferred(cfg, pending, commit)
                return new_state, sampled, accepted, commit

            self._verify_jit[key] = verify
        return self._verify_jit[key]

    def generate(
        self,
        prompt_tokens,
        max_new_tokens: int,
        stop_token_ids=None,
        seed: int = 0,
        metrics: SpeculationMetrics | None = None,
        state=None,
        history_tokens=None,
    ):
        """Returns a SpecStream (iterable of token ids; `.state` carries the
        final decoding state for prefix-cached sessions). `state` resumes an
        existing state — prompt_tokens are then the uncovered suffix;
        `history_tokens` gives the speculator the full token history."""
        return SpecStream(self, prompt_tokens, max_new_tokens, stop_token_ids,
                          seed, metrics, state, history_tokens)

    def _generate_impl(
        self,
        prompt_tokens,
        max_new_tokens: int,
        stop_token_ids,
        seed: int,
        metrics: SpeculationMetrics | None,
        init_state,
        history_tokens,
        out,
    ):
        lm = self.lm
        stop = set(
            stop_token_ids
            if stop_token_ids is not None
            else lm.config.generation_config.stop_token_ids
        )
        if hasattr(self.speculator, "reset"):
            self.speculator.reset()
        history = [int(t) for t in (history_tokens if history_tokens is not None
                                    else prompt_tokens)]
        state = init_state if init_state is not None else lm.new_state()
        start = int(state["pos"])
        logits, state = lm.prefill(state, np.asarray(prompt_tokens, np.int32))
        first = int(jnp.argmax(logits)) if self.sampling.is_greedy else int(
            sample(logits, self.sampling, key=jax.random.PRNGKey(seed))
        )
        pos = start + len(prompt_tokens)  # tokens covered by KV
        base = pos
        produced = 0
        token = first
        # pool must exceed the wrap point (len - 32) by the largest block, so
        # a small max_new_tokens can't drive the wrap modulus non-positive
        keys = jax.random.split(
            jax.random.PRNGKey(seed ^ 0xD15C), max(max_new_tokens * 4 + 8, 72)
        )
        key_i = 0

        while produced < max_new_tokens:
            yield token
            history.append(token)
            produced += 1
            if token in stop or produced >= max_new_tokens:
                break  # budget exhausted: the next verify's commit would
                # clip to 0 — a pure wasted dispatch (and possibly a fresh
                # n_pad executable compile)
            out.state = None  # invalidated while a round is in flight
            room = lm.max_context - pos - 1
            if room <= 0:
                break
            draft = list(self.speculator.propose(history)) if room > 1 else []
            # clip to room/budget AND the padded-block cap (a speculator
            # configured with k >= 32 must not overflow the 32-row block)
            draft = draft[: min(len(draft), room - 1,
                                max_new_tokens - produced, (1 << 5) - 1)]
            n = 1 + len(draft)
            # pad draft block to a bucketed size (bounded executables)
            n_pad = 1
            while n_pad < n:
                n_pad *= 2
            n_pad = min(n_pad, 1 << 5)
            block = np.zeros(n_pad, np.int32)
            block[0] = token
            block[1 : 1 + len(draft)] = draft

            verify = self._verify_fn(n_pad, tuple(sorted(stop)))
            state, sampled, accepted_d, commit_d = verify(
                lm.params,
                state,
                jnp.asarray(block),
                keys[key_i : key_i + n_pad],
                jnp.asarray(len(draft), jnp.int32),
                jnp.asarray(max_new_tokens - produced, jnp.int32),
            )
            key_i = (key_i + n_pad) % (len(keys) - 32)
            vals, accepted, commit = jax.device_get((sampled, accepted_d, commit_d))
            accepted = int(accepted)
            if metrics is not None:
                metrics.num_verify_passes += 1
                metrics.num_tokens_proposed += len(draft)

            emit = [int(v) for v in vals[: accepted + 1]]
            if metrics is not None:
                metrics.num_tokens_accepted += accepted

            # the dispatch committed exactly the tokens the emit loop below
            # will keep: 1 + accepted, clipped at the first stop token and
            # the generation budget (attention: pos; recurrent: replayed
            # prefix state). Host mirrors the committed position.
            pos = pos + int(commit)

            for i, v in enumerate(emit[:-1]):
                yield v
                history.append(v)
                produced += 1
                if v in stop or produced >= max_new_tokens:
                    state["pos"] = jnp.asarray(base + produced - 1, jnp.int32)
                    out.state = state
                    return
            token = emit[-1]
        # the state covers every yielded token except the final in-flight one
        state["pos"] = jnp.asarray(base + max(0, produced - 1), jnp.int32)
        out.state = state


class SpecStream:
    """Iterable of speculatively decoded tokens; `.state` holds the final
    decoding state after iteration completes (session prefix cache)."""

    def __init__(self, decoder, prompt_tokens, max_new_tokens, stop_token_ids,
                 seed, metrics, state, history_tokens):
        self.state = None
        self._gen = decoder._generate_impl(
            prompt_tokens, max_new_tokens, stop_token_ids, seed, metrics,
            state, history_tokens, self,
        )

    def __iter__(self):
        return self._gen

    def __next__(self):
        return next(self._gen)


# --------------------------------------------------------------------------
# Tree speculation (reference: Weaver + BatchTopology + trie accept,
# weaver.rs:32-139, batch_topology.rs, trie.rs:26-248)
# --------------------------------------------------------------------------


class TokenTree:
    """Host-side linearized token tree (the reference's FlatTrie): node 0 is
    the root (current token); parents[i] < i."""

    def __init__(self, root_token: int):
        self.tokens: list[int] = [int(root_token)]
        self.parents: list[int] = [-1]

    def add(self, parent: int, token: int) -> int:
        self.tokens.append(int(token))
        self.parents.append(int(parent))
        return len(self.tokens) - 1

    def add_chain(self, parent: int, tokens) -> None:
        for t in tokens:
            parent = self.add(parent, t)

    def __len__(self) -> int:
        return len(self.tokens)

    def depths(self) -> list[int]:
        out = [0] * len(self.tokens)
        for i, p in enumerate(self.parents):
            if p >= 0:
                out[i] = out[p] + 1
        return out

    def ancestor_mask(self, size: int) -> np.ndarray:
        """[size, size] bool: mask[q, k] = node k is q or an ancestor of q
        (padded region: self-visibility only, keeps softmax finite). Trees
        larger than `size` contribute only their first `size` nodes —
        parents always precede children, so the truncation is a valid
        forest (the verify equally clips to its padded block)."""
        n = min(len(self.tokens), size)
        mask = np.zeros((size, size), bool)
        for i in range(n):
            j = i
            while j >= 0:
                mask[i, j] = True
                j = self.parents[j]
        for i in range(n, size):
            mask[i, i] = True
        return mask

    def children(self, node: int) -> list[int]:
        return [i for i, p in enumerate(self.parents) if p == node]


class NgramTreeSpeculator:
    """Builds a tree by merging up to `branches` distinct n-gram
    continuations of the recent history into a prefix trie."""

    def __init__(self, max_ngram: int = 3, depth: int = 4, branches: int = 3):
        self.max_ngram = max_ngram
        self.depth = depth
        self.branches = branches

    def reset(self):
        pass

    def propose(self, history: list[int], root_token: int) -> TokenTree:
        tree = TokenTree(root_token)
        h = history + [root_token]
        candidates: list[list[int]] = []
        for n in range(self.max_ngram, 0, -1):
            if len(h) < n + 1:
                continue
            suffix = h[-n:]
            for start in range(len(h) - n - 1, -1, -1):
                if h[start : start + n] == suffix:
                    cont = h[start + n : start + n + self.depth]
                    if cont and cont not in candidates:
                        candidates.append(cont)
                if len(candidates) >= self.branches:
                    break
            if len(candidates) >= self.branches:
                break
        # merge candidates into the trie (longest first for prefix sharing)
        for cand in sorted(candidates, key=len, reverse=True):
            node = 0
            for tok in cand:
                nxt = next(
                    (c for c in tree.children(node) if tree.tokens[c] == tok), None
                )
                node = nxt if nxt is not None else tree.add(node, tok)
        return tree


def _deferred_tree_accept_fn(lcs):
    """Jitted combined accept for tree verification on models WITH recurrent
    mixers (shared by TreeSpeculativeDecoder and DFlashSpeculativeDecoder):
    compact attention rows at the pending write base AND replay recurrent
    state over just the accepted path (ssm_tree_commit)."""
    from ..models.ssm import ssm_tree_commit

    @partial(jax.jit, donate_argnums=(0,))
    def accept(pending, idx, path_idx, conv_commit, new_pos):
        pos0 = pending["pos"]

        def fix(cache):
            if cache is None or ("k" not in cache and "k_q" not in cache):
                return cache
            out = dict(cache)
            for name in ("k", "v", "k_q", "v_q", "k_s", "v_s"):
                if name not in cache:
                    continue
                buf = cache[name]
                rows = buf[pos0 + idx]
                out[name] = jax.lax.dynamic_update_slice(
                    buf, rows, (pos0,) + (0,) * (buf.ndim - 1)
                )
            return out

        layers = []
        for lc, entry in zip(lcs, pending["layers"]):
            if isinstance(lc.mixer_config, AttentionConfig):
                layers.append(fix(entry))
            else:
                layers.append(ssm_tree_commit(
                    lc.mixer_config, entry, path_idx,
                    conv_commit[lc.mixer_config.kernel_size]))
        return {"layers": layers, "pos": new_pos}

    return accept


def _tree_conv_windows(parents: np.ndarray, k: int) -> np.ndarray:
    """[M, K] i32: each node's causal-conv tap sources, linearized into
    concat([conv state rows (k-1, oldest first), node input rows (M)]).
    Tap k-1 is the node itself; earlier taps walk the ancestor chain and
    spill into the conv state tail past the root."""
    m = len(parents)
    src = np.zeros((m, k), np.int32)
    for j in range(m):
        chain = []
        c = j
        while c >= 0 and len(chain) < k:
            chain.append(c)
            c = parents[c]
        for t in range(k):
            back = k - 1 - t  # steps back from node j
            if back < len(chain):
                src[j, t] = (k - 1) + chain[back]
            else:
                src[j, t] = (k - 2) - (back - len(chain))
    return src


def _tree_conv_commit_idx(parents: np.ndarray, last: int, k: int) -> np.ndarray:
    """[k-1] i32: the committed conv state's rows (oldest first) — the last
    k-1 inputs along the accepted path ending at node `last`, same
    linearization as _tree_conv_windows."""
    out = np.zeros(max(k - 1, 0), np.int32)
    chain = []
    c = last
    while c >= 0 and len(chain) < k - 1:
        chain.append(c)
        c = parents[c]
    for i in range(k - 1):
        back = k - 2 - i
        if back < len(chain):
            out[i] = (k - 1) + chain[back]
        else:
            out[i] = (k - 2) - (back - len(chain))
    return out


class TreeSpeculativeDecoder:
    """Tree-speculative generation: one dispatch verifies a whole token tree;
    the host walks the accept path (sampled token must match the child);
    accepted nodes' KV rows are compacted to consecutive position slots (the
    reference's encode_accept / KVCacheUpdate, attention/state.rs:187-249).

    Recurrent mixers (GDN/Mamba2/ShortConv) verify over the tree too — the
    reference's delta_net/tree_verify.rs + ShortConvTrieKernel capability:
    the verify forward runs each mixer's recurrence ALONG ANCESTOR EDGES
    (ssm_tree_forward: host-linearized conv windows, parent-indexed state
    buffer) without committing, and the accept dispatch replays the state
    over just the accepted path (ssm_tree_commit) while compacting the
    attention rows."""

    def __init__(self, lm, speculator=None, *, sampling: SamplingParams | None = None,
                 max_nodes: int = 16):
        if not speculation_supported(lm.decoder_config):
            raise ValueError("tree speculation unsupported (KV-shared attention)")
        if getattr(lm, "ring_windows", False):
            raise ValueError("tree speculation requires the full KV layout")
        self.lm = lm
        self.speculator = speculator or NgramTreeSpeculator()
        self.sampling = sampling or SamplingParams()
        self.max_nodes = max_nodes
        lcs = lm.decoder_config.transformer_config.layer_configs
        self._recurrent = any(
            not isinstance(lc.mixer_config, AttentionConfig) for lc in lcs
        )
        self._kernel_sizes = sorted({
            lc.mixer_config.kernel_size for lc in lcs
            if not isinstance(lc.mixer_config, AttentionConfig)
        })
        self._verify_jit = {}
        self._accept_jit = {}

    def _verify_fn(self, m: int):
        if m not in self._verify_jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling

            @partial(jax.jit, donate_argnums=(1,))
            def verify(params, state, tokens, positions, tree_mask, keys):
                logits, state = decoder_forward(
                    cfg, params, tokens, state, last_only=False,
                    positions=positions, tree_mask=tree_mask,
                )
                sampled = jax.vmap(lambda l, k: sample(l, sampling, key=k))(logits, keys)
                return state, sampled

            self._verify_jit[m] = verify
        return self._verify_jit[m]

    def _verify_fn_deferred(self, m: int):
        """Tree verify for models WITH recurrent mixers: attention rows
        land at suffix slots (pos untouched), recurrent layers run along
        ancestor edges and return replay aux; nothing commits until the
        host picks the accept path."""
        key = ("deferred", m)
        if key not in self._verify_jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling

            @partial(jax.jit, donate_argnums=(1,))
            def verify(params, state, tokens, positions, tree_mask, keys,
                       parents, conv_src):
                logits, pending = decoder_forward(
                    cfg, params, tokens, state, last_only=False,
                    positions=positions, tree_mask=tree_mask, defer_ssm=True,
                    tree_parents=parents, tree_conv_src=conv_src,
                )
                sampled = jax.vmap(lambda l, k: sample(l, sampling, key=k))(
                    logits, keys)
                return pending, sampled

            self._verify_jit[key] = verify
        return self._verify_jit[key]

    def _accept_fn_deferred(self):
        """Combined accept: compact attention rows (write base = pending
        pos, unchanged by the deferred verify) AND replay recurrent state
        over the accepted path."""
        key = "accept_deferred"
        if key not in self._accept_jit:
            self._accept_jit[key] = _deferred_tree_accept_fn(
                self.lm.decoder_config.transformer_config.layer_configs)
        return self._accept_jit[key]

    def _accept_fn(self, m: int, a: int):
        """Compact accepted node rows (slots pos0+idx) to consecutive slots
        pos0..pos0+a, then set pos. pos0 is the verify dispatch's WRITE
        base: the verify forward advanced state pos by its m rows, so the
        original base is pos - m (an off-by-m here silently turns the
        compaction into a no-op on the live region — caught by the
        non-consecutive-acceptance regression test)."""
        key = (m, a)
        if key not in self._accept_jit:

            @partial(jax.jit, donate_argnums=(0,))
            def accept(state, idx, new_pos):
                pos0 = state["pos"] - m

                def fix(cache):
                    if cache is None or "k" not in cache and "k_q" not in cache:
                        return cache
                    out = dict(cache)
                    for name in ("k", "v", "k_q", "v_q", "k_s", "v_s"):
                        if name not in cache:
                            continue
                        buf = cache[name]
                        rows = buf[pos0 + idx]  # gather accepted rows [A, ...]
                        out[name] = jax.lax.dynamic_update_slice(
                            buf, rows, (pos0,) + (0,) * (buf.ndim - 1)
                        )
                    return out

                layers = [fix(l) for l in state["layers"]]
                new_state = dict(state, layers=layers, pos=new_pos)
                return new_state

            self._accept_jit[key] = accept
        return self._accept_jit[key]

    def generate(
        self,
        prompt_tokens,
        max_new_tokens: int,
        stop_token_ids=None,
        seed: int = 0,
        metrics: SpeculationMetrics | None = None,
    ):
        lm = self.lm
        stop = set(
            stop_token_ids
            if stop_token_ids is not None
            else lm.config.generation_config.stop_token_ids
        )
        self.speculator.reset()
        history = [int(t) for t in prompt_tokens]
        state = lm.new_state()
        logits, state = lm.prefill(state, np.asarray(prompt_tokens, np.int32))
        token = int(
            sample(logits, self.sampling, key=jax.random.PRNGKey(seed))
        )
        pos = len(history)
        produced = 0
        keys = jax.random.split(jax.random.PRNGKey(seed ^ 0x7EEE), 4096)
        key_i = 0

        while produced < max_new_tokens:
            yield token
            history.append(token)
            produced += 1
            if token in stop or produced >= max_new_tokens:
                return
            if pos + self.max_nodes + 1 > lm.max_context:
                return
            tree = self.speculator.propose(history[:-1], token)
            m_real = min(len(tree), self.max_nodes)
            # pad node count to a bucketed size
            m = 1
            while m < m_real:
                m *= 2
            m = min(m, self.max_nodes)

            tokens = np.zeros(m, np.int32)
            tokens[:m_real] = tree.tokens[:m_real]
            depths = tree.depths()[:m_real]
            positions = np.full(m, pos + 63, np.int32)  # pad rows: far future
            positions[:m_real] = [pos + d for d in depths]
            mask = tree.ancestor_mask(m)

            parents_np = None
            if self._recurrent:
                parents_np = np.arange(-1, m - 1, dtype=np.int32)
                parents_np[:m_real] = tree.parents[:m_real]
                conv_src = {
                    k: jnp.asarray(_tree_conv_windows(parents_np, k))
                    for k in self._kernel_sizes
                }
                verify = self._verify_fn_deferred(m)
                state, sampled = verify(
                    lm.params, state, jnp.asarray(tokens),
                    jnp.asarray(np.minimum(positions, lm.max_context - 1)),
                    jnp.asarray(mask), keys[key_i : key_i + m],
                    jnp.asarray(parents_np), conv_src,
                )
            else:
                verify = self._verify_fn(m)
                state, sampled = verify(
                    lm.params, state, jnp.asarray(tokens),
                    jnp.asarray(np.minimum(positions, lm.max_context - 1)),
                    jnp.asarray(mask), keys[key_i : key_i + m],
                )
            key_i = (key_i + m) % (len(keys) - self.max_nodes)
            vals = np.asarray(jax.device_get(sampled))
            if metrics is not None:
                metrics.num_verify_passes += 1
                metrics.num_tokens_proposed += m_real - 1

            # host accept walk (trie.rs:211): follow children matching the
            # sampled token at each accepted node
            path = [0]
            node = 0
            while True:
                want = int(vals[node])
                nxt = next(
                    (c for c in tree.children(node)
                     if c < m_real and tree.tokens[c] == want),
                    None,
                )
                if nxt is None:
                    break
                path.append(nxt)
                node = nxt
            accepted = len(path) - 1  # nodes beyond the root
            if metrics is not None:
                metrics.num_tokens_accepted += accepted

            emit = [int(vals[n]) for n in path]  # sampled at each path node

            # compact accepted rows to consecutive slots; root is already at
            # slot pos (index 0)
            a = len(path)
            idx = np.zeros(self.max_nodes, np.int32)
            idx[:a] = path
            idx[a:] = path[-1]
            new_pos = pos + a
            if self._recurrent:
                path_idx = np.full(self.max_nodes, -1, np.int32)
                path_idx[:a] = path
                conv_commit = {
                    k: jnp.asarray(_tree_conv_commit_idx(parents_np, path[-1], k))
                    for k in self._kernel_sizes
                }
                state = self._accept_fn_deferred()(
                    state, jnp.asarray(idx), jnp.asarray(path_idx),
                    conv_commit, jnp.asarray(new_pos, jnp.int32))
            else:
                accept = self._accept_fn(m, self.max_nodes)
                state = accept(state, jnp.asarray(idx), jnp.asarray(new_pos, jnp.int32))
            pos = new_pos

            for v in emit[:-1]:
                yield v
                history.append(v)
                produced += 1
                if v in stop or produced >= max_new_tokens:
                    return
            token = emit[-1]


class DFlashSpeculativeDecoder:
    """Tree speculation driven by a DFlash draft (speculators/dflash_tfm.rs):
    the target forward collects hidden-feature taps; accepted tokens'
    features are written into the draft's KV (dflash.accept); each step the
    draft predicts the whole lookahead block in one dispatch and the
    per-depth top-k candidates are assembled host-side into a tree (the
    weaver's role), verified by the target like TreeSpeculativeDecoder."""

    def __init__(self, lm, dflash, *, sampling: SamplingParams | None = None,
                 max_nodes: int = 16, children: int = 2):
        if not speculation_supported(lm.decoder_config):
            raise ValueError("speculation unsupported (KV-shared attention)")
        if getattr(lm, "ring_windows", False):
            raise ValueError("tree speculation requires the full KV layout")
        self.lm = lm
        self.dflash = dflash
        self.sampling = sampling or SamplingParams()
        self.max_nodes = max_nodes
        self.children = children
        self.taps = tuple(dflash.cfg.target_layer_ids)
        lcs = lm.decoder_config.transformer_config.layer_configs
        # hybrid (recurrent-mixer) targets verify along ancestor edges with
        # deferred commit + path replay, exactly like TreeSpeculativeDecoder
        self._recurrent = any(
            not isinstance(lc.mixer_config, AttentionConfig) for lc in lcs
        )
        self._kernel_sizes = sorted({
            lc.mixer_config.kernel_size for lc in lcs
            if not isinstance(lc.mixer_config, AttentionConfig)
        })
        self._jit = {}

    def _prefill_fn(self, chunk: int):
        key = ("prefill", chunk)
        if key not in self._jit:
            cfg = self.lm.decoder_config
            taps = self.taps

            @partial(jax.jit, donate_argnums=(1,))
            def prefill(params, state, tokens, n):
                logits, state, feats = decoder_forward(
                    cfg, params, tokens, state, last_only=True, true_length=n,
                    collect_layers=taps,
                )
                return logits[0], state, feats

            self._jit[key] = prefill
        return self._jit[key]

    def _verify_fn(self, m: int):
        key = ("verify", m)
        if key not in self._jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling
            taps = self.taps

            @partial(jax.jit, donate_argnums=(1,))
            def verify(params, state, tokens, positions, tree_mask, keys):
                logits, state, feats = decoder_forward(
                    cfg, params, tokens, state, last_only=False,
                    positions=positions, tree_mask=tree_mask, collect_layers=taps,
                )
                sampled = jax.vmap(lambda l, k: sample(l, sampling, key=k))(logits, keys)
                return state, sampled, feats

            self._jit[key] = verify
        return self._jit[key]

    def _verify_fn_deferred(self, m: int):
        """DFlash tree verify on hybrid targets: feature taps ride the same
        deferred forward the recurrent tree verify uses (attention rows at
        suffix slots, recurrent layers along ancestor edges, nothing
        committed until the host picks the path)."""
        key = ("verify_deferred", m)
        if key not in self._jit:
            cfg = self.lm.decoder_config
            sampling = self.sampling
            taps = self.taps

            @partial(jax.jit, donate_argnums=(1,))
            def verify(params, state, tokens, positions, tree_mask, keys,
                       parents, conv_src):
                logits, pending, feats = decoder_forward(
                    cfg, params, tokens, state, last_only=False,
                    positions=positions, tree_mask=tree_mask,
                    collect_layers=taps, defer_ssm=True,
                    tree_parents=parents, tree_conv_src=conv_src,
                )
                sampled = jax.vmap(lambda l, k: sample(l, sampling, key=k))(
                    logits, keys)
                return pending, sampled, feats

            self._jit[key] = verify
        return self._jit[key]

    def _accept_fn_deferred(self):
        key = "accept_deferred"
        if key not in self._jit:
            self._jit[key] = _deferred_tree_accept_fn(
                self.lm.decoder_config.transformer_config.layer_configs)
        return self._jit[key]

    def _accept_fn(self, m: int, a: int):
        key = ("accept", m, a)
        if key not in self._jit:

            @partial(jax.jit, donate_argnums=(0,))
            def accept(state, idx, new_pos):
                # write base of the verify dispatch (its forward advanced
                # pos by the m tree rows) — see TreeSpeculativeDecoder
                pos0 = state["pos"] - m

                def fix(cache):
                    if cache is None:
                        return cache
                    out = dict(cache)
                    for name in ("k", "v", "k_q", "v_q", "k_s", "v_s"):
                        if name not in cache:
                            continue
                        buf = cache[name]
                        rows = buf[pos0 + idx]
                        out[name] = jax.lax.dynamic_update_slice(
                            buf, rows, (pos0,) + (0,) * (buf.ndim - 1)
                        )
                    return out

                layers = [fix(l) for l in state["layers"]]
                return dict(state, layers=layers, pos=new_pos)

            self._jit[key] = accept
        return self._jit[key]

    def _build_tree(self, root_token: int, ids, vals) -> "TokenTree":
        """Host weaver: chain of top-1 candidates with top-`children`
        branches at each depth, bounded by max_nodes."""
        tree = TokenTree(root_token)
        parent = 0
        for depth in range(ids.shape[0]):
            if len(tree) >= self.max_nodes:
                break
            row = ids[depth]
            first = None
            for c in range(min(self.children, row.shape[0])):
                if len(tree) >= self.max_nodes:
                    break
                node = tree.add(parent, int(row[c]))
                if first is None:
                    first = node
            if first is None:
                break
            parent = first  # chain continues through the top-1 candidate
        return tree

    def generate(self, prompt_tokens, max_new_tokens: int, stop_token_ids=None,
                 seed: int = 0, metrics: SpeculationMetrics | None = None):
        lm = self.lm
        stop = set(
            stop_token_ids if stop_token_ids is not None
            else lm.config.generation_config.stop_token_ids
        )
        state = lm.new_state()
        dstate = self.dflash.new_state()
        ecfg = lm.decoder_config.embedding_config
        eparams = lm.params["embedding"]

        # chunked prefill with feature taps feeding the draft KV
        prompt = [int(t) for t in prompt_tokens]
        chunk = max(lm.prefill_buckets)
        logits = None
        i = 0
        while i < len(prompt):
            take = min(chunk, len(prompt) - i)
            padded = np.zeros(chunk, np.int32)
            padded[:take] = prompt[i : i + take]
            logits, state, feats = self._prefill_fn(chunk)(
                lm.params, state, jnp.asarray(padded), jnp.asarray(take, jnp.int32)
            )
            dstate = self.dflash.accept(dstate, feats, take)
            i += take

        token = int(sample(logits, self.sampling, key=jax.random.PRNGKey(seed)))
        pos = len(prompt)
        produced = 0
        keys = jax.random.split(jax.random.PRNGKey(seed ^ 0xDF1A), 4096)
        key_i = 0

        while produced < max_new_tokens:
            yield token
            produced += 1
            if token in stop or produced >= max_new_tokens:
                return
            if pos + self.max_nodes + 1 > lm.max_context:
                return

            ids, vals = self.dflash.draft(
                dstate, eparams, ecfg, token, candidate_count=self.children
            )
            tree = self._build_tree(token, ids, vals)
            m_real = min(len(tree), self.max_nodes)
            m = 1
            while m < m_real:
                m *= 2
            m = min(m, self.max_nodes)

            tokens = np.zeros(m, np.int32)
            tokens[:m_real] = tree.tokens[:m_real]
            depths = tree.depths()[:m_real]
            positions = np.full(m, pos, np.int32)
            positions[:m_real] = [pos + d for d in depths]
            mask = tree.ancestor_mask(m)

            parents_np = None
            if self._recurrent:
                parents_np = np.arange(-1, m - 1, dtype=np.int32)
                parents_np[:m_real] = tree.parents[:m_real]
                conv_src = {
                    k: jnp.asarray(_tree_conv_windows(parents_np, k))
                    for k in self._kernel_sizes
                }
                state, sampled, feats = self._verify_fn_deferred(m)(
                    lm.params, state, jnp.asarray(tokens),
                    jnp.asarray(np.minimum(positions, lm.max_context - 1)),
                    jnp.asarray(mask), keys[key_i : key_i + m],
                    jnp.asarray(parents_np), conv_src,
                )
            else:
                state, sampled, feats = self._verify_fn(m)(
                    lm.params, state, jnp.asarray(tokens),
                    jnp.asarray(np.minimum(positions, lm.max_context - 1)),
                    jnp.asarray(mask), keys[key_i : key_i + m],
                )
            key_i = (key_i + m) % (len(keys) - self.max_nodes)
            vals_s = np.asarray(jax.device_get(sampled))
            if metrics is not None:
                metrics.num_verify_passes += 1
                metrics.num_tokens_proposed += m_real - 1

            path = [0]
            node = 0
            while True:
                want = int(vals_s[node])
                nxt = next((c for c in tree.children(node)
                            if c < m_real and tree.tokens[c] == want), None)
                if nxt is None:
                    break
                path.append(nxt)
                node = nxt
            accepted = len(path) - 1
            if metrics is not None:
                metrics.num_tokens_accepted += accepted
            emit = [int(vals_s[n]) for n in path]

            a = len(path)
            idx = np.zeros(self.max_nodes, np.int32)
            idx[:a] = path
            idx[a:] = path[-1]
            new_pos = pos + a
            if self._recurrent:
                path_idx = np.full(self.max_nodes, -1, np.int32)
                path_idx[:a] = path
                conv_commit = {
                    k: jnp.asarray(_tree_conv_commit_idx(parents_np, path[-1], k))
                    for k in self._kernel_sizes
                }
                state = self._accept_fn_deferred()(
                    state, jnp.asarray(idx), jnp.asarray(path_idx),
                    conv_commit, jnp.asarray(new_pos, jnp.int32))
            else:
                state = self._accept_fn(m, self.max_nodes)(
                    state, jnp.asarray(idx), jnp.asarray(new_pos, jnp.int32)
                )
            # feed accepted nodes' target features to the draft KV
            packed = jnp.take(feats, jnp.asarray(idx), axis=0)
            dstate = self.dflash.accept(dstate, packed, a)
            pos = new_pos

            for v in emit[:-1]:
                yield v
                produced += 1
                if v in stop or produced >= max_new_tokens:
                    return
            token = emit[-1]

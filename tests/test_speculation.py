"""Speculative decoding tests.

The load-bearing invariant (reference: trie.rs accept-path semantics):
speculative generation with ANY speculator must emit exactly the same
tokens as plain greedy generation — speculation changes latency, never
output. Checked for ngram and draft-model speculators, plus rollback
across stop/partial-acceptance and the metrics counters.
"""

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.speculation import (
    DraftModelSpeculator,
    NgramSpeculator,
    SpeculationMetrics,
    SpeculativeDecoder,
    speculation_supported,
)
from uzu_tpu.tools.synth import lfm2_config, llama_config, synthesize


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    return synthesize(cfg, str(tmp_path_factory.mktemp("spec_target")), seed=7, dtype=np.float32)


@pytest.fixture(scope="module")
def draft_dir(tmp_path_factory):
    # same family, smaller; seeded the same so early layers correlate a bit
    cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                       num_groups=1, head_dim=16, vocab_size=256)
    return synthesize(cfg, str(tmp_path_factory.mktemp("spec_draft")), seed=7, dtype=np.float32)


@pytest.fixture(scope="module")
def target(target_dir):
    return LanguageModel.from_dir(target_dir, max_context=128, prefill_buckets=(16,))


def test_ngram_speculator_proposes_continuations():
    s = NgramSpeculator(max_ngram=2, k=3)
    # history: "1 2 3 4 1 2" -> suffix (1,2) seen before, propose 3,4,1
    assert s.propose([1, 2, 3, 4, 1, 2]) == [3, 4, 1]
    assert s.propose([9, 8, 7]) == []


def test_speculative_equals_plain_greedy_ngram(target):
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    want = target.generate_list(prompt, 24, stop_token_ids=[])
    dec = SpeculativeDecoder(target, NgramSpeculator(max_ngram=3, k=4))
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0


def test_speculative_equals_plain_greedy_draft(target, draft_dir):
    draft = LanguageModel.from_dir(draft_dir, max_context=128, prefill_buckets=(16,))
    prompt = np.array([5, 6, 7, 8])
    want = target.generate_list(prompt, 20, stop_token_ids=[])
    dec = SpeculativeDecoder(target, DraftModelSpeculator(draft, k=4))
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 20, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_tokens_proposed > 0


def test_speculative_respects_stop_tokens(target):
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    plain = target.generate_list(prompt, 24, stop_token_ids=[])
    stop = plain[5]
    want = target.generate_list(prompt, 24, stop_token_ids=[stop])
    dec = SpeculativeDecoder(target, NgramSpeculator(max_ngram=3, k=4))
    got = list(dec.generate(prompt, 24, stop_token_ids=[stop]))
    assert got == want
    assert got[-1] == stop


def test_recurrent_speculation_gates(tmp_path):
    """Chain, tree, AND draft-model speculation all work on recurrent
    mixers (deferred commit + ancestor-edge recurrence; hybrid drafts
    chain on a discarded functional view). Only KV-shared attention is
    excluded anywhere."""
    from uzu_tpu.engine.speculation import (
        TreeSpeculativeDecoder,
        tree_speculation_supported,
    )

    d = synthesize(lfm2_config(), str(tmp_path / "lfm2"), seed=1)
    lm = LanguageModel.from_dir(d, max_context=64)
    assert speculation_supported(lm.decoder_config)
    assert not tree_speculation_supported(lm.decoder_config)
    SpeculativeDecoder(lm, NgramSpeculator())  # allowed
    dec = TreeSpeculativeDecoder(lm)  # allowed (deferred tree verify)
    assert dec._recurrent
    spec = DraftModelSpeculator(lm)  # allowed (functional-view chain)
    assert spec._hybrid


def _hybrid_lm(tmp_path, name: str):
    from uzu_tpu.tools.synth import (
        lfm2_config,
        mamba2_hybrid_config,
        qwen35_config,
    )

    cfg = {"qwen35": qwen35_config, "lfm2": lfm2_config,
           "mamba2": mamba2_hybrid_config}[name]()
    d = synthesize(cfg, str(tmp_path / name), seed=3)
    return LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))


@pytest.mark.parametrize("family", ["qwen35", "lfm2", "mamba2"])
def test_chain_speculation_recurrent_bit_exact(tmp_path, family):
    """Speculative == plain decoding on recurrent-mixer hybrids: the
    deferred-commit replay must reproduce the plain per-token state
    stream exactly (reference capability: delta_net/tree_verify.rs,
    short_conv.rs trie — Qwen3.5-class hybrids get speculation)."""
    lm = _hybrid_lm(tmp_path, family)
    prompt = np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2])
    want = lm.generate_list(prompt, 24, stop_token_ids=[])
    dec = SpeculativeDecoder(lm, NgramSpeculator(max_ngram=3, k=4))
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0


def test_chain_speculation_recurrent_stop_and_budget(tmp_path):
    """Mid-acceptance stop tokens and the generation budget clip the
    on-device commit: every exit path leaves the recurrent state covering
    exactly the emitted tokens (no rewind exists for scanned state)."""
    lm = _hybrid_lm(tmp_path, "qwen35")
    prompt = np.array([1, 2, 3] * 5)
    plain = lm.generate_list(prompt, 24, stop_token_ids=[])
    stop = plain[7]
    want = lm.generate_list(prompt, 24, stop_token_ids=[stop])
    dec = SpeculativeDecoder(lm, NgramSpeculator(max_ngram=3, k=4))
    got = list(dec.generate(prompt, 24, stop_token_ids=[stop]))
    assert got == want and got[-1] == stop
    # budget exactly mid-round
    want5 = lm.generate_list(prompt, 5, stop_token_ids=[])
    got5 = list(dec.generate(prompt, 5, stop_token_ids=[]))
    assert got5 == want5 and len(got5) == 5


@pytest.mark.parametrize("family", ["qwen35", "lfm2", "mamba2"])
def test_tree_speculation_recurrent_bit_exact(tmp_path, family):
    """TREE speculation on recurrent-mixer hybrids (the reference's
    delta_net/tree_verify.rs + ShortConvTrieKernel capability): the
    ancestor-edge recurrence + path replay must emit exactly the plain
    greedy stream."""
    from uzu_tpu.engine.speculation import (
        NgramTreeSpeculator,
        TreeSpeculativeDecoder,
    )

    lm = _hybrid_lm(tmp_path, family)
    prompt = np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2])
    want = lm.generate_list(prompt, 20, stop_token_ids=[])
    dec = TreeSpeculativeDecoder(
        lm, NgramTreeSpeculator(max_ngram=3, depth=3, branches=2),
        max_nodes=8)
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 20, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0


def test_tree_recurrent_nonconsecutive_path_state(tmp_path):
    """Forced acceptance of a NON-first branch on a GDN hybrid: the
    replayed recurrent state + compacted attention rows must continue
    exactly like a teacher-forced prefill of the accepted sequence."""
    import jax
    import jax.numpy as jnp

    from uzu_tpu.engine.speculation import (
        NgramTreeSpeculator,
        TokenTree,
        TreeSpeculativeDecoder,
        _tree_conv_commit_idx,
        _tree_conv_windows,
    )

    lm = _hybrid_lm(tmp_path, "qwen35")
    prompt = np.array([5, 9, 2, 7])
    state = lm.new_state()
    _, state = lm.prefill(state, prompt)
    pos = len(prompt)

    root, b_wrong, b_right, b_right2 = 11, 22, 33, 44
    tree = TokenTree(root)
    tree.add(0, b_wrong)
    n2 = tree.add(0, b_right)
    tree.add(n2, b_right2)
    m = 4
    positions = np.array([pos + d for d in tree.depths()], np.int32)
    parents_np = np.asarray(tree.parents, np.int32)

    dec = TreeSpeculativeDecoder(lm, NgramTreeSpeculator(), max_nodes=8)
    assert dec._recurrent
    conv_src = {k: jnp.asarray(_tree_conv_windows(parents_np, k))
                for k in dec._kernel_sizes}
    keys = jax.random.split(jax.random.PRNGKey(0), m)
    pending, _ = dec._verify_fn_deferred(m)(
        lm.params, state, jnp.asarray(np.array(tree.tokens, np.int32)),
        jnp.asarray(positions), jnp.asarray(tree.ancestor_mask(m)), keys,
        jnp.asarray(parents_np), conv_src,
    )
    path = [0, 2, 3]
    idx = np.full(8, path[-1], np.int32)
    idx[:3] = path
    path_idx = np.full(8, -1, np.int32)
    path_idx[:3] = path
    conv_commit = {k: jnp.asarray(_tree_conv_commit_idx(parents_np, 3, k))
                   for k in dec._kernel_sizes}
    state = dec._accept_fn_deferred()(
        pending, jnp.asarray(idx), jnp.asarray(path_idx), conv_commit,
        jnp.asarray(pos + 3, jnp.int32))

    want_state = lm.new_state()
    _, want_state = lm.prefill(
        want_state, np.concatenate([prompt, [root, b_right, b_right2]]))
    probe = np.array([77], np.int32)
    la, _ = lm.prefill(state, probe)
    lb, _ = lm.prefill(want_state, probe)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)


def test_chain_speculation_recurrent_resumable_state(tmp_path):
    """The committed state after a speculative run continues identically
    to plain decoding (session prefix-cache contract)."""
    lm = _hybrid_lm(tmp_path, "qwen35")
    prompt = np.array([1, 2, 3, 4] * 4)
    dec = SpeculativeDecoder(lm, NgramSpeculator(max_ngram=3, k=4))
    stream = dec.generate(prompt, 10, stop_token_ids=[])
    got = list(stream)
    assert stream.state is not None
    # resume: feed the last emitted token from the preserved state
    cont = dec.generate(
        np.array([got[-1]]), 8, stop_token_ids=[], state=stream.state,
        history_tokens=list(prompt) + got,
    )
    got2 = list(cont)
    want = lm.generate_list(np.concatenate([prompt, got]), 8, stop_token_ids=[])
    assert got2 == want


@pytest.mark.parametrize("family", ["qwen35", "lfm2"])
def test_draft_model_speculation_hybrid_bit_exact(tmp_path, family):
    """DraftModelSpeculator with a HYBRID draft on a HYBRID target
    (VERDICT r2 #9; ref gdn/tree_verify/tree_update_solve.metal exists so
    the speculator stack runs on GDN flagships): the hybrid draft chains
    on a discarded functional view, the committed state only ever holds
    real history — output == plain decoding bit-exact."""
    from uzu_tpu.engine.speculation import self_speculative_decoder

    lm = _hybrid_lm(tmp_path, family)
    prompt = np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2])
    want = lm.generate_list(prompt, 20, stop_token_ids=[])
    # draft_layers=1 keeps only the leading recurrent mixer — the draft
    # itself is recurrent, exercising the functional-view chain
    dec = self_speculative_decoder(lm, draft_layers=1, k=4)
    assert dec.speculator._hybrid
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 20, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0


def test_dflash_on_hybrid_target_bit_exact(tmp_path):
    """DFlash tree speculation on a GDN HYBRID target: feature taps ride
    the deferred ancestor-edge verify, accept replays the path — output
    == plain decoding even with a random draft."""
    from uzu_tpu.engine.dflash import DFlashDraft
    from uzu_tpu.engine.speculation import DFlashSpeculativeDecoder
    from uzu_tpu.tools.synth import qwen35_config, synth_dflash_speculator

    lm = _hybrid_lm(tmp_path, "qwen35")
    spec_dir = synth_dflash_speculator(str(tmp_path / "hspec"),
                                       qwen35_config(), block_size=4,
                                       target_layer_ids=(0, 1), seed=3,
                                       dtype=np.float32)
    dflash = DFlashDraft.from_dir(spec_dir, max_context=128)
    prompt = np.array([5, 6, 7, 8, 9])
    want = lm.generate_list(prompt, 16, stop_token_ids=[])
    dec = DFlashSpeculativeDecoder(lm, dflash, max_nodes=8, children=2)
    assert dec._recurrent
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 16, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0


def test_self_speculative_matches_plain(target):
    """Self-speculation (layer-truncated self-draft): no extra weights, and
    the output is bit-identical to plain decoding on a NON-repetitive
    prompt (acceptance only affects speed)."""
    from uzu_tpu.engine.speculation import (
        self_draft_model,
        self_speculative_decoder,
    )

    draft = self_draft_model(target, 1)
    # weight arrays are shared, not copied
    assert draft.params["layers"][0] is target.params["layers"][0]
    assert len(draft.decoder_config.transformer_config.layer_configs) == 1

    prompt = np.array([9, 3, 57, 12, 88, 41, 7])
    want = target.generate_list(prompt, 20, stop_token_ids=[])
    dec = self_speculative_decoder(target, draft_layers=1, k=4)
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 20, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_tokens_proposed > 0


def test_tree_accept_compacts_nonconsecutive_path(target):
    """Accepting a NON-first branch (path [0, 2, 3], skipping node 1) must
    leave the KV slots holding the accepted path's rows — regression for
    the accept compaction reading at pos instead of the verify dispatch's
    write base (pos - m), which silently no-ops whenever the path is not
    the identity chain."""
    import jax
    import jax.numpy as jnp

    from uzu_tpu.engine.speculation import NgramTreeSpeculator, TokenTree, TreeSpeculativeDecoder

    lm = target
    prompt = np.array([5, 9, 2, 7])
    state = lm.new_state()
    _, state = lm.prefill(state, prompt)
    pos = len(prompt)

    root, b_wrong, b_right, b_right2 = 11, 22, 33, 44
    tree = TokenTree(root)
    tree.add(0, b_wrong)
    n2 = tree.add(0, b_right)
    tree.add(n2, b_right2)
    m = 4
    positions = np.array([pos + d for d in tree.depths()], np.int32)

    dec = TreeSpeculativeDecoder(lm, NgramTreeSpeculator(), max_nodes=8)
    keys = jax.random.split(jax.random.PRNGKey(0), m)
    state, _ = dec._verify_fn(m)(
        lm.params, state, jnp.asarray(np.array(tree.tokens, np.int32)),
        jnp.asarray(positions), jnp.asarray(tree.ancestor_mask(m)), keys,
    )
    path = [0, 2, 3]
    idx = np.full(8, path[-1], np.int32)
    idx[:3] = path
    state = dec._accept_fn(m, 8)(
        state, jnp.asarray(idx), jnp.asarray(pos + 3, jnp.int32))

    # ground truth: teacher-forced prefill of the accepted sequence
    want_state = lm.new_state()
    _, want_state = lm.prefill(
        want_state, np.concatenate([prompt, [root, b_right, b_right2]]))
    probe = np.array([77], np.int32)
    la, _ = lm.prefill(state, probe)
    lb, _ = lm.prefill(want_state, probe)
    np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                               rtol=1e-5, atol=1e-5)


def test_acceptance_metrics_counted(target):
    # a prompt with heavy repetition: ngram speculation should accept some
    prompt = np.array([1, 2, 3] * 6)
    dec = SpeculativeDecoder(target, NgramSpeculator(max_ngram=3, k=4))
    metrics = SpeculationMetrics()
    list(dec.generate(prompt, 16, stop_token_ids=[], metrics=metrics))
    assert 0 <= metrics.acceptance_rate <= 1.0


# -- tree speculation -----------------------------------------------------------


def test_token_tree_structure():
    from uzu_tpu.engine.speculation import TokenTree

    t = TokenTree(5)
    a = t.add(0, 1)
    b = t.add(0, 2)
    c = t.add(a, 3)
    assert t.depths() == [0, 1, 1, 2]
    m = t.ancestor_mask(4)
    assert m[c, 0] and m[c, a] and m[c, c] and not m[c, b]
    assert not m[a, b] and not m[b, a]


def test_ngram_tree_builds_trie():
    from uzu_tpu.engine.speculation import NgramTreeSpeculator

    s = NgramTreeSpeculator(max_ngram=2, depth=3, branches=3)
    # history "1 2 3 4 ... 1 2 5 ..." -> two continuations of (1, 2)
    tree = s.propose([1, 2, 3, 4, 1, 2, 5, 6, 1], 2)
    assert tree.tokens[0] == 2
    child_tokens = {tree.tokens[c] for c in tree.children(0)}
    assert {3, 5} & child_tokens


def test_tree_speculative_equals_plain_greedy(target):
    from uzu_tpu.engine.speculation import NgramTreeSpeculator, TreeSpeculativeDecoder

    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    want = target.generate_list(prompt, 24, stop_token_ids=[])
    dec = TreeSpeculativeDecoder(
        target, NgramTreeSpeculator(max_ngram=3, depth=4, branches=3), max_nodes=16
    )
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0


def test_tree_speculative_stop_tokens(target):
    from uzu_tpu.engine.speculation import NgramTreeSpeculator, TreeSpeculativeDecoder

    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    plain = target.generate_list(prompt, 24, stop_token_ids=[])
    stop = plain[6]
    want = target.generate_list(prompt, 24, stop_token_ids=[stop])
    dec = TreeSpeculativeDecoder(target, NgramTreeSpeculator(), max_nodes=16)
    got = list(dec.generate(prompt, 24, stop_token_ids=[stop]))
    assert got == want


# -- dflash speculation ---------------------------------------------------------


def test_dflash_speculative_equals_plain_greedy(target_dir, tmp_path):
    """DFlash-driven speculation keeps the exact-output invariant even with
    a random (useless) draft: acceptance may be zero, output must match."""
    from uzu_tpu.engine.dflash import DFlashDraft
    from uzu_tpu.engine.speculation import DFlashSpeculativeDecoder
    from uzu_tpu.tools.synth import llama_config, synth_dflash_speculator

    target = LanguageModel.from_dir(target_dir, max_context=128, prefill_buckets=(16,))
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    spec_dir = synth_dflash_speculator(str(tmp_path / "spec"), cfg, block_size=4,
                                       target_layer_ids=(0, 1), seed=3,
                                       dtype=np.float32)
    dflash = DFlashDraft.from_dir(spec_dir, max_context=128)
    assert dflash.cfg.block_size == 4

    prompt = np.array([5, 6, 7, 8, 9])
    want = target.generate_list(prompt, 16, stop_token_ids=[])
    dec = DFlashSpeculativeDecoder(target, dflash, max_nodes=8, children=2)
    metrics = SpeculationMetrics()
    got = list(dec.generate(prompt, 16, stop_token_ids=[], metrics=metrics))
    assert got == want
    assert metrics.num_verify_passes > 0
    assert metrics.num_tokens_proposed > 0


def test_dflash_draft_shapes(target_dir, tmp_path):
    from uzu_tpu.engine.dflash import DFlashDraft
    from uzu_tpu.tools.synth import llama_config, synth_dflash_speculator

    target = LanguageModel.from_dir(target_dir, max_context=128, prefill_buckets=(16,))
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    spec_dir = synth_dflash_speculator(str(tmp_path / "s2"), cfg, block_size=4,
                                       target_layer_ids=(1,), seed=5, dtype=np.float32)
    dflash = DFlashDraft.from_dir(spec_dir, max_context=64)
    state = dflash.new_state()
    # accept 3 tokens' features
    feats = np.random.default_rng(0).standard_normal((8, 1, 64)).astype(np.float32)
    state = dflash.accept(state, feats, 3)
    assert int(state["pos"]) == 3
    ids, vals = dflash.draft(
        state, target.params["embedding"], target.decoder_config.embedding_config,
        root_token=7, candidate_count=3,
    )
    assert ids.shape == (3, 3) and vals.shape == (3, 3)  # block-1 rows

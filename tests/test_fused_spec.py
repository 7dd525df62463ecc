"""Fused multi-round speculative decoding tests.

Same load-bearing invariant as test_speculation.py (reference: trie.rs
accept-path semantics): speculation changes latency, never output. The
fused decoder runs R draft+verify rounds inside ONE dispatch
(engine/fused_spec.py), so these tests additionally cross the
round-boundary edges that only exist fused: stop tokens mid-scan, budget
exhaustion mid-scan, context exhaustion mid-scan, and the draft-state
replay between in-scan rounds (separate drafts) / the committed-view
re-read (self drafts).
"""

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.fused_spec import (
    FusedSpeculativeDecoder,
    fused_self_speculative_decoder,
)
from uzu_tpu.engine.speculation import SpeculationMetrics
from uzu_tpu.tools.synth import llama_config, qwen35_config, synthesize


@pytest.fixture(scope="module")
def target_dir(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    return synthesize(cfg, str(tmp_path_factory.mktemp("fspec_target")),
                      seed=7, dtype=np.float32)


@pytest.fixture(scope="module")
def target(target_dir):
    return LanguageModel.from_dir(target_dir, max_context=128,
                                  prefill_buckets=(16,))


@pytest.fixture(scope="module")
def disagreeing_draft(tmp_path_factory):
    # synth models are root-token repeaters, so a chain draft trivially
    # matches a chain target and acceptance saturates; rolling the UNTIED
    # readout table shifts every proposal by one token id, forcing
    # rejection — exercising the commit=1 rounds and the block[:commit]
    # draft replay between fused rounds
    import jax.numpy as jnp

    cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                       num_groups=1, head_dim=16, vocab_size=256, tied=False)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("fspec_draft")),
                   seed=23, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    lm.params["embedding"]["output"] = jnp.roll(
        lm.params["embedding"]["output"], 1, axis=0)
    return lm


def test_fused_self_equals_plain_greedy(target):
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    want = target.generate_list(prompt, 24, stop_token_ids=[])
    dec = fused_self_speculative_decoder(target, draft_layers=1, k=3, rounds=4)
    m = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=m))
    assert got == want
    assert m.num_verify_passes > 0
    assert m.num_tokens_accepted <= m.num_tokens_proposed


def test_fused_separate_draft_partial_acceptance(target, disagreeing_draft):
    prompt = np.array([9, 3, 57, 12, 88, 41, 7])
    want = target.generate_list(prompt, 24, stop_token_ids=[])
    dec = FusedSpeculativeDecoder(target, draft_lm=disagreeing_draft,
                                  k=3, rounds=4)
    m = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=m))
    assert got == want
    # the rolled readout must actually get rejected — otherwise this test
    # isn't covering the rejected-commit replay path
    assert m.num_tokens_accepted < m.num_tokens_proposed
    assert m.num_verify_passes >= 4  # full rejection ⇒ ≥1 round per token-ish


def test_fused_stop_token_mid_scan(target):
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    plain = target.generate_list(prompt, 24, stop_token_ids=[])
    stop = plain[5]
    want = target.generate_list(prompt, 24, stop_token_ids=[stop])
    dec = fused_self_speculative_decoder(target, draft_layers=1, k=3, rounds=4)
    got = list(dec.generate(prompt, 24, stop_token_ids=[stop]))
    assert got == want
    assert got[-1] == stop


@pytest.mark.parametrize("budget", [1, 2, 5, 7])
def test_fused_budget_clips_mid_scan(target, budget):
    """Budgets that end inside a round / inside the scan must clip the
    on-device commit exactly like the per-round decoder."""
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    want = target.generate_list(prompt, budget, stop_token_ids=[])
    dec = fused_self_speculative_decoder(target, draft_layers=1, k=3, rounds=4)
    got = list(dec.generate(prompt, budget, stop_token_ids=[]))
    assert got == want
    assert len(got) == budget


def test_fused_context_exhaustion(target_dir):
    """A context too small for the full budget: fused output must be a
    prefix of plain and stop within one block of the capacity wall."""
    lm = LanguageModel.from_dir(target_dir, max_context=32,
                                prefill_buckets=(16,))
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    want = lm.generate_list(prompt, 64, stop_token_ids=[])
    dec = fused_self_speculative_decoder(lm, draft_layers=1, k=3, rounds=4)
    got = list(dec.generate(prompt, 64, stop_token_ids=[]))
    assert got == want[: len(got)]
    assert len(got) >= 32 - len(prompt) - 4 - 1  # within one (k+1)-block


def test_fused_hybrid_recurrent_bit_exact(tmp_path):
    """GDN-family hybrid target: in-scan deferred commits must replay the
    recurrent state exactly across multiple fused rounds."""
    d = synthesize(qwen35_config(), str(tmp_path / "hyb"), seed=3)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    prompt = np.array([1, 2, 3, 4, 1, 2, 3, 4, 1, 2])
    want = lm.generate_list(prompt, 24, stop_token_ids=[])
    dec = fused_self_speculative_decoder(lm, k=3, rounds=3)
    m = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=m))
    assert got == want
    # stop + budget edges on the recurrent state
    stop = want[7]
    want_s = lm.generate_list(prompt, 24, stop_token_ids=[stop])
    got_s = list(dec.generate(prompt, 24, stop_token_ids=[stop]))
    assert got_s == want_s and got_s[-1] == stop
    want5 = lm.generate_list(prompt, 5, stop_token_ids=[])
    got5 = list(dec.generate(prompt, 5, stop_token_ids=[]))
    assert got5 == want5 and len(got5) == 5


def test_fused_matches_per_round_decoder(target, disagreeing_draft):
    """Fused vs the existing per-round SpeculativeDecoder with the SAME
    draft: identical output (both equal plain) and identical total
    acceptance — the fusion moved the loop, not the math."""
    from uzu_tpu.engine.speculation import (
        DraftModelSpeculator,
        SpeculativeDecoder,
    )

    prompt = np.array([9, 3, 57, 12, 88, 41, 7])
    mf, mp = SpeculationMetrics(), SpeculationMetrics()
    fused = FusedSpeculativeDecoder(target, draft_lm=disagreeing_draft,
                                    k=3, rounds=4)
    got_f = list(fused.generate(prompt, 20, stop_token_ids=[], metrics=mf))
    per = SpeculativeDecoder(target,
                             DraftModelSpeculator(disagreeing_draft, k=3))
    got_p = list(per.generate(prompt, 20, stop_token_ids=[], metrics=mp))
    assert got_f == got_p
    # totals may differ by a final budget-clipped round's raw count
    assert abs(mf.num_tokens_accepted - mp.num_tokens_accepted) <= 3


def test_fused_state_contract(target):
    """SpecStream.state covers every yielded token except the in-flight
    last one (session prefix-cache contract)."""
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    dec = fused_self_speculative_decoder(target, draft_layers=1, k=3, rounds=4)
    s = dec.generate(prompt, 10, stop_token_ids=[])
    toks = list(s)
    assert s.state is not None
    assert int(s.state["pos"]) == len(prompt) + len(toks) - 1


def test_fused_rejects_invalid_config(target, disagreeing_draft):
    with pytest.raises(ValueError):
        FusedSpeculativeDecoder(target)  # neither draft
    with pytest.raises(ValueError):
        FusedSpeculativeDecoder(target, draft_lm=disagreeing_draft,
                                draft_layers=1)  # both
    with pytest.raises(ValueError):
        FusedSpeculativeDecoder(target, draft_layers=1, k=0)


def test_chat_session_fused_self_string(tmp_path):
    """ChatSession(speculator="fused-self") — the zero-artifact string mode:
    greedy reply text identical to plain, acceptance stats surface, and a
    second turn reuses the session (fresh suffix through the fused path)."""
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.sessions import ChatSession, Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "fspec_chat"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    tok = Tokenizer(d)

    plain = ChatSession(lm, tok)
    r1 = plain.reply("hello there", sampling=SamplingParams(), max_new_tokens=24)
    p2 = plain.reply("again", sampling=SamplingParams(), max_new_tokens=16)

    spec = ChatSession(lm, tok, speculator="fused-self")
    r2 = spec.reply("hello there", sampling=SamplingParams(), max_new_tokens=24)
    assert r2.text == r1.text
    assert r2.stats.tokens_count_output == r1.stats.tokens_count_output
    s2 = spec.reply("again", sampling=SamplingParams(), max_new_tokens=16)
    assert s2.text == p2.text

    with pytest.raises(ValueError):
        ChatSession(lm, tok, speculator="warp-speed")


def test_chat_session_string_speculator_grammar_turn(tmp_path):
    """A grammar-constrained turn with a string speculator downgrades to the
    per-round self-draft proposer (masks need the host) and still matches
    the plain constrained stream."""
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.grammar import GrammarSession
    from uzu_tpu.sessions import ChatSession, Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "fspec_gram"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    tok = Tokenizer(d)
    schema = {"type": "object", "properties": {"a": {"type": "integer"}},
              "required": ["a"]}

    plain = ChatSession(lm, tok)
    r1 = plain.reply("json please", sampling=SamplingParams(),
                     max_new_tokens=32,
                     grammar=GrammarSession(tok, schema=schema,
                                            stop_token_ids=tok.eos_token_ids))
    spec = ChatSession(lm, tok, speculator="fused-self")
    r2 = spec.reply("json please", sampling=SamplingParams(),
                    max_new_tokens=32,
                    grammar=GrammarSession(tok, schema=schema,
                                            stop_token_ids=tok.eos_token_ids))
    assert r2.text == r1.text


# -- fused rounds on the BATCHED speculative engine --------------------------


@pytest.fixture(scope="module")
def batch_lm(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("fspec_batch")), seed=13,
                   dtype=np.float32)
    return LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))


def test_spec_batched_fused_rounds_equals_single(batch_lm):
    """spec_rounds > 1: R whole rounds per dispatch, greedy output still ==
    single-request plain greedy across slot reuse."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    lm = batch_lm
    prompts = [[5, 6, 5, 6, 5, 6, 5], [1, 2, 3], [9, 9, 9, 9],
               [40, 41, 42, 40, 41, 42], [17, 23]]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
               for p in prompts]
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=3,
                                 draft_layers=1, spec_rounds=4,
                                 stop_token_ids=[])
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for i, (r, want) in enumerate(zip(reqs, singles)):
        assert r.finished
        assert r.tokens[:12] == want[:12], f"request {i} diverged"
    assert eng.metrics.num_verify_passes > 0


def test_spec_batched_fused_rounds_stop_tokens(batch_lm):
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    lm = batch_lm
    probe = lm.generate_list(np.asarray([5, 6, 5, 6, 5]), 12, stop_token_ids=[])
    stop = probe[5]
    prompts = [[5, 6, 5, 6, 5], [1, 2, 3]]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[stop])
               for p in prompts]
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=3,
                                 draft_layers=1, spec_rounds=4,
                                 stop_token_ids=[stop])
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens == want


def test_spec_batched_fused_rounds_sampled_identity(batch_lm):
    """Fused rounds rebuild the produced-count key schedule IN-SCAN: sampled
    streams (engine default + per-request dynamic override + a penalty
    slot) are bit-identical to the per-round engine's."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine
    from uzu_tpu.engine.sampling import SamplingParams

    lm = batch_lm
    prompts = [[5, 6, 5, 6, 5, 6, 5], [1, 2, 3], [9, 9, 9, 9]]
    sampled = SamplingParams(temperature=0.9, top_k=40)
    ov = SamplingParams(temperature=0.7, top_p=0.9)

    def run(spec_rounds):
        kw = {"spec_rounds": spec_rounds} if spec_rounds > 1 else {}
        eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=3,
                                     draft_layers=1, sampling=sampled,
                                     stop_token_ids=[], **kw)
        reqs = [eng.submit(p, 12, seed=i,
                           sampling=(ov if i == 0 else None),
                           **({"presence_penalty": 0.5} if i == 1 else {}))
                for i, p in enumerate(prompts)]
        eng.run()
        return [r.tokens for r in reqs]

    assert run(1) == run(4)


def test_spec_batched_fused_rounds_hybrid(tmp_path):
    """Fused rounds over a GDN hybrid: R chained deferred commits inside
    one scan must keep batched speculative greedy == plain."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    cfg = qwen35_config(num_layers=3, model_dim=64, hidden_dim=128,
                        num_heads=4, num_groups=2, head_dim=16,
                        value_head_dim=16, attn_every=3)
    d = synthesize(cfg, str(tmp_path / "fspec_gdn"), seed=7, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    prompts = [[5, 6, 5, 6, 5, 6], [1, 2, 3, 4]]
    singles = [lm.generate_list(np.asarray(p), 10, stop_token_ids=[])
               for p in prompts]
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=3,
                                 draft_layers=2, spec_rounds=4,
                                 stop_token_ids=[])
    reqs = [eng.submit(p, 10) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens[:10] == want[:10]


def test_spec_batched_fused_rounds_grammar_fallback(tmp_path):
    """A grammar slot forces the per-round path for that dispatch (host
    lookahead masks can't ride the scan) — outputs still match the
    single-stream constrained loop AND the plain neighbor stays exact."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine
    from uzu_tpu.grammar import GrammarSession, constrained_generate
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    schema = {"type": "object",
              "properties": {"city": {"enum": ["Paris", "Rome"]}},
              "required": ["city"]}
    d = synth_chat_model(str(tmp_path / "fspec_bg"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    gp = tok.encode("<|user|>give me json<|end|><|assistant|>")
    pp = [9, 8, 7, 6, 5]
    stop = list(tok.eos_token_ids)

    def g():
        return GrammarSession(tok, schema=schema, stop_token_ids=stop)

    want_g = list(constrained_generate(lm, np.asarray(gp), 24, g(),
                                       stop_token_ids=stop))
    want_p = lm.generate_list(np.asarray(pp), 24, stop_token_ids=stop)
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 draft_layers=1, spec_rounds=4,
                                 stop_token_ids=stop)
    rg = eng.submit(gp, 24, grammar=g())
    rp = eng.submit(pp, 24)
    eng.run()
    assert rg.finished and rp.finished
    assert rg.tokens[: len(want_g)] == want_g[: len(rg.tokens)]
    assert rp.tokens[:24] == want_p[:24]


def test_spec_rounds_requires_device_drafts(batch_lm):
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    with pytest.raises(ValueError, match="draft_layers"):
        SpeculativeBatchEngine(batch_lm, batch_size=2, spec_rounds=2)


def test_spec_paged_fused_rounds_equals_single(batch_lm):
    """Paged engine fused rounds: pages pre-ensured for the R-round worst
    case, tables static across the scan — greedy output == plain."""
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine

    lm = batch_lm
    prompts = [[5, 6, 5, 6, 5, 6, 5], [1, 2, 3], [5, 6, 5, 6, 5, 6, 9],
               [9, 9, 9, 9], [17, 23]]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
               for p in prompts]
    eng = SpeculativePagedBatchEngine(
        lm, batch_size=2, draft_block=3, draft_layers=1, spec_rounds=4,
        num_pages=33, page_size=8, stop_token_ids=[])
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for i, (r, want) in enumerate(zip(reqs, singles)):
        assert r.finished
        assert r.tokens[:12] == want[:12], f"request {i} diverged"
    assert eng.metrics.num_verify_passes > 0


def test_spec_paged_fused_rounds_sampled_and_pressure(batch_lm):
    """Sampled streams identical per-round vs fused (in-scan key schedule
    survives the paged recompute-preemption contract), and a pool small
    enough to force preemption mid-run still replays exactly."""
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine
    from uzu_tpu.engine.sampling import SamplingParams

    lm = batch_lm
    prompts = [[5, 6, 5, 6, 5, 6, 5], [1, 2, 3], [9, 9, 9, 9]]
    sampled = SamplingParams(temperature=0.9, top_k=40)

    def run(rounds):
        kw = {"spec_rounds": rounds} if rounds > 1 else {}
        eng = SpeculativePagedBatchEngine(
            lm, batch_size=2, draft_block=3, draft_layers=1, sampling=sampled,
            num_pages=33, page_size=8, stop_token_ids=[], **kw)
        reqs = [eng.submit(p, 12, seed=i) for i, p in enumerate(prompts)]
        eng.run()
        return [r.tokens for r in reqs]

    assert run(1) == run(4)

    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
               for p in prompts]
    eng = SpeculativePagedBatchEngine(
        lm, batch_size=3, draft_block=3, draft_layers=1, spec_rounds=3,
        num_pages=14, page_size=8, stop_token_ids=[])
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens[:12] == want[:12]


# -- device n-gram drafts (fused prompt-lookup) ------------------------------


def test_device_ngram_matches_host_oracle():
    """ops/ngram.ngram_propose == NgramSpeculator.propose over random
    histories (the device matcher is the host rule, vectorized)."""
    import jax
    import jax.numpy as jnp

    from uzu_tpu.engine.speculation import NgramSpeculator
    from uzu_tpu.ops.ngram import ngram_propose

    rng = np.random.default_rng(0)
    f = jax.jit(lambda h, l: ngram_propose(h, l, 4, 3))
    spec = NgramSpeculator(max_ngram=3, k=4)
    for _ in range(120):
        n = int(rng.integers(5, 64))
        hist = rng.integers(0, 6, n).tolist()
        buf = np.zeros(64 + 4, np.int32)
        buf[:n] = hist
        d, dl = f(jnp.asarray(buf), jnp.asarray(n))
        assert [int(x) for x in np.asarray(d)[: int(dl)]] == spec.propose(hist)


def test_fused_ngram_single_stream(target):
    """FusedSpeculativeDecoder(ngram=True): prompt-lookup drafts computed
    in-scan, output == plain greedy across stop/budget edges."""
    prompt = np.array([1, 2, 3, 4, 1, 2, 3])
    want = target.generate_list(prompt, 24, stop_token_ids=[])
    dec = FusedSpeculativeDecoder(target, ngram=True, k=4, rounds=4)
    m = SpeculationMetrics()
    got = list(dec.generate(prompt, 24, stop_token_ids=[], metrics=m))
    assert got == want
    assert m.num_tokens_accepted > 0  # repetitive prompt: lookups hit
    stop = want[5]
    want_s = target.generate_list(prompt, 24, stop_token_ids=[stop])
    got_s = list(dec.generate(prompt, 24, stop_token_ids=[stop]))
    assert got_s == want_s and got_s[-1] == stop
    for budget in (1, 5):
        assert list(dec.generate(prompt, budget, stop_token_ids=[])) == \
            target.generate_list(prompt, budget, stop_token_ids=[])


def test_batched_device_ngram_fused(batch_lm):
    """Both batch engines with device_ngram fused rounds == plain singles;
    sampled streams identical to the HOST-ngram per-round engine
    (committed rows are draft-independent + the produced-count keys)."""
    from uzu_tpu.engine.batch_spec import (
        SpeculativeBatchEngine,
        SpeculativePagedBatchEngine,
    )
    from uzu_tpu.engine.sampling import SamplingParams

    lm = batch_lm
    prompts = [[5, 6, 5, 6, 5, 6, 5], [1, 2, 3], [9, 9, 9, 9],
               [40, 41, 42, 40, 41, 42], [17, 23]]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
               for p in prompts]
    for cls, kw in ((SpeculativeBatchEngine, {}),
                    (SpeculativePagedBatchEngine,
                     {"num_pages": 40, "page_size": 8})):
        eng = cls(lm, batch_size=2, draft_block=4, device_ngram=True,
                  spec_rounds=4, stop_token_ids=[], **kw)
        reqs = [eng.submit(p, 12) for p in prompts]
        eng.run()
        for i, (r, want) in enumerate(zip(reqs, singles)):
            assert r.finished
            assert r.tokens[:12] == want[:12], (cls.__name__, i)

    sampled = SamplingParams(temperature=0.9, top_k=40)
    e1 = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                sampling=sampled, stop_token_ids=[])
    r1 = [e1.submit(p, 12, seed=i) for i, p in enumerate(prompts[:3])]
    e1.run()
    e2 = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                sampling=sampled, device_ngram=True,
                                spec_rounds=4, stop_token_ids=[])
    r2 = [e2.submit(p, 12, seed=i) for i, p in enumerate(prompts[:3])]
    e2.run()
    assert [r.tokens for r in r1] == [r.tokens for r in r2]


def test_device_ngram_validation(batch_lm):
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    with pytest.raises(ValueError, match="fused rounds"):
        SpeculativeBatchEngine(batch_lm, batch_size=2, device_ngram=True)
    with pytest.raises(ValueError, match="exclusive"):
        SpeculativeBatchEngine(batch_lm, batch_size=2, device_ngram=True,
                               spec_rounds=2, draft_layers=1)


def test_string_speculator_rejected_at_construction(tmp_path):
    """A string speculator on a KV-shared-attention model (speculation
    unsupported) must fail at ChatSession CONSTRUCTION, not mid-reply
    inside the stream."""
    from uzu_tpu.sessions import ChatSession, Tokenizer
    from uzu_tpu.tools.synth import windowed_config

    cfg = windowed_config(num_layers=4, kv_share_last=1)
    d = synthesize(cfg, str(tmp_path / "kvshare"), seed=13, dtype=np.float32)
    # windowed_config models ship no tokenizer; reuse a chat model's
    from uzu_tpu.tools.synth import synth_chat_model

    cd = synth_chat_model(str(tmp_path / "tok_donor"), num_layers=2,
                          model_dim=64, hidden_dim=160, num_heads=4,
                          num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    tok = Tokenizer(cd)
    with pytest.raises(ValueError, match="KV-shared"):
        ChatSession(lm, tok, speculator="fused-self")


def test_spec_paged_fused_rounds_int8_pools(tmp_path_factory):
    """Fused rounds over INT8 page pools: the in-scan multi-row quantized
    scatter + dequant reads keep the stream equal to the dense INT8-KV
    stream (fused form of test_spec_paged_int8_pools)."""
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160,
                       num_heads=4, num_groups=2, head_dim=16,
                       vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("fspec_i8")), seed=14,
                   dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,),
                                kv_quant=True)
    prompts = [[5, 6, 5, 6, 5], [1, 2, 3]]
    singles = [lm.generate_list(np.asarray(p), 10, stop_token_ids=[])
               for p in prompts]
    eng = SpeculativePagedBatchEngine(
        lm, batch_size=2, draft_block=3, draft_layers=1, spec_rounds=3,
        num_pages=33, page_size=8, stop_token_ids=[])
    reqs = [eng.submit(p, 10) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens[:10] == want[:10]

"""Randomized scheduler fuzz: interleaved submit/cancel/step across the
batch engines, with mixed per-request features (sampling overrides,
logprobs, penalties, prefix-shared prompts).

Deterministic (seeded) sequences; the pinned invariants after every run:
- every request that finished "length"/"stop" under GREEDY matches its
  solo single-stream run exactly (the engines' core exactness invariant,
  now under adversarial scheduling rather than curated scenarios);
- logprob entries stay in lockstep with emitted tokens;
- the paged pool's accounting balances: every page is either free or
  referenced, refcounts are non-negative, and free+distinct-held == total.
"""

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.batch import BatchEngine
from uzu_tpu.engine.paged_batch import PagedBatchEngine
from uzu_tpu.engine.sampling import SamplingParams
from uzu_tpu.tools.synth import llama_config, synthesize


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("fuzz_model")), seed=13,
                   dtype=np.float32)
    return LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))


def _random_prompt(rng, shared_pool):
    """Prompts with deliberate shared prefixes to exercise sharing paths."""
    if shared_pool and rng.random() < 0.4:
        base = shared_pool[rng.integers(len(shared_pool))]
        ext = list(rng.integers(1, 250, rng.integers(1, 6)))
        return (base + ext)[:60]
    n = int(rng.integers(2, 40))
    p = list(rng.integers(1, 250, n))
    shared_pool.append(p)
    return p


def _fuzz(engine_factory, lm, seed, steps=120):
    rng = np.random.default_rng(seed)
    eng = engine_factory()
    live, finished, shared_pool = [], [], []
    greedy_expected = {}

    for _ in range(steps):
        op = rng.random()
        if op < 0.30 and len(live) < 8:
            prompt = _random_prompt(rng, shared_pool)
            kw = {}
            greedy = True
            r = rng.random()
            if r < 0.25:
                kw["sampling"] = SamplingParams(temperature=1.0, top_k=40)
                greedy = False
            elif r < 0.40:
                kw["logprobs"] = int(rng.integers(1, 4))
            elif r < 0.50 and eng.supports_count_penalties:
                kw["frequency_penalty"] = 0.7
                greedy = False  # penalties change the sampled stream
            n_new = int(rng.integers(1, 14))
            req = eng.submit(prompt, n_new, seed=int(rng.integers(0, 99)), **kw)
            live.append(req)
            if greedy:
                greedy_expected[req.id] = (list(prompt), n_new)
        elif op < 0.38 and live:
            victim = live[rng.integers(len(live))]
            eng.cancel(victim, "cancelled")
            greedy_expected.pop(victim.id, None)
        else:
            eng.step()
        finished += [r for r in live if r.finished]
        live = [r for r in live if not r.finished]
    eng.run()
    finished += live

    for req in finished:
        want_len = len(req.tokens)
        if req.id in greedy_expected and req.finish_reason in ("length", "stop"):
            prompt, n_new = greedy_expected[req.id]
            solo = lm.generate_list(np.asarray(prompt), want_len,
                                    stop_token_ids=[])
            assert req.tokens == solo[:want_len], (
                f"greedy divergence seed={seed} req={req.id}")
        if req.logprobs:
            assert len(req.logprob_content) == len(req.tokens)
    return eng


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_dense(lm, seed):
    _fuzz(lambda: BatchEngine(lm, batch_size=3, decode_chunk=4,
                              stop_token_ids=[], prefix_min=8), lm, seed)


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_fuzz_paged(lm, seed):
    eng = _fuzz(
        lambda: PagedBatchEngine(lm, batch_size=3, decode_chunk=4,
                                 num_pages=25, page_size=8,
                                 stop_token_ids=[], apc_max_entries=4),
        lm, seed)
    # pool accounting balances after the storm
    pool = eng.pool
    held = {p for pages in pool._slots.values() for p in pages}
    assert all(pool._refcount[p] > 0 for p in held)
    assert all(pool._refcount[p] == 0 for p in pool._free)
    assert len(set(pool._free)) == len(pool._free)
    assert set(range(pool.num_pages)) == held | set(pool._free)


@pytest.fixture(scope="module")
def chat(tmp_path_factory):
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("fuzz_chat")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    return lm2, Tokenizer(d)


@pytest.mark.parametrize("seed", [4, 5])
def test_fuzz_speculative_with_grammar(chat, seed):
    """Speculative engine storm with grammar slots in the mix: greedy
    plain finishers match solo runs, greedy grammar finishers match the
    single-stream constrained loop, and grammar outputs stay valid."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine
    from uzu_tpu.grammar import GrammarSession, JsonMatcher, constrained_generate

    lm2, tok = chat
    rng = np.random.default_rng(seed)
    eng = SpeculativeBatchEngine(lm2, batch_size=3, draft_block=4,
                                 stop_token_ids=list(tok.eos_token_ids))
    live, finished = [], []
    kinds = {}
    gp = tok.encode("<|user|>json<|end|><|assistant|>")

    for _ in range(90):
        op = rng.random()
        if op < 0.3 and len(live) < 7:
            n_new = int(rng.integers(3, 16))
            if rng.random() < 0.4:
                req = eng.submit(gp, n_new, grammar=GrammarSession(
                    tok, schema=None, stop_token_ids=tok.eos_token_ids))
                kinds[req.id] = ("grammar", n_new)
            else:
                prompt = list(rng.integers(1, 250, int(rng.integers(2, 30))))
                req = eng.submit(prompt, n_new)
                kinds[req.id] = ("plain", list(prompt))
            live.append(req)
        elif op < 0.38 and live:
            eng.cancel(live[int(rng.integers(len(live)))], "cancelled")
        else:
            eng.step()
        finished += [r for r in live if r.finished]
        live = [r for r in live if not r.finished]
    eng.run()
    finished += live

    grammar_solo = {}
    for req in finished:
        kind = kinds[req.id]
        if req.finish_reason == "cancelled" or not req.tokens:
            continue
        if kind[0] == "plain":
            solo = lm2.generate_list(np.asarray(kind[1]), len(req.tokens),
                                     stop_token_ids=list(tok.eos_token_ids))
            assert req.tokens == solo[: len(req.tokens)], f"seed={seed}"
        else:
            n_new = kind[1]
            if n_new not in grammar_solo:
                g = GrammarSession(tok, schema=None,
                                   stop_token_ids=tok.eos_token_ids)
                grammar_solo[n_new] = list(constrained_generate(
                    lm2, np.asarray(gp), n_new, g,
                    stop_token_ids=list(tok.eos_token_ids)))
            assert req.tokens == grammar_solo[n_new][: len(req.tokens)]
            text = tok.decode(req.tokens, skip_special_tokens=True).strip()
            if text:
                assert JsonMatcher().feed_text(text), text

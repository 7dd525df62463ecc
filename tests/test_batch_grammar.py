"""Grammar-constrained CONTINUOUS BATCHING tests.

The pinned invariants, extending the single-stream grammar suite
(test_grammar.py) to the speculative batch engines:

- a grammar slot's greedy stream is bit-identical to the single-stream
  constrained loop (grammar/decode.py constrained_generate);
- grammar and plain slots coexist without perturbing each other (the plain
  slot's stream matches a grammar-free engine's);
- sampled constrained outputs are valid under the grammar (the grammar, not
  the random model, guarantees structure);
- the plain chunked engines REJECT grammar submissions with a clear error
  (their fused K-step chunks cannot carry per-step host masks).

No reference counterpart for the batching axis — uzu applies its bitmask
path to one session at a time (stream.rs:632-675); the per-slot lookahead
masks riding one fused batched verify are this build's design.
"""

import json

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.batch import BatchEngine
from uzu_tpu.engine.batch_spec import (
    SpeculativeBatchEngine,
    SpeculativePagedBatchEngine,
)
from uzu_tpu.engine.paged_batch import PagedBatchEngine
from uzu_tpu.engine.sampling import SamplingParams
from uzu_tpu.grammar import GrammarSession, JsonMatcher, constrained_generate
from uzu_tpu.sessions import Tokenizer
from uzu_tpu.tools.synth import synth_chat_model

SCHEMA = {
    "type": "object",
    "properties": {"city": {"enum": ["Paris", "Rome"]}, "days": {"type": "integer"}},
    "required": ["city"],
}


@pytest.fixture(scope="module")
def chat_dir(tmp_path_factory):
    return synth_chat_model(
        str(tmp_path_factory.mktemp("bgram_model")),
        num_layers=2, model_dim=64, hidden_dim=160,
        num_heads=4, num_groups=2, head_dim=16,
    )


@pytest.fixture(scope="module")
def lm(chat_dir):
    return LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))


@pytest.fixture(scope="module")
def tok(chat_dir):
    return Tokenizer(chat_dir)


def _grammar(tok, **kw):
    kw.setdefault("schema", SCHEMA)
    return GrammarSession(tok, stop_token_ids=tok.eos_token_ids, **kw)


def _single_constrained(lm, tok, prompt_ids, n, **kw):
    return list(
        constrained_generate(
            lm, np.asarray(prompt_ids), n, _grammar(tok, **kw),
            stop_token_ids=list(tok.eos_token_ids),
        )
    )


def test_plain_engines_reject_grammar(lm, tok):
    for eng in (
        BatchEngine(lm, batch_size=2, stop_token_ids=[]),
        PagedBatchEngine(lm, batch_size=2, stop_token_ids=[]),
    ):
        with pytest.raises(ValueError, match="speculative"):
            eng.submit([1, 2, 3], 8, grammar=_grammar(tok))


def test_spec_batched_grammar_equals_single(lm, tok):
    """Greedy grammar slot == single-stream constrained loop, while a plain
    slot in the SAME engine matches plain single-request greedy."""
    gp = tok.encode("<|user|>give me json<|end|><|assistant|>")
    pp = [9, 8, 7, 6, 5]
    stop = list(tok.eos_token_ids)
    want_g = _single_constrained(lm, tok, gp, 24)
    want_p = lm.generate_list(np.asarray(pp), 24, stop_token_ids=stop)

    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 stop_token_ids=stop)
    rg = eng.submit(gp, 24, grammar=_grammar(tok))
    rp = eng.submit(pp, 24)
    eng.run()
    assert rg.finished and rp.finished
    assert rg.tokens[: len(want_g)] == want_g[: len(rg.tokens)]
    assert rg.tokens[:24] == want_g[:24] or want_g[-1] in stop
    assert rp.tokens[:24] == want_p[:24]


def test_spec_batched_grammar_slot_reuse(lm, tok):
    """3 grammar requests through 2 slots: per-request grammar state must
    not leak across slot reuse."""
    gp = tok.encode("<|user|>json<|end|><|assistant|>")
    stop = list(tok.eos_token_ids)
    want = _single_constrained(lm, tok, gp, 20)
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 stop_token_ids=stop)
    reqs = [eng.submit(gp, 20, grammar=_grammar(tok)) for _ in range(3)]
    eng.run()
    for r in reqs:
        assert r.finished
        assert r.tokens[:20] == want[:20]


def test_paged_spec_grammar_equals_dense(lm, tok):
    gp = tok.encode("<|user|>give me json<|end|><|assistant|>")
    stop = list(tok.eos_token_ids)
    want = _single_constrained(lm, tok, gp, 24)
    eng = SpeculativePagedBatchEngine(
        lm, batch_size=2, draft_block=4, stop_token_ids=stop,
        num_pages=32, page_size=32,
    )
    rg = eng.submit(gp, 24, grammar=_grammar(tok))
    rp = eng.submit([9, 8, 7], 24)
    eng.run()
    assert rg.tokens[:24] == want[:24]
    assert rp.finished


def test_spec_batched_grammar_formatting_knobs(lm, tok):
    """Exact-format grammars (any_whitespace=False, indent) ride the
    speculative batched path unchanged: the constrained slot's stream ==
    the single-stream constrained loop with the same knobs, and the
    emitted text IS the exact indent-2 serialization."""
    gp = tok.encode("<|user|>json<|end|><|assistant|>")
    stop = list(tok.eos_token_ids)
    kw = dict(any_whitespace=False, indent=2)
    want = _single_constrained(lm, tok, gp, 32, **kw)
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 stop_token_ids=stop)
    rg = eng.submit(gp, 32, grammar=_grammar(tok, **kw))
    eng.run()
    assert rg.tokens[:32] == want[:32]
    if want[-1] in stop:
        text = tok.decode([t for t in want if t not in stop])
        obj = json.loads(text)
        assert json.dumps(obj, indent=2) == text


def test_self_draft_engine_grammar_overrides_device_chain(lm, tok):
    """In draft_layers mode a grammar slot falls back to HOST drafting (its
    masks must be known pre-dispatch) while plain slots keep the device
    self-draft — both streams stay exact."""
    gp = tok.encode("<|user|>json<|end|><|assistant|>")
    pp = [40, 41, 42, 40, 41, 42]
    stop = list(tok.eos_token_ids)
    want_g = _single_constrained(lm, tok, gp, 20)
    want_p = lm.generate_list(np.asarray(pp), 20, stop_token_ids=stop)
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 draft_layers=1, stop_token_ids=stop)
    rg = eng.submit(gp, 20, grammar=_grammar(tok))
    rp = eng.submit(pp, 20)
    eng.run()
    assert rg.tokens[:20] == want_g[:20]
    assert rp.tokens[:20] == want_p[:20]


def test_spec_batched_grammar_sampled_valid(lm, tok):
    """Random model + temperature sampling: every constrained stream must
    be a valid prefix under the schema (the decisive grammar property)."""
    gp = tok.encode("<|user|>weather<|end|><|assistant|>")
    eng = SpeculativeBatchEngine(
        lm, batch_size=2, draft_block=4,
        sampling=SamplingParams(temperature=1.0, top_k=40),
        stop_token_ids=list(tok.eos_token_ids),
    )
    reqs = [eng.submit(gp, 64, grammar=_grammar(tok), seed=s) for s in (3, 9, 27)]
    eng.run()
    for r in reqs:
        text = tok.decode(r.tokens, skip_special_tokens=True).strip()
        m = JsonMatcher(SCHEMA)
        assert m.feed_text(text), f"invalid constrained output: {text!r}"
        if m.is_complete():
            obj = json.loads(text)
            assert obj["city"] in ("Paris", "Rome")


def test_regex_grammar_batched(lm, tok):
    gp = tok.encode("<|user|>code<|end|><|assistant|>")
    stop = list(tok.eos_token_ids)
    pattern = r"[A-Z]{2}-[0-9]{3}"
    want = list(
        constrained_generate(
            lm, np.asarray(gp), 16,
            GrammarSession(tok, regex=pattern, stop_token_ids=tok.eos_token_ids),
            stop_token_ids=stop,
        )
    )
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 stop_token_ids=stop)
    r = eng.submit(gp, 16, grammar=GrammarSession(tok, regex=pattern))
    eng.run()
    assert r.tokens[:16] == want[:16]
    text = tok.decode(r.tokens, skip_special_tokens=True).strip()
    import re

    assert re.fullmatch(pattern, text) or len(r.tokens) >= 16, text


def test_chat_session_grammar(lm, tok):
    """ChatSession.reply(grammar=...) constrains the turn; with a chain
    speculator the stream is identical (grammar speculation is exact)."""
    from uzu_tpu.engine.speculation import NgramSpeculator
    from uzu_tpu.sessions.chat import ChatSession

    plain = ChatSession(lm, tok).reply(
        "give me json", sampling=SamplingParams(), max_new_tokens=32,
        grammar=_grammar(tok),
    )
    m = JsonMatcher(SCHEMA)
    assert m.feed_text(plain.text.strip()), plain.text

    spec_sess = ChatSession(lm, tok,
                            speculator=NgramSpeculator(max_ngram=3, k=4))
    spec = spec_sess.reply("give me json", sampling=SamplingParams(),
                           max_new_tokens=32, grammar=_grammar(tok))
    assert spec.text == plain.text


def test_openai_server_response_format(chat_dir):
    """Single-stream ChatCompletionServer: response_format flows through
    the session's grammar path."""
    from uzu_tpu.server.openai import ChatCompletionServer
    from uzu_tpu.sessions.chat import ChatSession

    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    srv = ChatCompletionServer(ChatSession(lm, tok))
    out = srv.handle_chat({
        "messages": [{"role": "user", "content": "json"}],
        "max_tokens": 48,
        "temperature": 1.0,
        "top_k": 40,
        "response_format": {
            "type": "json_schema",
            "json_schema": {"name": "trip", "schema": SCHEMA},
        },
    })
    text = out["choices"][0]["message"]["content"].strip()
    assert JsonMatcher(SCHEMA).feed_text(text), text
    with pytest.raises(ValueError, match="response_format"):
        srv.handle_chat({
            "messages": [{"role": "user", "content": "x"}],
            "response_format": {"type": "nope"},
        })


def test_server_response_format(chat_dir):
    """BatchedChatServer: OpenAI response_format=json_schema flows into a
    grammar slot; a non-speculative server rejects it with ValueError."""
    from uzu_tpu.server.batched import BatchedChatServer

    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    body = {
        "messages": [{"role": "user", "content": "give me json"}],
        "max_tokens": 48,
        "response_format": {
            "type": "json_schema",
            "json_schema": {"name": "trip", "schema": SCHEMA},
        },
    }
    srv = BatchedChatServer(lm, tok, batch_size=2, speculate="ngram",
                            sampling=SamplingParams(temperature=1.0, top_k=40))
    try:
        out = srv.handle_chat(dict(body))
        text = out["choices"][0]["message"]["content"].strip()
        assert JsonMatcher(SCHEMA).feed_text(text), text
    finally:
        srv.shutdown()

    srv2 = BatchedChatServer(lm, tok, batch_size=2)
    try:
        with pytest.raises(ValueError, match="speculative"):
            srv2.handle_chat(dict(body))
    finally:
        srv2.shutdown()


def test_penalty_and_grammar_neighbors(lm, tok):
    """One speculative engine serves a PENALIZED slot and a GRAMMAR slot in
    the same batch (the unified feature matrix — VERDICT r2 #5): each
    stream matches its solo-engine run bit-exactly."""
    gp = tok.encode("<|user|>json<|end|><|assistant|>")
    pp = [9, 8, 7, 6, 5]
    stop = list(tok.eos_token_ids)

    ref_p = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                   stop_token_ids=stop)
    wp = ref_p.submit(pp, 16, presence_penalty=1.2, frequency_penalty=0.4)
    ref_p.run()
    ref_g = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                   stop_token_ids=stop)
    wg = ref_g.submit(gp, 16, grammar=_grammar(tok))
    ref_g.run()

    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 stop_token_ids=stop)
    rp = eng.submit(pp, 16, presence_penalty=1.2, frequency_penalty=0.4)
    rg = eng.submit(gp, 16, grammar=_grammar(tok))
    eng.run()
    assert rp.tokens == wp.tokens
    assert rg.tokens == wg.tokens


def test_server_unified_feature_matrix(chat_dir):
    """ONE server config (speculate="self") serves penalties AND
    response_format with no 400s — the reference never rejects a sampling
    field (cli/src/server/chat_completions.rs)."""
    from uzu_tpu.server.batched import BatchedChatServer

    lm = LanguageModel.from_dir(chat_dir, max_context=256,
                                prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    srv = BatchedChatServer(lm, tok, batch_size=2, speculate="self",
                            sampling=SamplingParams(temperature=1.0, top_k=40))
    try:
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "go"}],
            "max_tokens": 12, "frequency_penalty": 1.5,
            "presence_penalty": 0.5,
        })
        assert out["usage"]["completion_tokens"] >= 1
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "give me json"}],
            "max_tokens": 48,
            "response_format": {
                "type": "json_schema",
                "json_schema": {"name": "trip", "schema": SCHEMA},
            },
        })
        text = out["choices"][0]["message"]["content"].strip()
        assert JsonMatcher(SCHEMA).feed_text(text), text
    finally:
        srv.shutdown()


def test_server_request_tools_roundtrip(chat_dir):
    """Request-level tools render into the prompt, and tool-call markup in
    the constrained output comes back as OpenAI tool_calls with
    finish_reason "tool_calls" (a regex grammar forces the markup — the
    grammar, not the random model, guarantees it)."""
    from uzu_tpu.server.batched import BatchedChatServer

    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    srv = BatchedChatServer(lm, tok, batch_size=2, speculate="ngram",
                            sampling=SamplingParams(temperature=1.0, top_k=40))
    try:
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "what time is it"}],
            "max_tokens": 64,
            "tools": [{"type": "function", "function": {
                "name": "get_time", "description": "clock", "parameters": {}}}],
            "response_format": {
                "type": "regex",
                "pattern": '<tool_call>\\{"name": "get_time", '
                           '"arguments": \\{\\}\\}</tool_call>',
            },
        })
        choice = out["choices"][0]
        assert choice["finish_reason"] == "tool_calls", choice
        calls = choice["message"]["tool_calls"]
        assert calls[0]["function"]["name"] == "get_time"
    finally:
        srv.shutdown()

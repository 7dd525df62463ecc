"""OpenAI logprobs through the batch engines.

Semantics: log-softmax of the RAW model logits (pre-temperature/masking),
one entry per emitted token (admission first token included), plus the
top-N alternatives. Pinned: under greedy decoding the emitted token IS the
distribution argmax, so its logprob equals the best alternative's and the
top-1 id equals the token — across dense, paged, and both speculative
engines; the first entry also matches an independent prefill forward.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from uzu_tpu import LanguageModel
from uzu_tpu.engine.batch import BatchEngine
from uzu_tpu.engine.batch_spec import (
    SpeculativeBatchEngine,
    SpeculativePagedBatchEngine,
)
from uzu_tpu.engine.paged_batch import PagedBatchEngine
from uzu_tpu.tools.synth import llama_config, synthesize

PROMPT = [9, 8, 7, 6, 5]
N = 12


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("lp_model")), seed=13,
                   dtype=np.float32)
    return LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))


@pytest.fixture(scope="module")
def first_ref(lm):
    """Independent reference for the FIRST token's logprob: one prefill."""
    state = lm.new_state()
    logits, _ = lm.prefill(state, np.asarray(PROMPT, np.int32))
    lp = jax.nn.log_softmax(jnp.asarray(logits, jnp.float32))
    return np.asarray(lp)


ENGINES = [
    ("dense", BatchEngine, {}),
    ("paged", PagedBatchEngine, {"num_pages": 16, "page_size": 16}),
    ("spec", SpeculativeBatchEngine, {"draft_block": 4}),
    ("spec_paged", SpeculativePagedBatchEngine,
     {"draft_block": 4, "num_pages": 16, "page_size": 16}),
]


@pytest.mark.parametrize("name,cls,kw", ENGINES)
def test_greedy_logprobs(lm, first_ref, name, cls, kw):
    eng = cls(lm, batch_size=2, stop_token_ids=[], **kw)
    r = eng.submit(PROMPT, N, logprobs=3)
    r2 = eng.submit([1, 2, 3], N)  # logprob-free neighbor unaffected
    eng.run()
    assert len(r.tokens) == N
    assert len(r.logprob_content) == N, name
    for tok, (lp, tops) in zip(r.tokens, r.logprob_content):
        assert tops[0][0] == tok, "greedy token must be the top-1 id"
        assert abs(tops[0][1] - lp) < 1e-5
        assert len(tops) == 3
        assert tops[0][1] >= tops[1][1] >= tops[2][1]
        assert lp <= 0.0
    # first entry against the independent prefill forward
    lp0, tops0 = r.logprob_content[0]
    assert abs(lp0 - float(first_ref[r.tokens[0]])) < 1e-3, name
    assert r2.logprob_content == []


def test_long_admission_first_logprob(lm, tmp_path):
    """A chunked (long-prompt) admission still records the first token's
    logprob entry."""
    long_prompt = list((np.arange(40) * 7) % 250)
    eng = BatchEngine(lm, batch_size=2, stop_token_ids=[])
    r = eng.submit(long_prompt, 6, logprobs=2)
    eng.run()
    assert len(r.logprob_content) == 6
    assert r.logprob_content[0][1][0][0] == r.tokens[0]


def test_server_logprobs(tmp_path_factory):
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("lp_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    srv = BatchedChatServer(lm2, tok, batch_size=2)
    try:
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 8, "logprobs": True, "top_logprobs": 2,
        })
        content = out["choices"][0]["logprobs"]["content"]
        assert 1 <= len(content) <= 8
        for e in content:
            assert isinstance(e["token"], str) and e["logprob"] <= 0.0
            assert len(e["top_logprobs"]) == 2
    finally:
        srv.shutdown()


def test_stream_include_usage(tmp_path_factory):
    """stream_options.include_usage: a final usage chunk on both servers."""
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.server.openai import ChatCompletionServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.sessions.chat import ChatSession
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("usage_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    body = {"messages": [{"role": "user", "content": "hi"}], "max_tokens": 6,
            "stream": True, "stream_options": {"include_usage": True}}

    srv = BatchedChatServer(lm2, tok, batch_size=2)
    try:
        chunks = list(srv.handle_chat(dict(body)))
    finally:
        srv.shutdown()
    assert chunks[-1]["usage"]["completion_tokens"] > 0
    assert chunks[-1]["choices"] == []

    srv2 = ChatCompletionServer(ChatSession(lm2, tok))
    chunks2 = list(srv2.handle_chat(dict(body)))
    assert chunks2[-1]["usage"]["completion_tokens"] > 0


def test_single_stream_logprobs(lm, first_ref):
    """generate_resumable(logprobs=n): one entry per yielded token, greedy
    argmax consistency, first entry matches the prefill forward."""
    gen = lm.generate_resumable(None, np.asarray(PROMPT, np.int32), N,
                                stop_token_ids=[], logprobs=3)
    toks = list(gen)
    assert len(gen.logprob_content) == len(toks) == N
    for tok, (lp, tops) in zip(toks, gen.logprob_content):
        assert tops[0][0] == tok
        assert abs(tops[0][1] - lp) < 1e-5
    assert abs(gen.logprob_content[0][0] - float(first_ref[toks[0]])) < 1e-3
    # entries match the batch engine's for the same greedy request
    eng = BatchEngine(lm, batch_size=2, stop_token_ids=[])
    r = eng.submit(PROMPT, N, logprobs=3)
    eng.run()
    for (a, _), (b, _) in zip(gen.logprob_content, r.logprob_content):
        assert abs(a - b) < 1e-3


def test_single_server_logprobs(tmp_path_factory):
    from uzu_tpu.server.openai import ChatCompletionServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.sessions.chat import ChatSession
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("lp_srv1")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    srv = ChatCompletionServer(ChatSession(lm2, tok))
    out = srv.handle_chat({
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 8, "logprobs": True, "top_logprobs": 2,
    })
    content = out["choices"][0]["logprobs"]["content"]
    assert 1 <= len(content) <= 8
    for e in content:
        assert isinstance(e["token"], str) and e["logprob"] <= 0.0
        assert len(e["top_logprobs"]) == 2


def test_batched_streaming_logprobs(tmp_path_factory):
    """Streaming + logprobs: every generated token's entry rides a chunk
    (on the chunk carrying its text, or a bare chunk when the token
    surfaced no text), in raw-token order."""
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("slp_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    srv = BatchedChatServer(lm2, tok, batch_size=2)
    try:
        chunks = list(srv.handle_chat({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 8, "stream": True,
            "logprobs": True, "top_logprobs": 2,
        }))
        entries = [c["choices"][0]["logprobs"]["content"][0]
                   for c in chunks
                   if c["choices"] and "logprobs" in c["choices"][0]]
        # non-stream reference for the same request (greedy default):
        ref = srv.handle_chat({
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 8, "logprobs": True, "top_logprobs": 2,
        })["choices"][0]["logprobs"]["content"]
        assert len(entries) == len(ref)
        for a, b in zip(entries, ref):
            assert a["token"] == b["token"]
            assert abs(a["logprob"] - b["logprob"]) < 1e-6
            assert len(a["top_logprobs"]) == 2
    finally:
        srv.shutdown()

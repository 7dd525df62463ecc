"""Request cancellation in the batch engines.

cancel() must work at every lifecycle stage — queued, mid-admission,
mid-stream with chunks in flight — and release resources immediately: the
device executes dispatches in program order, so an in-flight chunk's
writes land before any later dispatch (admission into reused slots/pages)
executes. The decisive invariant: a surviving request's stream is
unaffected by a neighbor's cancellation, and a request admitted into the
cancelled slot afterwards matches its solo run exactly.
"""

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.batch import BatchEngine
from uzu_tpu.engine.paged_batch import PagedBatchEngine
from uzu_tpu.tools.synth import llama_config, synthesize


@pytest.fixture(scope="module")
def lm(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("cancel_model")), seed=13,
                   dtype=np.float32)
    return LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))


ENGINES = [
    (BatchEngine, {}),
    (PagedBatchEngine, {"num_pages": 16, "page_size": 16}),
]


@pytest.mark.parametrize("cls,kw", ENGINES)
def test_cancel_queued(lm, cls, kw):
    eng = cls(lm, batch_size=1, stop_token_ids=[], **kw)
    r1 = eng.submit([1, 2, 3], 8)
    r2 = eng.submit([4, 5, 6], 8)  # queued behind the single slot
    assert eng.cancel(r2, "cancelled")
    eng.run()
    assert r1.finished and len(r1.tokens) == 8
    assert r2.finished and r2.finish_reason == "cancelled" and r2.tokens == []


@pytest.mark.parametrize("cls,kw", ENGINES)
def test_cancel_midstream_isolates_neighbor_and_reuses_slot(lm, cls, kw):
    solo = lm.generate_list(np.asarray([9, 8, 7]), 16, stop_token_ids=[])
    solo3 = lm.generate_list(np.asarray([40, 41]), 12, stop_token_ids=[])
    eng = cls(lm, batch_size=2, decode_chunk=2, stop_token_ids=[], **kw)
    survivor = eng.submit([9, 8, 7], 16)
    victim = eng.submit([1, 2, 3], 64)
    for _ in range(4):
        eng.step()
    assert eng.cancel(victim, "cancelled")
    assert victim.finished and victim.finish_reason == "cancelled"
    # the freed slot admits a NEW request whose stream must match solo
    late = eng.submit([40, 41], 12)
    eng.run()
    assert survivor.tokens[:16] == solo[:16]
    assert late.tokens[:12] == solo3[:12]
    assert not eng.cancel(victim)  # idempotent: already finished


@pytest.mark.parametrize("cls,kw", ENGINES)
def test_cancel_during_long_admission(lm, cls, kw):
    """A prompt longer than the largest prefill bucket cancels mid-chunked
    admission (interleaved with an active stream); the reserved slot (and
    its pages) free up for the queue. admit_greedy=False keeps the
    admission spanning scheduler steps so a cancel can land mid-way (under
    greedy-fill an admission completes within one step())."""
    eng = cls(lm, batch_size=2, stop_token_ids=[], admit_greedy=False, **kw)
    active = eng.submit([1, 2, 3], 24)
    eng.step()  # active stream goes live: admissions now interleave
    long_req = eng.submit(list((np.arange(48) * 7) % 250), 8)
    follow = eng.submit([5, 6], 6)
    eng.step()  # ONE admission dispatch: the long prefill starts
    assert eng._admitting is not None and eng._admitting[0] is long_req
    assert eng.cancel(long_req, "cancelled")
    assert eng._admitting is None
    eng.run()
    assert long_req.finished and long_req.finish_reason == "cancelled"
    assert follow.finished and len(follow.tokens) == 6
    assert active.finished and len(active.tokens) == 24


def test_cancel_releases_pages(lm):
    eng = PagedBatchEngine(lm, batch_size=2, num_pages=16, page_size=16,
                           stop_token_ids=[], apc_max_entries=0)
    free0 = eng.pool.free_pages
    r = eng.submit([1, 2, 3, 4, 5], 32)
    eng.step()
    assert eng.pool.free_pages < free0
    eng.cancel(r)
    assert eng.pool.free_pages == free0


# -- OpenAI `stop` sequences ---------------------------------------------------


def test_stop_strings_monitor_unit():
    from uzu_tpu.sessions.parser import StopStrings

    m = StopStrings(["STOP", "##"])
    out, hit = "", False
    for d in ["hel", "lo S", "TO", "Py"]:
        r, hit = m.push(d)
        out += r
        if hit:
            break
    assert out == "hello " and hit
    m2 = StopStrings(["zzz"])
    assert "".join(m2.push(d)[0] for d in ["ab", "cd"]) + m2.finish() == "abcd"


def test_session_stop_strings(tmp_path_factory):
    """Generation halts at the stop sequence with exact char truncation
    (a regex grammar forces the text, so the cut point is deterministic)."""
    from uzu_tpu.grammar import GrammarSession
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.sessions.chat import ChatSession
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("stop_model")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    sess = ChatSession(lm2, tok)
    reply = sess.reply(
        "go", max_new_tokens=48,
        grammar=GrammarSession(tok, regex="abc STOP def"),
        stop_strings=["STOP"],
    )
    assert reply.text == "abc "
    assert reply.finish_reason == "stop"


def test_batched_server_stop_strings(tmp_path_factory):
    """`stop` through the batched server: the response clips exactly before
    the sequence and the scheduler cancels the still-running request."""
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("stop_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    srv = BatchedChatServer(lm2, tok, batch_size=2, speculate="ngram")
    try:
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "go"}],
            "max_tokens": 64,
            "stop": "STOP",
            "response_format": {"type": "regex", "pattern": "abc STOP def"},
        })
        choice = out["choices"][0]
        assert choice["message"]["content"] == "abc ", choice
        assert choice["finish_reason"] == "stop"

        # streaming: deltas never cross the stop sequence
        chunks = list(srv.handle_chat({
            "messages": [{"role": "user", "content": "go"}],
            "max_tokens": 64,
            "stream": True,
            "stop": ["STOP"],
            "response_format": {"type": "regex", "pattern": "abc STOP def"},
        }))
        text = "".join(c["choices"][0]["delta"].get("content", "")
                       for c in chunks)
        assert text == "abc ", text
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
    finally:
        srv.shutdown()


def test_batched_stream_disconnect_cancels(tmp_path_factory):
    """Closing the SSE generator mid-stream (client disconnect) cancels the
    request and frees its slot for the queue."""
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("disc_model")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    srv = BatchedChatServer(lm2, Tokenizer(d), batch_size=1)
    try:
        gen = srv.handle_chat({"messages": [{"role": "user", "content": "x"}],
                               "max_tokens": 200, "stream": True,
                               "stop": ["\x00never"]})
        next(gen)  # role chunk: request submitted and streaming
        gen.close()
        with srv._lock:
            reqs = [s.request for s in srv.engine.slots] + list(srv.engine.queue)
        # the slot either already freed or the request is finished=cancelled
        out = srv.handle_chat({"messages": [{"role": "user", "content": "y"}],
                               "max_tokens": 4})
        assert out["usage"]["completion_tokens"] > 0  # slot reusable
    finally:
        srv.shutdown()


def test_single_server_concurrent_streams_serialized(tmp_path_factory):
    """Two concurrent STREAMING requests must not interleave the shared
    ChatSession (the generator body holds the session lock): each stream's
    text equals its serial run."""
    import threading

    from uzu_tpu.server.openai import ChatCompletionServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.sessions.chat import ChatSession
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("ser_model")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    srv = ChatCompletionServer(ChatSession(lm2, tok))

    def run_stream(content, out):
        gen = srv.handle_chat({"messages": [{"role": "user", "content": content}],
                               "max_tokens": 12, "stream": True})
        out.append("".join(c["choices"][0]["delta"].get("content", "")
                           for c in gen))

    serial = {}
    for content in ("alpha", "beta"):
        box = []
        run_stream(content, box)
        serial[content] = box[0]
    boxes = {c: [] for c in ("alpha", "beta")}
    threads = [threading.Thread(target=run_stream, args=(c, boxes[c]))
               for c in boxes]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for c in boxes:
        assert boxes[c][0] == serial[c], c


def test_batched_server_stats_endpoint(tmp_path_factory):
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("stats_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    srv = BatchedChatServer(lm2, Tokenizer(d), batch_size=2, paged=True,
                            speculate="ngram", page_size=32, num_pages=16)
    try:
        srv.handle_chat({"messages": [{"role": "user", "content": "x"}],
                         "max_tokens": 8})
        stats = srv.handle_stats()
        assert stats["engine"] == "SpeculativePagedBatchEngine"
        assert stats["batch_size"] == 2
        assert stats["pages"]["total"] == 15  # one reserved trash page
        assert stats["speculation"]["verify_passes"] > 0
        assert 0.0 <= stats["speculation"]["acceptance"] <= 1.0
    finally:
        srv.shutdown()

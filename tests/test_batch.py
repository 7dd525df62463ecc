"""Continuous batching tests.

The decisive invariant: batched greedy output per request == single-request
greedy output, regardless of admission order, slot reuse, or ragged
completion. (No reference counterpart — this component is the TPU build's
replacement for uzu's serialized single-session serving.)
"""

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.batch import BatchEngine
from uzu_tpu.engine.sampling import SamplingParams
from uzu_tpu.tools.synth import llama_config, synthesize


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    return synthesize(cfg, str(tmp_path_factory.mktemp("batch_model")), seed=13, dtype=np.float32)


@pytest.fixture(scope="module")
def lm(model_dir):
    return LanguageModel.from_dir(model_dir, max_context=128, prefill_buckets=(16,))


PROMPTS = [
    [1, 2, 3],
    [9, 8, 7, 6, 5],
    [42, 17],
    [100, 101, 102, 103],
    [7, 7, 7],
]


def test_batched_equals_single(lm):
    singles = {
        i: lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
        for i, p in enumerate(PROMPTS[:4])
    }
    eng = BatchEngine(lm, batch_size=4, decode_chunk=4, stop_token_ids=[])
    reqs = [eng.submit(p, 12) for p in PROMPTS[:4]]
    eng.run()
    for i, r in enumerate(reqs):
        assert r.finished
        assert r.tokens[:12] == singles[i][:12], f"request {i} diverged"


def test_more_requests_than_slots(lm):
    """5 requests through 2 slots: slot reuse + queueing."""
    singles = [lm.generate_list(np.asarray(p), 8, stop_token_ids=[]) for p in PROMPTS]
    eng = BatchEngine(lm, batch_size=2, decode_chunk=4, stop_token_ids=[])
    reqs = [eng.submit(p, 8) for p in PROMPTS]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished and r.finish_reason == "length"
        assert r.tokens[:8] == want[:8]


def test_ragged_lengths(lm):
    """Different max_new_tokens finish at different chunks."""
    eng = BatchEngine(lm, batch_size=3, decode_chunk=4, stop_token_ids=[])
    r1 = eng.submit(PROMPTS[0], 3)
    r2 = eng.submit(PROMPTS[1], 10)
    r3 = eng.submit(PROMPTS[2], 17)
    eng.run()
    assert [len(r.tokens) for r in (r1, r2, r3)] == [3, 10, 17]
    for r, p in zip((r1, r2, r3), PROMPTS):
        want = lm.generate_list(np.asarray(p), len(r.tokens), stop_token_ids=[])
        assert r.tokens == want


def test_stop_tokens_finish_slot(lm):
    base = lm.generate_list(np.asarray(PROMPTS[0]), 12, stop_token_ids=[])
    stop = base[4]
    want = lm.generate_list(np.asarray(PROMPTS[0]), 12, stop_token_ids=[stop])
    eng = BatchEngine(lm, batch_size=2, decode_chunk=4, stop_token_ids=[stop])
    r = eng.submit(PROMPTS[0], 12)
    eng.run()
    assert r.finish_reason == "stop"
    assert r.tokens[-1] == stop
    assert r.tokens == want


def test_late_submission_joins_batch(lm):
    """A request submitted mid-flight is admitted into a free slot."""
    eng = BatchEngine(lm, batch_size=2, decode_chunk=2, stop_token_ids=[])
    r1 = eng.submit(PROMPTS[0], 12)
    eng.step()  # admit r1, decode one chunk
    r2 = eng.submit(PROMPTS[1], 6)
    eng.run()
    assert r1.finished and r2.finished
    want1 = lm.generate_list(np.asarray(PROMPTS[0]), 12, stop_token_ids=[])
    want2 = lm.generate_list(np.asarray(PROMPTS[1]), 6, stop_token_ids=[])
    assert r1.tokens == want1
    assert r2.tokens == want2
    assert r1.ttft >= 0 and r2.ttft >= 0


def test_batched_server_concurrent_requests(tmp_path_factory):
    """Concurrent HTTP requests share the batch engine and all complete."""
    import json
    import threading
    import urllib.request

    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import serve_batched
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("batch_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    httpd = serve_batched(lm, Tokenizer(d), port=0, batch_size=2, decode_chunk=4)
    port = httpd.server_address[1]
    results = {}

    def call(i):
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": f"hello {i}"}],
                             "max_tokens": 6}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            results[i] = json.load(r)

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    try:
        assert len(results) == 4
        for r in results.values():
            assert r["object"] == "chat.completion"
            assert r["usage"]["completion_tokens"] > 0

        # streaming against the batched server
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "s"}],
                             "max_tokens": 5, "stream": True}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            lines = [l for l in r.read().decode().splitlines() if l.startswith("data: ")]
        assert lines[-1] == "data: [DONE]"
    finally:
        httpd.batch_server.shutdown()
        httpd.shutdown()


def test_long_admission_does_not_stall_decode(lm):
    """Head-of-line property of admit_greedy=False: admitting a long
    (multi-chunk) prompt interleaves its prefill chunks with decode chunks,
    so an active stream keeps producing tokens throughout the admission
    window instead of freezing for the whole prefill. (The r5 default is
    greedy-fill — throughput-optimal; this pins the opt-out policy.)"""
    # long prompt: 96 tokens through 16-token buckets = 6 prefill chunks
    long_prompt = [(i * 11) % 256 for i in range(96)]
    want_a = lm.generate_list(np.asarray([1, 2, 3]), 40, stop_token_ids=[])
    want_b = lm.generate_list(np.asarray(long_prompt), 8, stop_token_ids=[])

    eng = BatchEngine(lm, batch_size=2, decode_chunk=4, stop_token_ids=[],
                      admit_greedy=False)
    ra = eng.submit([1, 2, 3], 40)
    eng.step()  # ra admitted + first decode chunk in flight
    rb = eng.submit(long_prompt, 8)

    gains = []  # ra tokens gained per scheduler step while rb is admitting
    admit_steps = 0
    while eng._admitting is not None or not any(
        (not s.free) and s.request is rb for s in eng.slots
    ):
        before = len(ra.tokens)
        eng.step()
        gains.append(len(ra.tokens) - before)
        admit_steps += 1
        assert admit_steps < 50, "admission never completed"
    # admission spanned multiple scheduler steps (one prefill chunk each)...
    assert admit_steps >= 6, f"expected chunked admission, got {admit_steps} steps"
    # ...and ra kept streaming during the window (pipelined fetch lags one
    # chunk, so allow the first step to gain nothing)
    assert sum(gains) >= (admit_steps - 2) * 4, (gains, admit_steps)
    eng.run()
    assert ra.tokens == want_a and rb.tokens == want_b


def test_long_admission_paged_engine_interleaves(model_dir):
    """Same head-of-line property for the paged engine."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    lm = LanguageModel.from_dir(model_dir, max_context=256, prefill_buckets=(16,))
    long_prompt = [(i * 11) % 256 for i in range(96)]
    want_a = lm.generate_list(np.asarray([1, 2, 3]), 40, stop_token_ids=[])
    want_b = lm.generate_list(np.asarray(long_prompt), 8, stop_token_ids=[])

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[],
                           admit_greedy=False)
    ra = eng.submit([1, 2, 3], 40)
    eng.step()
    rb = eng.submit(long_prompt, 8)
    gains = []
    admit_steps = 0
    while eng._admitting is not None or not any(
        (not s.free) and s.request is rb for s in eng.slots
    ):
        before = len(ra.tokens)
        eng.step()
        gains.append(len(ra.tokens) - before)
        admit_steps += 1
        assert admit_steps < 50, "admission never completed"
    assert admit_steps >= 6, f"expected chunked admission, got {admit_steps} steps"
    assert sum(gains) >= (admit_steps - 2) * 4, (gains, admit_steps)
    eng.run()
    assert ra.tokens == want_a and rb.tokens == want_b


def test_greedy_admission_fills_slots_first(lm, model_dir):
    """r5 default policy: step() fills every free slot (including multi-
    chunk long admissions, run to completion) before dispatching a decode
    chunk — a decode chunk costs the same at occupancy 1 as at occupancy B,
    so admitting first is throughput-optimal. Streams are unchanged."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    long_prompt = [(i * 11) % 256 for i in range(96)]
    prompts = [[1, 2, 3], long_prompt, [7, 8], [9]]
    want = [lm.generate_list(np.asarray(p), 8, stop_token_ids=[])
            for p in prompts]

    eng = BatchEngine(lm, batch_size=4, decode_chunk=4, stop_token_ids=[])
    reqs = [eng.submit(p, 8) for p in prompts]
    eng.step()
    assert eng.num_active == 4 and eng._admitting is None
    eng.run()
    assert [r.tokens for r in reqs] == want

    lmp = LanguageModel.from_dir(model_dir, max_context=256,
                                 prefill_buckets=(16,))
    wantp = [lmp.generate_list(np.asarray(p), 8, stop_token_ids=[])
             for p in prompts]
    engp = PagedBatchEngine(lmp, batch_size=4, decode_chunk=4, num_pages=65,
                            page_size=16, stop_token_ids=[])
    reqsp = [engp.submit(p, 8) for p in prompts]
    engp.step()
    assert engp.num_active == 4 and engp._admitting is None
    engp.run()
    assert [r.tokens for r in reqsp] == wantp


# -- speculative continuous batching -----------------------------------------


def test_spec_batched_equals_single(lm):
    """Batched chain-speculative greedy == single-request plain greedy,
    across slot reuse and mixed repetitive/non-repetitive prompts."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    prompts = [
        [5, 6, 5, 6, 5, 6, 5],       # ngram-friendly
        [1, 2, 3],                    # cold
        [9, 9, 9, 9],                 # repetitive
        [40, 41, 42, 40, 41, 42],
        [17, 23],
    ]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[]) for p in prompts]
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4, stop_token_ids=[])
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for i, (r, want) in enumerate(zip(reqs, singles)):
        assert r.finished and r.finish_reason == "length"
        assert r.tokens[:12] == want[:12], f"request {i} diverged"
    assert eng.metrics.num_verify_passes > 0


def test_spec_batched_stop_tokens(lm):
    """Stop tokens inside an accepted block clip emission exactly like the
    plain engine."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    # find a stop token that actually occurs mid-stream
    probe = lm.generate_list(np.asarray([5, 6, 5, 6, 5]), 12, stop_token_ids=[])
    stop = probe[5]
    singles = [
        lm.generate_list(np.asarray(p), 12, stop_token_ids=[stop])
        for p in ([5, 6, 5, 6, 5], [1, 2, 3])
    ]
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 stop_token_ids=[stop])
    reqs = [eng.submit(p, 12) for p in ([5, 6, 5, 6, 5], [1, 2, 3])]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens == want


def test_spec_batched_recurrent_mixer(tmp_path):
    """Speculative batching on a GDN hybrid: the vmapped deferred-commit
    replay (defer_ssm) must keep batched speculative greedy == plain."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine
    from uzu_tpu.tools.synth import qwen35_config

    cfg = qwen35_config(num_layers=3, model_dim=64, hidden_dim=128,
                        num_heads=4, num_groups=2, head_dim=16,
                        value_head_dim=16, attn_every=3)
    d = synthesize(cfg, str(tmp_path / "spec_gdn"), seed=7, dtype=np.float32)
    lm2 = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    prompts = [[5, 6, 5, 6, 5, 6], [1, 2, 3, 4]]
    singles = [lm2.generate_list(np.asarray(p), 10, stop_token_ids=[]) for p in prompts]
    eng = SpeculativeBatchEngine(lm2, batch_size=2, draft_block=4, stop_token_ids=[])
    reqs = [eng.submit(p, 10) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens[:10] == want[:10]
    # fused self-draft over the hybrid: draft chain steps the recurrent
    # mixers on the state view, verify replays via defer_ssm
    eng2 = SpeculativeBatchEngine(lm2, batch_size=2, draft_block=3,
                                  draft_layers=2, stop_token_ids=[])
    reqs2 = [eng2.submit(p, 10) for p in prompts]
    eng2.run()
    for r, want in zip(reqs2, singles):
        assert r.finished
        assert r.tokens[:10] == want[:10]


def test_spec_batched_server(tmp_path_factory):
    """speculate=True server serves concurrent requests through the
    speculative engine and matches the plain server's completions."""
    import json
    import threading
    import urllib.request

    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import serve_batched
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("spec_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))

    def run_server(speculate):
        httpd = serve_batched(lm, Tokenizer(d), port=0, batch_size=2,
                              decode_chunk=4, speculate=speculate)
        port = httpd.server_address[1]
        results = {}

        def call(i):
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/v1/chat/completions",
                data=json.dumps({"messages": [{"role": "user",
                                               "content": f"hello {i}"}],
                                 "max_tokens": 6}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=120) as r:
                results[i] = json.load(r)

        threads = [threading.Thread(target=call, args=(i,)) for i in range(3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        httpd.batch_server.shutdown()
        httpd.shutdown()
        return {i: r["choices"][0]["message"]["content"]
                for i, r in results.items()}

    spec = run_server(True)
    plain = run_server(False)
    assert spec == plain
    fused = run_server("fused-self")  # dense spec engine + spec_rounds=8
    assert fused == plain


def test_spec_batched_self_draft(lm):
    """Fused device-side self-draft (layer-truncated, KV shared with the
    target's first layers): batched speculative greedy == plain greedy,
    with nonzero acceptance measured."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    prompts = [[5, 6, 5, 6, 5, 6, 5], [1, 2, 3], [9, 9, 9, 9], [17, 23]]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[]) for p in prompts]
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 draft_layers=1, stop_token_ids=[])
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for i, (r, want) in enumerate(zip(reqs, singles)):
        assert r.finished and r.finish_reason == "length"
        assert r.tokens[:12] == want[:12], f"request {i} diverged"
    assert eng.metrics.num_tokens_proposed > 0


def test_spec_first_token_at_context_horizon(lm):
    """A prompt admitted right at the verify write-room horizon must still
    emit its already-sampled first token (regression: the horizon finish
    used to run before first-token routing and dropped it)."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    # max_context=128, draft_block=8 -> horizon at pos >= 118
    prompt = list((np.arange(120) * 7) % 256)
    want = lm.generate_list(np.asarray(prompt), 1, stop_token_ids=[])
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=8,
                                 stop_token_ids=[])
    r = eng.submit(prompt, 4)
    eng.run()
    assert r.finished
    assert len(r.tokens) >= 1
    assert r.tokens[0] == want[0]
    assert r.first_token_at > 0


def test_dense_prefix_share_admission_exact(lm):
    """Shared-prefix admission (the dense counterpart of paged page
    sharing): a request whose prompt extends a live slot's history admits
    by COPYING the shared KV rows and prefilling only the tail — the
    stream must be bit-identical to a solo full-prefill run, and the
    donor stream unaffected."""
    base = [11, 12, 13, 14, 15, 16, 17, 18]
    p2 = base + [40, 41]
    solo_a = lm.generate_list(np.asarray(base), 20, stop_token_ids=[])
    solo_b = lm.generate_list(np.asarray(p2), 12, stop_token_ids=[])

    eng = BatchEngine(lm, batch_size=2, decode_chunk=4, prefix_min=4,
                      stop_token_ids=[])
    a = eng.submit(base, 20)
    for _ in range(3):
        eng.step()
    b = eng.submit(p2, 12)
    eng.run()
    assert "_batch_prefix_jit" in lm.__dict__  # the share path engaged
    assert b.tokens[:12] == solo_b[:12]
    assert a.tokens[:20] == solo_a[:20]


def test_dense_prefix_share_chat_continuation(lm):
    """The shared history includes the donor's GENERATED tokens: a
    follow-up turn whose prompt embeds the previous reply shares past the
    original prompt."""
    base = [7, 3, 9, 1, 4, 2, 8, 5]
    eng = BatchEngine(lm, batch_size=2, decode_chunk=4, prefix_min=4,
                      stop_token_ids=[])
    a = eng.submit(base, 10)
    eng.run()
    # a finished; its slot is free — admit a live donor again, then share
    a2 = eng.submit(base, 16)
    for _ in range(3):
        eng.step()
    follow = base + a2.tokens[:4] + [99, 98]
    solo = lm.generate_list(np.asarray(follow), 10, stop_token_ids=[])
    b = eng.submit(follow, 10)
    eng.run()
    assert b.tokens[:10] == solo[:10]


def test_dense_prefix_share_gated_off_for_recurrent(tmp_path):
    from uzu_tpu.tools.synth import qwen35_config, synthesize as synth2

    cfg = qwen35_config(num_layers=2, model_dim=64, hidden_dim=128,
                        num_heads=4, num_groups=2, head_dim=16,
                        vocab_size=128, attn_every=2)
    d = synth2(cfg, str(tmp_path / "gdn"), seed=3, dtype=np.float32)
    lm2 = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    eng = BatchEngine(lm2, batch_size=2, prefix_min=4, stop_token_ids=[])
    assert eng.prefix_min == 0  # recurrent mixers cannot slice state


def test_spec_engine_prefix_share_exact(lm):
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    base = [21, 22, 23, 24, 25, 26]
    p2 = base + [50, 51]
    solo = lm.generate_list(np.asarray(p2), 12, stop_token_ids=[])
    eng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                 prefix_min=4, stop_token_ids=[])
    eng.submit(base, 20)
    eng.step()
    b = eng.submit(p2, 12)
    eng.run()
    assert b.tokens[:12] == solo[:12]


def test_paged_prefix_share_chat_continuation(lm):
    """Paged prefix sharing matches against the donor's generated history
    too: a follow-up turn embedding the previous reply shares those full
    pages and the stream stays exact."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    base = [31, 32, 33, 34, 35, 36, 37, 38]
    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=24,
                           page_size=8, stop_token_ids=[])
    a = eng.submit(base, 20)
    for _ in range(4):
        eng.step()
    follow = base + a.tokens[:8] + [90, 91]
    solo = lm.generate_list(np.asarray(follow), 10, stop_token_ids=[])
    b = eng.submit(follow, 10)
    eng.step()  # admits b
    slot_a = next(i for i, s in enumerate(eng.slots) if s.request is a)
    slot_b = next(i for i, s in enumerate(eng.slots) if s.request is b)
    # sharing actually engaged: b's first pages ARE a's physical pages
    # (follow shares >= 16 tokens = 2 full 8-token pages with a's history)
    assert eng.pool.pages(slot_b)[:2] == eng.pool.pages(slot_a)[:2]
    eng.run()
    assert b.tokens[:10] == solo[:10]
    assert a.finished and len(a.tokens) == 20


def test_automatic_prefix_cache_after_finish(lm):
    """A follow-up turn submitted AFTER the previous request finished still
    shares its pages: finished requests retire complete KV pages into an
    LRU prefix cache, and the continuation's stream is exact."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    base = [61, 62, 63, 64, 65, 66, 67, 68]
    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=24,
                           page_size=8, stop_token_ids=[])
    a = eng.submit(base, 16)
    eng.run()  # a finished: its full pages retire into the prefix cache
    assert len(eng._retired) == 1
    retired_pages = eng.pool.pages(next(iter(eng._retired)))
    assert len(retired_pages) == (len(base) + 15) // 8

    follow = base + a.tokens[:8] + [70, 71]
    solo = lm.generate_list(np.asarray(follow), 10, stop_token_ids=[])
    b = eng.submit(follow, 10)
    eng.step()
    slot_b = next(i for i, s in enumerate(eng.slots) if s.request is b)
    assert eng.pool.pages(slot_b)[:2] == retired_pages[:2]  # shared
    eng.run()
    assert b.tokens[:10] == solo[:10]


def test_prefix_cache_evicts_under_pressure(lm):
    """Retired prefixes yield to live requests: a pool sized so the cache
    must be evicted still admits and completes everything, with no
    preemption of live streams."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=9,
                           page_size=8, stop_token_ids=[])
    prompts = [[i, i + 1, i + 2, i + 3, i + 4, i + 5] for i in (1, 40, 80, 120)]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
               for p in prompts]
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished and r.tokens[:12] == want[:12]
        assert r.preempted == 0


def test_prefix_cache_after_stop_finish_exact(lm):
    """The EOS-finish case the APC must survive: a stop-halted slot's held
    stop token must NOT scatter over the last history row (the device once
    froze the write offset ON that row), because those rows are exactly
    what prefix sharing hands to the next turn."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    # find a (prompt, stop index) where the greedy stream's stop token is
    # FRESH (so the stream stops exactly there, sampled IN-SCAN: idx >= 1)
    # and history = len(prompt) + idx lands on a page boundary — the
    # configuration where the frozen-offset bug corrupted the last
    # retired row
    # tiny greedy streams collapse to attractors, so the donor SAMPLES
    # (deterministic per seed): probe its stop-free stream, pick a token
    # whose FIRST occurrence is in-scan (idx >= 1) at a page-aligned
    # history point, then replay with that stop — it fires exactly there.
    from uzu_tpu.engine.sampling import SamplingParams

    samp = SamplingParams(temperature=1.0, top_k=40)
    found = None
    rng = np.random.default_rng(0)
    for _ in range(200):
        p_len = int(rng.integers(6, 16))
        prompt = [int(t) for t in rng.integers(1, 250, p_len)]
        probe = PagedBatchEngine(lm, batch_size=1, decode_chunk=4,
                                 num_pages=24, page_size=8, sampling=samp,
                                 stop_token_ids=[], apc_max_entries=0)
        probe_req = probe.submit(prompt, 8, seed=5)
        probe.run()
        base = probe_req.tokens
        for idx in range(1, 7):
            if (p_len + idx) % 8 == 0 and base[idx] not in base[:idx] \
                    and base[idx] not in prompt:
                found = (prompt, base, idx)
                break
        if found:
            break
    if found is None:
        pytest.skip("no sampled stream with a fresh page-aligned token")
    prompt, base, stop_idx = found
    stop = base[stop_idx]

    def run_continuation(with_donor):
        eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=24,
                               page_size=8, sampling=samp,
                               stop_token_ids=[stop])
        n_pages = (len(prompt) + stop_idx) // 8
        follow = prompt + base[: stop_idx + 1] + [77, 78]
        if with_donor:
            a = eng.submit(prompt, 32, seed=5)
            eng.run()
            assert a.finish_reason == "stop" and len(a.tokens) == stop_idx + 1
            assert len(eng._retired) == 1
            retired_pages = eng.pool.pages(next(iter(eng._retired)))
            assert len(retired_pages) == n_pages
        b = eng.submit(follow, 10, seed=9, logprobs=1,
                       sampling=SamplingParams())  # greedy continuation
        eng.step()
        if with_donor:
            slot_b = next(i for i, s in enumerate(eng.slots)
                          if s.request is b)
            # shared, incl. the row the frozen-offset bug used to
            # overwrite with the held stop token's KV
            assert eng.pool.pages(slot_b)[:n_pages] == retired_pages
        eng.run()
        # logprobs compare BIT-EXACT: tiny attractor models' argmax absorbs
        # a corrupted KV row, but the float distribution cannot
        return b.tokens, [lp for lp, _ in b.logprob_content]

    assert run_continuation(True) == run_continuation(False)


def test_prefix_cache_eviction_spares_the_donor(lm):
    """Under pool pressure the admission must not evict the retired entry
    it is about to share from (the old evict-then-match order did)."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    # usable pool 11 pages of 8; donor history fills 2 pages + overhead
    base = [(i * 3) % 200 for i in range(16)]
    eng = PagedBatchEngine(lm, batch_size=1, decode_chunk=4, num_pages=12,
                           page_size=8, stop_token_ids=[])
    a = eng.submit(base, 17)  # history 16+16 = 32 tokens = 4 full pages
    eng.run()
    assert len(eng._retired) == 1
    rid = next(iter(eng._retired))
    retired_pages = eng.pool.pages(rid)
    assert len(retired_pages) == 4

    follow = base + a.tokens[:16] + [5, 6, 7]
    solo = lm.generate_list(np.asarray(follow), 8, stop_token_ids=[])
    b = eng.submit(follow, 8)
    eng.step()
    slot_b = next(i for i, s in enumerate(eng.slots) if s.request is b)
    assert eng.pool.pages(slot_b)[:4] == retired_pages  # donor survived
    eng.run()
    assert b.tokens[:8] == solo[:8]


def test_batch_ctx_capacity_growth(tmp_path):
    """Dense batched KV starts at one ctx bucket and grows on crossing
    (r4): the capacity switch mid-request must keep output identical to
    single-stream greedy, including a long-prompt admission that forces
    growth before insert."""
    import numpy as np

    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160,
                       num_heads=4, num_groups=2, head_dim=16,
                       vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "bgrow"), seed=9, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=4096, prefill_buckets=(64,))
    rng = np.random.default_rng(3)
    short = rng.integers(0, 256, 40)
    longp = rng.integers(0, 256, 1200)  # > initial 1024 capacity
    want_short = lm.generate_list(short, 48, stop_token_ids=[])
    want_long = lm.generate_list(longp, 16, stop_token_ids=[])

    eng = BatchEngine(lm, batch_size=2, decode_chunk=8, stop_token_ids=[])
    assert eng._ctx_cap == 1024
    r1 = eng.submit(short, 48)
    r2 = eng.submit(longp, 16)  # admission must grow capacity to 2048
    eng.run()
    assert eng._ctx_cap == 2048
    assert r1.tokens == want_short
    assert r2.tokens == want_long

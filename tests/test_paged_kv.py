"""Paged KV cache groundwork: pool allocator + paged append/attend
equivalence with the dense slot-per-position cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uzu_tpu.ops.attention import attention_reference
from uzu_tpu.ops.pallas.paged_attention import paged_decode_attention
from uzu_tpu.models.paged_kv import PagePool, PagePoolOverflow, append_token


def test_page_pool_alloc_share_release():
    pool = PagePool(num_pages=8, page_size=4)
    pages = pool.ensure(0, 10)  # 3 pages
    assert len(pages) == 3 and pool.free_pages == 5
    assert pool.ensure(0, 11) == pages  # still 3
    pool.ensure(1, 4)
    assert pool.free_pages == 4

    # prefix sharing bumps refcounts; release frees only unreferenced pages
    pool.share_prefix(0, 2, 2)
    assert pool.table(2, 4)[:2].tolist() == pages[:2]
    pool.release(0)
    assert pool.free_pages == 5  # page[2] freed; first two still shared
    pool.release(2)
    assert pool.free_pages == 7
    pool.release(1)
    assert pool.free_pages == 8

    with pytest.raises(PagePoolOverflow):
        pool.ensure(9, 8 * 4 + 1)


def test_paged_append_and_attend_matches_dense():
    """Tokens appended through page tables attend identically to the dense
    [C, G, Dh] cache layout."""
    rng = np.random.default_rng(6)
    G, dh, H = 2, 32, 8
    page, P, maxp = 8, 12, 4
    pool = PagePool(num_pages=P, page_size=page)
    k_pool = jnp.zeros((G, P, page, dh), jnp.float32)
    v_pool = jnp.zeros((G, P, page, dh), jnp.float32)

    lengths = [19, 7]
    dense = {}
    for slot, n in enumerate(lengths):
        ks = rng.standard_normal((n, G, dh)).astype(np.float32)
        vs = rng.standard_normal((n, G, dh)).astype(np.float32)
        dense[slot] = (ks, vs)
        for pos in range(n):
            pages = pool.ensure(slot, pos + 1)
            k_pool, v_pool = append_token(
                (k_pool, v_pool), jnp.asarray(ks[pos]), jnp.asarray(vs[pos]),
                pages[pos // page], pos % page,
            )

    q = jnp.asarray(rng.standard_normal((2, H, dh)), jnp.float32)
    table = jnp.asarray(np.stack([pool.table(s, maxp) for s in range(2)]))
    got = paged_decode_attention(
        q, k_pool, v_pool, table, jnp.asarray(lengths, jnp.int32),
        scale=dh ** -0.5, interpret=True,
    )

    for slot, n in enumerate(lengths):
        ks, vs = dense[slot]
        c = maxp * page
        k_dense = np.zeros((c, G, dh), np.float32)
        v_dense = np.zeros((c, G, dh), np.float32)
        k_dense[:n], v_dense[:n] = ks, vs
        want = attention_reference(
            q[slot : slot + 1], jnp.asarray(k_dense), jnp.asarray(v_dense),
            jnp.asarray([n - 1], jnp.int32),
            scale=dh ** -0.5, is_causal=True,
        )
        np.testing.assert_allclose(
            np.asarray(got[slot]), np.asarray(want[0]), rtol=2e-2, atol=2e-2
        )


def test_paged_batch_engine_matches_single(tmp_path):
    """PagedBatchEngine greedy output == single-request dense generation,
    with ragged prompts/lengths, slot reuse, and a pool smaller than
    B x max_context (the capacity win)."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "paged_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))

    prompts = [[1, 2, 3], [9, 8, 7, 6, 5], [42, 17], [5, 5, 5, 5]]
    wants = [lm.generate_list(np.asarray(p), 10, stop_token_ids=[])
             for p in prompts]

    # pool: 28 usable pages of 8 tokens = 224 tokens total — less than
    # 3 slots x 128 max_context would preallocate densely
    eng = PagedBatchEngine(lm, batch_size=3, decode_chunk=4, num_pages=29,
                           page_size=8, stop_token_ids=[], apc_max_entries=0)
    reqs = [eng.submit(p, 10) for p in prompts]
    eng.run()
    for r, want in zip(reqs, wants):
        assert r.finished
        assert r.tokens == want
    assert eng.pool.free_pages == 28  # everything released


def test_paged_engine_stop_tokens(tmp_path):
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "paged_stop"), seed=3, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    base = lm.generate_list(np.asarray([1, 2, 3]), 12, stop_token_ids=[])
    stop = base[5]
    want = lm.generate_list(np.asarray([1, 2, 3]), 12, stop_token_ids=[stop])

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[stop])
    r = eng.submit([1, 2, 3], 12)
    eng.run()
    assert r.finish_reason in ("stop", "length")
    assert r.tokens == want


def test_batched_server_paged_engine(tmp_path):
    """The OpenAI server runs over the paged engine."""
    import json
    import urllib.request

    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import serve_batched
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "paged_srv"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    httpd = serve_batched(lm, Tokenizer(d), port=0, batch_size=2,
                          decode_chunk=4, paged=True, num_pages=65,
                          page_size=8)
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "hi"}],
                             "max_tokens": 6}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.load(r)
        assert out["usage"]["completion_tokens"] > 0
    finally:
        httpd.batch_server.shutdown()
        httpd.shutdown()


def test_paged_prefix_sharing(tmp_path):
    """Two concurrent requests with a common prompt prefix share physical
    pages (refcounted), use fewer pool pages than independent admission,
    and still produce exactly the single-request outputs."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "share_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(32,))

    shared = [(i * 7) % 256 for i in range(20)]  # 2 full pages of 8 + tail
    p1 = shared + [3, 4]
    p2 = shared + [200, 201, 202]
    w1 = lm.generate_list(np.asarray(p1), 8, stop_token_ids=[])
    w2 = lm.generate_list(np.asarray(p2), 8, stop_token_ids=[])

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[], apc_max_entries=0)
    r1 = eng.submit(p1, 8)
    r2 = eng.submit(p2, 8)
    while eng._admit():
        pass
    t1 = eng.pool.table(0, eng.max_pages)
    t2 = eng.pool.table(1, eng.max_pages)
    assert t1[:2].tolist() == t2[:2].tolist()  # 2 shared physical pages
    assert t1[2] != t2[2]
    eng.run()
    assert r1.tokens == w1 and r2.tokens == w2
    assert eng.pool.free_pages == 32


def test_paged_finished_slot_cannot_corrupt_live_pages(tmp_path):
    """Regression: a free/finished slot keeps scattering stale K/V every
    fused decode step. Its page-table row must point at the reserved trash
    page — with a zero-filled row the writes land in physical page 0, the
    first page the allocator hands a LIVE slot, silently corrupting its
    prompt KV."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "trash_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[])
    # empty engine: every table entry must already be the trash page
    assert (np.asarray(eng._tables()) == eng._trash_page).all()

    ra = eng.submit(list(range(1, 13)), 24)  # slot 0; prompt fills page 0
    rb = eng.submit([7, 7], 2)               # slot 1; finishes fast
    for _ in range(6):  # pipelined: processing lags dispatch by one step
        eng.step()
        if rb.finished:
            break
    assert rb.finished
    pages_a = eng.pool.pages(0)
    assert pages_a[0] == 0  # the allocator's first page — the corruption target
    snaps = [np.asarray(kp[:, pages_a[0]]) for kp, _ in eng.pools]
    t = np.asarray(eng._tables())
    assert (t[1] == eng._trash_page).all()  # finished slot's row is trash
    while not ra.finished:
        eng.step()
    # slot 0's prompt page survived the finished slot's stale scatters
    for (kp, _), snap in zip(eng.pools, snaps):
        np.testing.assert_array_equal(np.asarray(kp[:, pages_a[0]]), snap)


def test_paged_pool_overflow_backpressure(tmp_path):
    """Pool exhaustion must apply backpressure (defer admission) or finish
    the un-growable request — never raise out of the scheduler loop."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "ovf_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    w1 = lm.generate_list(np.asarray([1, 2, 3]), 20, stop_token_ids=[])
    w2 = lm.generate_list(np.asarray([9, 8, 7]), 20, stop_token_ids=[])

    # 4 usable pages x 8 = 32 tokens: the two requests cannot coexist, so
    # the second must WAIT for the first to release its pages
    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=5,
                           page_size=8, stop_token_ids=[])
    ra = eng.submit([1, 2, 3], 20)
    rb = eng.submit([9, 8, 7], 20)
    eng.run()
    assert ra.finished and ra.tokens == w1
    assert rb.finished and rb.tokens == w2
    assert rb.preempted >= 1  # evicted for recompute, stream still exact

    # a prompt that can NEVER fit fails cleanly instead of deadlocking
    rc = eng.submit(list(range(1, 40)), 4)
    eng.run()
    assert rc.finished and rc.finish_reason == "length" and rc.tokens == []

    # mid-decode growth past the pool finishes the request as "length"
    rd = eng.submit([5, 4, 3], 60)  # wants 63 tokens; pool caps at 32
    eng.run()
    assert rd.finished and rd.finish_reason == "length"
    assert rd.tokens == w_prefix(lm, [5, 4, 3], rd.tokens)


def w_prefix(lm, prompt, got):
    """The solo-run stream truncated to len(got) (overflow-finish prefix)."""
    want = lm.generate_list(np.asarray(prompt), len(got), stop_token_ids=[])
    return want


def test_paged_int8_pools_match_dense_int8(tmp_path):
    """INT8 page pools (codes + per-(token, kv-head) scales, half the KV
    bytes) produce exactly the dense INT8-KV engine's streams: the pools
    quantize with the same scheme at write and dequantize only the
    gathered slice at read."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "int8_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,),
                                kv_quant=True)

    prompts = [[1, 2, 3], [(i * 7) % 256 for i in range(40)]]
    wants = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[])
             for p in prompts]
    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[])
    assert len(eng.pools[0]) == 4  # quantized pool layout engaged
    reqs = [eng.submit(p, 12) for p in prompts]
    eng.run()
    for r, w in zip(reqs, wants):
        assert r.tokens == w, (r.tokens, w)


def test_paged_prefill_skips_shared_prefix(tmp_path):
    """v2 paged prefill starts PAST fully-shared prefix pages: their KV is
    already resident, so the admission chunk loop begins at the first
    unshared token (the v1 dense detour recomputed the whole prompt) —
    and the stream stays exactly the single-request output."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "skip_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(32,))

    shared = [(i * 7) % 256 for i in range(20)]  # 2 full pages of 8 + tail
    p1 = shared + [3, 4]
    p2 = shared + [200, 201, 202]
    w2 = lm.generate_list(np.asarray(p2), 8, stop_token_ids=[])

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[], apc_max_entries=0)
    r1 = eng.submit(p1, 8)
    eng.step()  # r1 admitted (no sharing available: full prompt prefilled)

    calls = []
    orig = eng._prefill_fn

    def spy(bucket, ctx_pages, aligned=False):
        fn = orig(bucket, ctx_pages, aligned)

        def wrapped(params, pools, tokens, table, pos0, take):
            calls.append((int(pos0), int(take)))
            return fn(params, pools, tokens, table, pos0, take)

        return wrapped

    eng._prefill_fn = spy
    r2 = eng.submit(p2, 8)
    eng.run()
    assert r2.tokens == w2
    # r2's first prefill chunk began at token 16 (2 shared pages x 8)
    assert calls and calls[0][0] == 16, calls


def test_paged_windowed_sinks_kvshare_matches_single(tmp_path):
    """Paged engine == dense single-request generation on the windowed
    feature mix (alternating sliding-window layers, attention sinks, tanh
    soft cap, trailing cross-layer KV share) — the gpt-oss/Gemma2-class
    feature set (ref attention.rs:8-31), previously dense-engine-only."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import synthesize, windowed_config

    cfg = windowed_config(num_layers=4, sliding_window=24, has_sinks=True,
                          kv_share_last=1)
    d = synthesize(cfg, str(tmp_path / "win_model"), seed=13, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))

    prompts = [[1, 2, 3], list(range(2, 40)), [9, 8, 7, 6, 5]]
    wants = [lm.generate_list(np.asarray(p), 10, stop_token_ids=[])
             for p in prompts]

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[])
    reqs = [eng.submit(p, 10) for p in prompts]
    eng.run()
    for r, want in zip(reqs, wants):
        assert r.finished
        assert r.tokens == want


def test_paged_moe_model_matches_single(tmp_path):
    """Paged engine == dense single-request generation on an MoE model
    (router + expert gather runs per slot row inside the paged step)."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import moe_config, synthesize

    cfg = moe_config(num_layers=2, num_experts=4, num_active=2)
    d = synthesize(cfg, str(tmp_path / "moe_model"), seed=5, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))

    prompts = [[1, 2, 3], list(range(2, 30)), [9, 8, 7]]
    wants = [lm.generate_list(np.asarray(p), 8, stop_token_ids=[])
             for p in prompts]
    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=4, num_pages=33,
                           page_size=8, stop_token_ids=[])
    reqs = [eng.submit(p, 8) for p in prompts]
    eng.run()
    for r, want in zip(reqs, wants):
        assert r.finished and r.tokens == want


# -- speculative paged batching ----------------------------------------------


def test_spec_paged_equals_dense(tmp_path_factory):
    """Paged chain-speculative greedy (ngram and fused self-draft) ==
    single-request dense greedy, with slot reuse and prefix sharing live."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("spec_paged")), seed=13,
                   dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    prompts = [
        [5, 6, 5, 6, 5, 6, 5],
        [1, 2, 3],
        [5, 6, 5, 6, 5, 6, 9],  # shares a prefix with prompt 0
        [9, 9, 9, 9],
        [17, 23],
    ]
    singles = [lm.generate_list(np.asarray(p), 12, stop_token_ids=[]) for p in prompts]
    for mode in ({"draft_layers": None}, {"draft_layers": 1}):
        eng = SpeculativePagedBatchEngine(
            lm, batch_size=2, draft_block=4, num_pages=33, page_size=8,
            stop_token_ids=[], **mode)
        reqs = [eng.submit(p, 12) for p in prompts]
        eng.run()
        for i, (r, want) in enumerate(zip(reqs, singles)):
            assert r.finished and r.finish_reason == "length", (mode, i)
            assert r.tokens[:12] == want[:12], (mode, i)
        assert eng.metrics.num_verify_passes > 0


def test_spec_paged_int8_pools(tmp_path_factory):
    """Speculative paged verify over INT8 pools: multi-row quantized
    scatter + dequant reads keep the stream equal to the dense INT8-KV
    stream."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("spec_paged_i8")), seed=14,
                   dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,),
                                kv_quant=True)
    prompts = [[5, 6, 5, 6, 5], [1, 2, 3]]
    singles = [lm.generate_list(np.asarray(p), 10, stop_token_ids=[]) for p in prompts]
    eng = SpeculativePagedBatchEngine(
        lm, batch_size=2, draft_block=3, num_pages=33, page_size=8,
        stop_token_ids=[], draft_layers=1)
    reqs = [eng.submit(p, 10) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.finished
        assert r.tokens[:10] == want[:10]


def test_spec_paged_sampled_preemption_lossless(tmp_path_factory):
    """Recompute preemption under SAMPLING stays lossless in the
    speculative paged engine: keys index by produced-token count (not
    round number), so a preempted request's replay reproduces the exact
    stream an unconstrained run produces."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path_factory.mktemp("spec_preempt")), seed=15,
                   dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))
    sp = SamplingParams(temperature=0.9, top_k=50)
    prompts = [[5, 6, 7, 8], [1, 2, 3], [9, 8, 7]]

    def run(num_pages):
        eng = SpeculativePagedBatchEngine(
            lm, batch_size=3, draft_block=4, num_pages=num_pages, page_size=8,
            sampling=sp, stop_token_ids=[], draft_layers=1)
        reqs = [eng.submit(p, 24, seed=41 + i) for i, p in enumerate(prompts)]
        eng.run()
        return reqs

    roomy = run(num_pages=41)   # plenty of pages: no preemption
    tight = run(num_pages=11)   # 10 usable pages force growth preemption
    assert any(r.preempted for r in tight), "preemption never triggered"
    for a, b in zip(roomy, tight):
        assert a.finished and b.finished
        assert a.tokens == b.tokens


def test_paged_supported_gates_unimplemented_features():
    """Models whose attention uses value-head norm or non-causal layers
    must fall back to the dense engine — the paged paths implement
    neither, and serving them paged silently diverges."""
    import dataclasses

    from uzu_tpu.models.paged_decode import paged_supported
    from uzu_tpu.tools.synth import llama_config

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160,
                       num_heads=4, num_groups=2, head_dim=16,
                       vocab_size=128).decoder_config
    assert paged_supported(cfg)

    def variant(**kw):
        tc = cfg.transformer_config
        lcs = list(tc.layer_configs)
        lcs[1] = dataclasses.replace(
            lcs[1], mixer_config=dataclasses.replace(lcs[1].mixer_config, **kw))
        return dataclasses.replace(
            cfg, transformer_config=dataclasses.replace(tc, layer_configs=lcs))

    assert not paged_supported(variant(normalize_values=True))
    assert not paged_supported(variant(is_causal=False))


def test_share_prefix_self_share_accounting():
    """A self-share must not momentarily free still-owned pages."""
    from uzu_tpu.models.paged_kv import PagePool

    pool = PagePool(num_pages=8, page_size=4)
    pages = pool.ensure(0, 12)  # 3 pages
    pool.share_prefix(0, 0, 2)
    assert pool.pages(0) == pages[:2]
    assert pool.free_pages == 6  # page 3 released; first two still held
    # the shared pages are NOT on the free list
    grabbed = pool.ensure(1, 24)  # takes all 6 free pages
    assert not set(grabbed) & set(pages[:2])


def test_paged_ctx_bucket_crossing(tmp_path):
    """Decode across a ctx-bucket boundary (r4: dispatch tables slice to
    the live ctx bucket's pages + a trash column — the executable SWITCHES
    width mid-request when positions cross CTX_BUCKET_MIN; output must
    stay identical to single-stream greedy)."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "paged_cross"), seed=21,
                   dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=2048, prefill_buckets=(64,))
    rng = np.random.default_rng(5)
    prompt = rng.integers(0, 256, 1000)
    want = lm.generate_list(prompt, 48, stop_token_ids=[])

    eng = PagedBatchEngine(lm, batch_size=2, decode_chunk=8, num_pages=40,
                           page_size=64, stop_token_ids=[], apc_max_entries=0)
    req = eng.submit(prompt, 48)
    eng.run()
    assert req.finished
    assert req.tokens == want

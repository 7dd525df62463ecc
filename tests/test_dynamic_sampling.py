"""Per-request (dynamic) sampling parameters.

The batched engines serve OpenAI requests that each carry their own
temperature/top_k/top_p/min_p; compiling a fused batched step per parameter
combination is untenable (remote AOT costs 10-90 s per executable), so
sample_dynamic takes them as traced scalars. The pinned invariant: for ANY
parameter values, the dynamic pipeline emits the EXACT token the static
sample() would for the same key — so a request with engine-default
parameters streams identically through either path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzu_tpu.engine.sampling import (
    SamplingParams,
    pack_dynamic,
    sample,
    sample_dynamic,
)

PARAM_GRID = [
    SamplingParams(),  # greedy
    SamplingParams(temperature=0.0),
    SamplingParams(temperature=0.7),
    SamplingParams(temperature=1.0, top_k=1),
    SamplingParams(temperature=1.0, top_k=40),
    SamplingParams(temperature=0.9, top_p=0.95),
    SamplingParams(temperature=1.3, top_k=50, top_p=0.8),
    SamplingParams(temperature=1.0, min_p=0.05),
    SamplingParams(temperature=0.8, top_k=20, top_p=0.9, min_p=0.02),
    SamplingParams(temperature=2.5, top_p=0.3),
    SamplingParams(temperature=1.0, banned_tokens=(0, 3, 7)),
]


@pytest.mark.parametrize("params", PARAM_GRID)
def test_dynamic_matches_static(params):
    rng = np.random.default_rng(7)
    v = 512
    t, k, p, mp, _, _ = pack_dynamic(params)
    for trial in range(8):
        logits = jnp.asarray(rng.standard_normal(v) * 3, jnp.float32)
        key = jax.random.PRNGKey(trial)
        want = sample(logits, params, key=key)
        got = sample_dynamic(
            logits, jnp.float32(t), jnp.int32(k), jnp.float32(p),
            jnp.float32(mp), key, banned_tokens=params.banned_tokens,
        )
        assert int(want) == int(got), (params, trial)


def test_dynamic_matches_static_with_bitmask():
    rng = np.random.default_rng(3)
    v = 256
    mask = jnp.asarray(rng.random(v) > 0.5)
    params = SamplingParams(temperature=1.0, top_k=30, top_p=0.9)
    t, k, p, mp, _, _ = pack_dynamic(params)
    for trial in range(6):
        logits = jnp.asarray(rng.standard_normal(v) * 3, jnp.float32)
        key = jax.random.PRNGKey(100 + trial)
        want = sample(logits, params, key=key, bitmask=mask)
        got = sample_dynamic(logits, jnp.float32(t), jnp.int32(k),
                             jnp.float32(p), jnp.float32(mp), key,
                             bitmask=mask)
        assert int(want) == int(got), trial


def test_dynamic_under_jit_and_vmap():
    """One executable serves every combination: params as traced inputs."""
    rng = np.random.default_rng(11)
    v, b = 128, 4
    logits = jnp.asarray(rng.standard_normal((b, v)) * 2, jnp.float32)
    keys = jax.random.split(jax.random.PRNGKey(0), b)
    samp = jnp.asarray([
        [0.0, 0, 1.0, 0.0],       # greedy
        [1.0, 5, 1.0, 0.0],       # top-k
        [0.9, 0, 0.8, 0.0],       # top-p
        [1.2, 10, 0.9, 0.05],     # all
    ], jnp.float32)

    @jax.jit
    def run(logits, samp, keys):
        return jax.vmap(
            lambda l, s, kk: sample_dynamic(
                l, s[0], s[1].astype(jnp.int32), s[2], s[3], kk)
        )(logits, samp, keys)

    got = run(logits, samp, keys)
    for i in range(b):
        t, k, p, mp = (float(samp[i, 0]), int(samp[i, 1]),
                       float(samp[i, 2]), float(samp[i, 3]))
        params = SamplingParams(
            temperature=t or None, top_k=k or None,
            top_p=None if p >= 1.0 else p, min_p=mp or None,
        )
        want = sample(logits[i], params, key=keys[i])
        assert int(got[i]) == int(want), i


# -- per-request sampling in the batch engines --------------------------------


@pytest.fixture(scope="module")
def lm():
    from uzu_tpu import LanguageModel
    from uzu_tpu.tools.synth import llama_config, synthesize
    import tempfile

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, tempfile.mkdtemp(prefix="dynsamp_"), seed=13,
                   dtype=np.float32)
    return LanguageModel.from_dir(d, max_context=128, prefill_buckets=(16,))


SAMPLED = SamplingParams(temperature=1.0, top_k=40)
PROMPTS = [[1, 2, 3], [9, 8, 7, 6, 5], [42, 17]]


def _run(engine_cls, lm, default, overrides, n=12, **kw):
    eng = engine_cls(lm, batch_size=2, sampling=default, stop_token_ids=[], **kw)
    reqs = [eng.submit(p, n, seed=i, sampling=ov)
            for i, (p, ov) in enumerate(zip(PROMPTS, overrides))]
    eng.run()
    return [r.tokens[:n] for r in reqs]


@pytest.mark.parametrize("engine_name", ["dense", "paged", "spec", "spec_paged"])
def test_engines_per_request_sampling(engine_name, lm):
    """Requests overriding to P through the DYNAMIC path stream identically
    to an engine whose static default IS P (same seeds, same key schedule) —
    across all four batch engines."""
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.batch_spec import (
        SpeculativeBatchEngine,
        SpeculativePagedBatchEngine,
    )
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    cls, kw = {
        "dense": (BatchEngine, {}),
        "paged": (PagedBatchEngine, {"num_pages": 32, "page_size": 16}),
        "spec": (SpeculativeBatchEngine, {"draft_block": 4}),
        "spec_paged": (SpeculativePagedBatchEngine,
                       {"draft_block": 4, "num_pages": 32, "page_size": 16}),
    }[engine_name]
    want = _run(cls, lm, SAMPLED, [None, None, None], **kw)
    got = _run(cls, lm, SamplingParams(), [SAMPLED, SAMPLED, SAMPLED], **kw)
    assert got == want


def test_mixed_greedy_and_sampled_slots(lm):
    """A greedy-override slot next to a sampled slot matches plain greedy."""
    from uzu_tpu.engine.batch import BatchEngine

    plain = lm.generate_list(np.asarray(PROMPTS[0]), 12, stop_token_ids=[])
    eng = BatchEngine(lm, batch_size=2, sampling=SAMPLED, stop_token_ids=[])
    rg = eng.submit(PROMPTS[0], 12, sampling=SamplingParams())
    rs = eng.submit(PROMPTS[1], 12, seed=1)
    eng.run()
    assert rg.tokens[:12] == plain[:12]
    assert len(rs.tokens) == 12


def test_per_request_sampling_rejects_penalty(lm):
    from uzu_tpu.engine.batch import BatchEngine

    eng = BatchEngine(lm, batch_size=2, stop_token_ids=[])
    with pytest.raises(ValueError, match="repetition_penalty"):
        eng.submit([1, 2], 4, sampling=SamplingParams(
            temperature=1.0, repetition_penalty=1.3))


def test_long_admission_dynamic_first_sample(lm):
    """A prompt past the largest prefill bucket takes the chunked admission
    path; its masked/dynamic first sample must still honor the override."""
    from uzu_tpu.engine.batch import BatchEngine

    long_prompt = list((np.arange(40) * 7) % 250)
    eng_a = BatchEngine(lm, batch_size=2, sampling=SAMPLED, stop_token_ids=[])
    ra = eng_a.submit(long_prompt, 8, seed=3)
    eng_a.run()
    eng_b = BatchEngine(lm, batch_size=2, sampling=SamplingParams(),
                        stop_token_ids=[])
    rb = eng_b.submit(long_prompt, 8, seed=3, sampling=SAMPLED)
    eng_b.run()
    assert ra.tokens[:8] == rb.tokens[:8]


def test_batched_server_honors_request_temperature(tmp_path_factory):
    """OpenAI temperature/top_p fields on a request reach the engine: a
    temperature-0 request through a sampled-default server reproduces the
    single-stream greedy reply."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.sessions.chat import ChatSession
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("dyn_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    srv = BatchedChatServer(lm, tok, batch_size=2,
                            sampling=SamplingParams(temperature=1.0, top_k=40))
    try:
        body = {"messages": [{"role": "user", "content": "hello"}],
                "max_tokens": 12, "temperature": 0.0}
        out = srv.handle_chat(dict(body))
        greedy = ChatSession(lm, tok).reply(
            "hello", sampling=SamplingParams(), max_new_tokens=12)
        assert out["choices"][0]["message"]["content"] == greedy.text
    finally:
        srv.shutdown()


def test_override_with_engine_default_banned_tokens(lm):
    """An engine default carrying banned_tokens/repetition_penalty (the
    documented place for them) must not poison per-request overrides —
    the unsupported-field check compares against the engine default."""
    from uzu_tpu.engine.batch import BatchEngine

    default = SamplingParams(temperature=1.0, top_k=40, banned_tokens=(7,))
    eng = BatchEngine(lm, batch_size=2, sampling=default, stop_token_ids=[])
    r = eng.submit(PROMPTS[0], 8, sampling=SamplingParams(
        temperature=0.5, top_k=40, banned_tokens=(7,)))
    eng.run()
    assert len(r.tokens) == 8
    assert 7 not in r.tokens  # engine-default ban applies on the dynamic path
    with pytest.raises(ValueError, match="banned_tokens"):
        eng.submit(PROMPTS[0], 4, sampling=SamplingParams(
            temperature=0.5, banned_tokens=(9,)))


def test_request_null_sampling_fields_mean_default():
    """Explicit JSON nulls keep the server default (OpenAI semantics)."""
    from uzu_tpu.server.common import sampling_from_request

    default = SamplingParams(temperature=0.8, top_k=40)
    got = sampling_from_request({"temperature": None, "top_p": None}, default)
    assert got == default


def test_batched_server_n_choices(tmp_path_factory):
    """OpenAI n: one engine request per choice, decoded concurrently;
    sampled choices differ (derived seeds), greedy choices agree."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("n_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    srv = BatchedChatServer(lm2, Tokenizer(d), batch_size=4,
                            sampling=SamplingParams(temperature=1.2, top_k=40))
    try:
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "pick"}],
            "max_tokens": 16, "n": 3, "seed": 5,
        })
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        texts = {c["message"]["content"] for c in out["choices"]}
        assert len(texts) >= 2  # derived seeds diverge under sampling
        assert out["usage"]["completion_tokens"] >= 3
        with pytest.raises(ValueError, match="n > 1"):
            srv.handle_chat({"messages": [{"role": "user", "content": "x"}],
                             "n": 2, "stream": True})
    finally:
        srv.shutdown()


# -- OpenAI presence/frequency penalties ---------------------------------------


def test_apply_count_penalties_unit():
    import jax.numpy as jnp

    from uzu_tpu.engine.sampling import apply_count_penalties

    logits = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    counts = jnp.asarray([0, 1, 3, 0])
    got = apply_count_penalties(logits, counts, jnp.float32(0.5),
                                jnp.float32(0.25))
    np.testing.assert_allclose(
        np.asarray(got), [1.0, 2.0 - 0.5 - 0.25, 3.0 - 0.5 - 0.75, 4.0],
        rtol=1e-6)


@pytest.mark.parametrize("engine_name", ["dense", "paged"])
def test_frequency_penalty_never_repeats(engine_name, lm):
    """An overwhelming frequency penalty makes greedy decoding emit all
    DISTINCT tokens (each emitted token's logit sinks by 1e9, admission
    first token included), while a plain neighbor stays bit-exact."""
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    cls, kw = {
        "dense": (BatchEngine, {}),
        "paged": (PagedBatchEngine, {"num_pages": 32, "page_size": 16}),
    }[engine_name]
    plain_want = lm.generate_list(np.asarray(PROMPTS[1]), 16, stop_token_ids=[])
    eng = cls(lm, batch_size=2, stop_token_ids=[], **kw)
    rp = eng.submit(PROMPTS[0], 16, frequency_penalty=1e9)
    rn = eng.submit(PROMPTS[1], 16)
    eng.run()
    assert len(rp.tokens) == 16
    assert len(set(rp.tokens)) == 16, rp.tokens
    assert rn.tokens[:16] == plain_want[:16]
    # without the penalty the greedy stream DOES repeat (sanity that the
    # distinctness above is the penalty's doing)
    base = lm.generate_list(np.asarray(PROMPTS[0]), 16, stop_token_ids=[])
    assert len(set(base)) < 16


@pytest.mark.parametrize("engine_name", ["spec", "spec_paged", "spec_self",
                                         "spec_paged_self"])
def test_spec_penalty_matches_plain(engine_name, lm):
    """Penalized requests through the speculative engines stream bit-exactly
    like the plain chunked engine (the verify penalizes row i with base
    counts + the chain prefix — exact under cumulative acceptance), while a
    plain neighbor in the same batch stays bit-exact too."""
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.batch_spec import (
        SpeculativeBatchEngine,
        SpeculativePagedBatchEngine,
    )

    cls, kw = {
        "spec": (SpeculativeBatchEngine, {"draft_block": 4}),
        "spec_paged": (SpeculativePagedBatchEngine,
                       {"draft_block": 4, "num_pages": 32, "page_size": 16}),
        "spec_self": (SpeculativeBatchEngine,
                      {"draft_block": 4, "draft_layers": 1}),
        "spec_paged_self": (SpeculativePagedBatchEngine,
                            {"draft_block": 4, "draft_layers": 1,
                             "num_pages": 32, "page_size": 16}),
    }[engine_name]

    ref = BatchEngine(lm, batch_size=2, stop_token_ids=[])
    wp = ref.submit(PROMPTS[0], 16, presence_penalty=1.5,
                    frequency_penalty=0.6)
    ref.run()

    plain_want = lm.generate_list(np.asarray(PROMPTS[1]), 16,
                                  stop_token_ids=[])
    eng = cls(lm, batch_size=2, stop_token_ids=[], **kw)
    rp = eng.submit(PROMPTS[0], 16, presence_penalty=1.5,
                    frequency_penalty=0.6)
    rn = eng.submit(PROMPTS[1], 16)
    eng.run()
    assert rp.tokens[:16] == wp.tokens[:16]
    assert rn.tokens[:16] == plain_want[:16]
    # an overwhelming frequency penalty forces all-distinct greedy output
    eng2 = cls(lm, batch_size=2, stop_token_ids=[], **kw)
    rd = eng2.submit(PROMPTS[2], 16, frequency_penalty=1e9)
    eng2.run()
    assert len(set(rd.tokens)) == 16, rd.tokens


# (penalty + grammar slots coexisting in one speculative engine is pinned in
# test_batch_grammar.py::test_penalty_and_grammar_neighbors — the grammar
# fixtures live there)


def test_server_penalty_field(tmp_path_factory):
    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("pen_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    srv = BatchedChatServer(lm2, Tokenizer(d), batch_size=2)
    try:
        out = srv.handle_chat({
            "messages": [{"role": "user", "content": "go"}],
            "max_tokens": 12, "frequency_penalty": 2.0,
        })
        assert out["usage"]["completion_tokens"] >= 1
    finally:
        srv.shutdown()


def test_request_validation_400s(tmp_path_factory):
    """Malformed numeric fields must raise ValueError (HTTP 400) in the
    handler — an unvalidated value would crash inside the scheduler thread
    (and before the guard, wedge the whole server)."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("val_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    srv = BatchedChatServer(lm2, Tokenizer(d), batch_size=2)
    msgs = [{"role": "user", "content": "x"}]
    try:
        for bad in ({"max_tokens": "sixty"}, {"max_tokens": 0},
                    {"temperature": "hot"}, {"seed": "lucky"},
                    {"top_k": "many"}):
            with pytest.raises(ValueError):
                srv.handle_chat({"messages": msgs, **bad})
        # nullable fields mean "default", not an error
        out = srv.handle_chat({"messages": msgs, "max_tokens": 4,
                               "seed": None, "temperature": None})
        assert out["usage"]["completion_tokens"] == 4
        # a max_tokens given as a JSON number string via int-able float? no:
        # int("64") works — common client mistake of quoting numbers
        out2 = srv.handle_chat({"messages": msgs, "max_tokens": "6"})
        assert out2["usage"]["completion_tokens"] == 6
    finally:
        srv.shutdown()


def test_scheduler_survives_engine_exception(tmp_path_factory):
    """An engine exception fails the in-flight requests with reason
    "error" and the server keeps serving fresh requests — it must never
    wedge every waiter forever."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.server.batched import BatchedChatServer
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path_factory.mktemp("boom_srv")),
                         num_layers=2, model_dim=64, hidden_dim=160,
                         num_heads=4, num_groups=2, head_dim=16)
    lm2 = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    srv = BatchedChatServer(lm2, Tokenizer(d), batch_size=2)
    try:
        real_step = srv.engine.step
        blew = {"n": 0}

        def boom():
            blew["n"] += 1
            raise RuntimeError("injected engine failure")

        srv.engine.step = boom
        req, done = srv.submit([1, 2, 3], 8)
        assert done.wait(timeout=30), "server wedged after engine exception"
        assert req.finished and req.finish_reason == "error"
        assert blew["n"] >= 1
        srv.engine.step = real_step
        out = srv.handle_chat({"messages": [{"role": "user", "content": "y"}],
                               "max_tokens": 4})
        assert out["usage"]["completion_tokens"] == 4  # still serving
    finally:
        srv.shutdown()

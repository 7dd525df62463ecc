"""End-to-end model tests: synthesize -> load -> forward -> generate.

Follows the reference's deterministic-random-model strategy
(load_language_model_random, engine/language_model/mod.rs:72-84): a full
model with seeded weights exercises shapes/wiring cheaply, and invariants
(prefill==decode consistency, chunking invariance, padding invariance) pin
the decode-path correctness without needing real weights.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from uzu_tpu import LanguageModel, SamplingParams
from uzu_tpu.config.model import IntSpec, Layout
from uzu_tpu.tools.synth import llama_config, qwen3_config, synthesize


@pytest.fixture(scope="module")
def tiny_llama_dir(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    return synthesize(cfg, str(tmp_path_factory.mktemp("tiny_llama")), seed=7, dtype=np.float32)


@pytest.fixture(scope="module")
def tiny_llama(tiny_llama_dir):
    return LanguageModel.from_dir(tiny_llama_dir, max_context=128, prefill_buckets=(8, 16))


def test_load_validates_all_tensors(tiny_llama):
    assert tiny_llama.config.decoder_config.vocab_size == 256


def test_forward_shapes(tiny_llama):
    state = tiny_llama.new_state()
    logits, state = tiny_llama.prefill(state, np.arange(10) % 256)
    assert logits.shape == (256,)
    assert int(state["pos"]) == 10


def test_prefill_chunking_invariance(tiny_llama):
    """Same prompt through different chunkings -> same logits."""
    toks = (np.arange(13) * 7) % 256
    s1 = tiny_llama.new_state()
    l1, s1 = tiny_llama.prefill(s1, toks)

    # token-at-a-time prefill
    s2 = tiny_llama.new_state()
    for t in toks:
        l2, s2 = tiny_llama.prefill(s2, np.array([t]))

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)
    assert int(s1["pos"]) == int(s2["pos"]) == 13


def test_padding_invisible(tiny_llama_dir):
    """Bucketed (padded) prefill must equal exact-size prefill."""
    lm_pad = LanguageModel.from_dir(tiny_llama_dir, max_context=128, prefill_buckets=(16,))
    lm_exact = LanguageModel.from_dir(tiny_llama_dir, max_context=128, prefill_buckets=(11,))
    toks = (np.arange(11) * 3) % 256
    l1, _ = lm_pad.prefill(lm_pad.new_state(), toks)
    l2, _ = lm_exact.prefill(lm_exact.new_state(), toks)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-4, atol=2e-4)


def test_greedy_generation_deterministic(tiny_llama):
    toks = np.array([1, 2, 3, 4, 5])
    out1 = tiny_llama.generate_list(toks, 12, sampling=SamplingParams(), stop_token_ids=[])
    out2 = tiny_llama.generate_list(toks, 12, sampling=SamplingParams(), stop_token_ids=[])
    assert out1 == out2
    assert len(out1) == 12
    assert all(0 <= t < 256 for t in out1)


def test_generation_respects_stop_tokens(tiny_llama):
    toks = np.array([1, 2, 3])
    full = tiny_llama.generate_list(toks, 16, sampling=SamplingParams(), stop_token_ids=[])
    stop = full[4]
    out = tiny_llama.generate_list(toks, 16, sampling=SamplingParams(), stop_token_ids=[stop])
    assert out == full[: full.index(stop) + 1]


def test_sampled_generation_reproducible(tiny_llama):
    toks = np.array([9, 8, 7])
    sp = SamplingParams(temperature=1.0, top_k=50, top_p=0.95)
    out1 = tiny_llama.generate_list(toks, 10, sampling=sp, stop_token_ids=[], seed=42)
    out2 = tiny_llama.generate_list(toks, 10, sampling=sp, stop_token_ids=[], seed=42)
    out3 = tiny_llama.generate_list(toks, 10, sampling=sp, stop_token_ids=[], seed=43)
    assert out1 == out2
    assert out1 != out3 or len(set(out1)) <= 2  # different seeds should usually differ


def test_decode_matches_teacher_forcing(tiny_llama):
    """Greedy decode then teacher-forced re-prefill reproduces the same
    next-token argmaxes (KV cache correctness across steps)."""
    prompt = np.array([5, 6, 7, 8])
    produced = tiny_llama.generate_list(prompt, 6, sampling=SamplingParams(), stop_token_ids=[])
    seq = np.concatenate([prompt, np.array(produced[:-1])])
    state = tiny_llama.new_state()
    logits, _ = tiny_llama.prefill(state, seq)
    assert int(np.argmax(np.asarray(logits))) == produced[-1]


def test_qwen3_qk_norm_model(tmp_path):
    cfg = qwen3_config(num_layers=2, model_dim=64, hidden_dim=128, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=128)
    d = synthesize(cfg, str(tmp_path / "qwen"), seed=3, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    out = lm.generate_list(np.array([1, 2, 3]), 5, sampling=SamplingParams(), stop_token_ids=[])
    assert len(out) == 5


def test_quantized_model_int4(tmp_path):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=128, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=128)
    spec = IntSpec(bits=4, group_size=32, is_symmetric=True, layout=Layout.OUTPUT_INPUT)
    d = synthesize(cfg, str(tmp_path / "q4"), seed=5, linear_spec=spec, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    out = lm.generate_list(np.array([1, 2, 3]), 5, sampling=SamplingParams(), stop_token_ids=[])
    assert len(out) == 5


def test_quantized_int4_tracks_full_precision(tmp_path, rng):
    """INT4-quantizing the same weights must keep logits close (the accuracy
    contract behind uzu's 'traceable computations' pitch)."""
    cfg = llama_config(num_layers=2, model_dim=128, hidden_dim=256, num_heads=4,
                       num_groups=2, head_dim=32, vocab_size=128)
    d_fp = synthesize(cfg, str(tmp_path / "fp"), seed=11, dtype=np.float32)
    spec = IntSpec(bits=8, group_size=32, is_symmetric=False, layout=Layout.OUTPUT_INPUT)
    d_q = synthesize(cfg, str(tmp_path / "q"), seed=11, linear_spec=spec, dtype=np.float32)
    lm_fp = LanguageModel.from_dir(d_fp, max_context=64, prefill_buckets=(8,))
    lm_q = LanguageModel.from_dir(d_q, max_context=64, prefill_buckets=(8,))
    toks = (np.arange(8) * 5) % 128
    l_fp, _ = lm_fp.prefill(lm_fp.new_state(), toks)
    l_q, _ = lm_q.prefill(lm_q.new_state(), toks)
    # same seed -> same underlying float weights -> int8 logits close
    diff = np.abs(np.asarray(l_fp) - np.asarray(l_q)).max()
    assert diff < 0.1, diff


def test_kv_quantization_close_to_fp(tiny_llama_dir):
    """INT8 KV with per-row scales stays close to the fp cache."""
    toks = (np.arange(20) * 11) % 256
    lm_fp = LanguageModel.from_dir(tiny_llama_dir, max_context=64, prefill_buckets=(32,))
    lm_q = LanguageModel.from_dir(tiny_llama_dir, max_context=64, prefill_buckets=(32,),
                                  kv_quant=True)
    l_fp, _ = lm_fp.prefill(lm_fp.new_state(), toks)
    l_q, _ = lm_q.prefill(lm_q.new_state(), toks)
    # logits close; argmax stable
    assert int(np.argmax(np.asarray(l_fp))) == int(np.argmax(np.asarray(l_q)))
    np.testing.assert_allclose(np.asarray(l_q), np.asarray(l_fp), rtol=0.1, atol=0.05)
    # generation consistent between prefill/decode paths with quantized KV
    out = lm_q.generate_list(toks[:5], 8, stop_token_ids=[])
    s = lm_q.new_state()
    for t in list(toks[:5]):
        l, s = lm_q.prefill(s, np.array([t]))
    assert len(out) == 8


def test_ring_window_matches_full(tmp_path):
    """A sliding-window layer with ring layout W slots == full layout."""
    from uzu_tpu.tools.synth import llama_config, synthesize
    import dataclasses

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    # give layer 0 a sliding window of 8
    layers = list(cfg.decoder_config.transformer_config.layer_configs)
    layers[0] = dataclasses.replace(
        layers[0],
        mixer_config=dataclasses.replace(layers[0].mixer_config, sliding_window_size=8),
    )
    cfg = dataclasses.replace(
        cfg,
        decoder_config=dataclasses.replace(
            cfg.decoder_config,
            transformer_config=dataclasses.replace(
                cfg.decoder_config.transformer_config, layer_configs=tuple(layers)
            ),
        ),
    )
    d = synthesize(cfg, str(tmp_path / "win"), seed=9, dtype=np.float32)
    toks = (np.arange(30) * 7) % 256

    lm_full = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    lm_ring = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,),
                                     ring_windows=True)
    # ring cache for layer 0 is window + chunk scratch slots instead of 64
    assert lm_ring.new_state()["layers"][0]["k"].shape[0] == 8 + 8
    assert lm_full.new_state()["layers"][0]["k"].shape[0] == 64
    l1, _ = lm_full.prefill(lm_full.new_state(), toks)
    l2, _ = lm_ring.prefill(lm_ring.new_state(), toks)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-4, atol=2e-4)

    # decode path too
    o1 = lm_full.generate_list(toks, 10, stop_token_ids=[])
    o2 = lm_ring.generate_list(toks, 10, stop_token_ids=[])
    assert o1 == o2


def test_online_attention_matches_einsum(rng):
    """Chunked online-softmax attention == the einsum reference across
    feature combos (the two-pass FlashDecoding analogue)."""
    import jax.numpy as jnp
    from uzu_tpu.ops import attention as A

    s, h, g, dh, c = 5, 4, 2, 16, 64
    q = jnp.asarray(rng.standard_normal((s, h, dh), dtype=np.float32))
    k = jnp.asarray(rng.standard_normal((c, g, dh), dtype=np.float32))
    v = jnp.asarray(rng.standard_normal((c, g, dh), dtype=np.float32))
    qpos = jnp.asarray(np.arange(40, 40 + s), jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(h, dtype=np.float32))

    for kw in (
        dict(),
        dict(sliding_window_size=16),
        dict(logit_soft_cap=20.0),
        dict(sinks=sinks),
        dict(sliding_window_size=16, logit_soft_cap=20.0, sinks=sinks),
        dict(is_causal=False, kv_valid_length=jnp.asarray(45)),
    ):
        want = A.attention_reference(q, k, v, qpos, scale=0.25, **kw)
        old_chunk = A.ONLINE_CHUNK
        A.ONLINE_CHUNK = 16
        try:
            got = A.attention_online(q, k, v, qpos, scale=0.25, **kw)
        finally:
            A.ONLINE_CHUNK = old_chunk
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5,
            err_msg=f"online attention diverged for {kw}",
        )


def test_recommended_max_context(tiny_llama):
    """Memory-driven context policy (recommended_context_length parity)."""
    lm = tiny_llama
    # plenty of memory -> clamped by the model's trained RoPE context
    big = lm.recommended_max_context(memory_budget_bytes=64 * 1024**3)
    assert big >= 1024
    # tiny budget -> floor
    small = lm.recommended_max_context(memory_budget_bytes=1024**2)
    assert small == 1024
    # batch divides the per-slot context
    b4 = lm.recommended_max_context(memory_budget_bytes=64 * 1024**3, batch_size=4)
    assert b4 <= big


def test_context_bucketed_decode_matches_full(tiny_llama_dir, monkeypatch):
    """Context-bucketed attention reads (the sparse grow-on-demand
    analogue) produce the exact same stream as full-context reads, across
    bucket boundaries."""
    import uzu_tpu.engine.engine as eng_mod
    from uzu_tpu import LanguageModel

    prompt = (np.arange(20) * 7) % 256
    lm_full = LanguageModel.from_dir(tiny_llama_dir, max_context=128,
                                     prefill_buckets=(16,))
    want = lm_full.generate_list(prompt, 40, stop_token_ids=[])

    monkeypatch.setattr(eng_mod, "CTX_BUCKET_MIN", 16)
    lm_b = LanguageModel.from_dir(tiny_llama_dir, max_context=128,
                                  prefill_buckets=(16,))
    got = lm_b.generate_list(prompt, 40, stop_token_ids=[])
    assert got == want
    # multiple ctx buckets were actually compiled (cache key:
    # (sampling, steps, stop_ids, ctx_bucket, logprobs))
    buckets = {k[-2] for k in lm_b._decode_jit}
    assert len(buckets) > 1


def test_context_bucketed_batch_matches(tiny_llama_dir, monkeypatch):
    import uzu_tpu.engine.engine as eng_mod
    from uzu_tpu import BatchEngine, LanguageModel

    prompts = [[1, 2, 3], [9, 8, 7, 6, 5]]
    lm_full = LanguageModel.from_dir(tiny_llama_dir, max_context=128,
                                     prefill_buckets=(16,))
    singles = [lm_full.generate_list(np.asarray(p), 30, stop_token_ids=[])
               for p in prompts]

    monkeypatch.setattr(eng_mod, "CTX_BUCKET_MIN", 16)
    lm_b = LanguageModel.from_dir(tiny_llama_dir, max_context=128,
                                  prefill_buckets=(16,))
    eng = BatchEngine(lm_b, batch_size=2, decode_chunk=4, stop_token_ids=[])
    reqs = [eng.submit(p, 30) for p in prompts]
    eng.run()
    for r, want in zip(reqs, singles):
        assert r.tokens == want


def test_overrun_tail_reuses_power_of_two_executables(tiny_llama_dir):
    """The budget-tail chunk rounds UP to an existing power-of-two decode
    executable (device budget-halt discards the overrun) — and the key
    array covers the overrun, so no decode executable silently retraces
    at an odd scan length (each jitted chunk fn must hold exactly ONE
    trace)."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.sampling import SamplingParams

    lm = LanguageModel.from_dir(tiny_llama_dir, max_context=256,
                                prefill_buckets=(16,))
    full = lm.generate_list(np.asarray([1, 2, 3]), 96, stop_token_ids=[])
    assert len(full) == 96
    # sampled variant too (keys content actually consumed)
    sp = SamplingParams(temperature=0.7, top_k=20)
    s1 = lm.generate_list(np.asarray([1, 2, 3]), 43, stop_token_ids=[],
                          sampling=sp, seed=5)
    assert len(s1) == 43
    for (_, k, *_rest), fn in lm._decode_jit.items():
        assert (k & (k - 1)) == 0, f"non-power-of-two chunk {k} compiled"
        assert fn._cache_size() == 1, \
            f"decode chunk k={k} retraced ({fn._cache_size()} traces)"
    # a 43-token sampled run is an exact prefix of a 96-token one
    s2 = lm.generate_list(np.asarray([1, 2, 3]), 96, stop_token_ids=[],
                          sampling=sp, seed=5)
    assert s2[:43] == s1

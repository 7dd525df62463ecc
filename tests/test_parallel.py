"""Tensor/data-parallel sharding tests on the virtual 8-device CPU mesh.

The reference has no distributed layer (SURVEY.md §2.7); these tests pin the
from-scratch TPU design: GSPMD-sharded params/KV must produce the same
logits as the single-device path, over pure-TP, TP×DP, and quantized params.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.config.model import IntSpec, Layout
from uzu_tpu.models.decoder import decoder_forward
from uzu_tpu.parallel import make_mesh, shard_decoder_params, shard_state, validate_tp
from uzu_tpu.tools.synth import llama_config, synthesize


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = llama_config(
        num_layers=2, model_dim=64, hidden_dim=128, num_heads=8,
        num_groups=4, head_dim=16, vocab_size=256,
    )
    return synthesize(cfg, str(tmp_path_factory.mktemp("tp_llama")), seed=3, dtype=np.float32)


@pytest.fixture(scope="module")
def quant_model_dir(tmp_path_factory):
    cfg = llama_config(
        num_layers=2, model_dim=64, hidden_dim=128, num_heads=8,
        num_groups=4, head_dim=16, vocab_size=256,
    )
    spec = IntSpec(bits=4, group_size=32, is_symmetric=True, layout=Layout.OUTPUT_INPUT)
    return synthesize(
        cfg, str(tmp_path_factory.mktemp("tp_llama_q4")), seed=3, dtype=np.float32,
        linear_spec=spec,
    )


def _logits(lm, toks):
    state = lm.new_state()
    logits, _ = lm.prefill(state, toks)
    return np.asarray(logits)


def _sharded_logits(model_dir, mesh, toks, max_context=64):
    lm = LanguageModel.from_dir(model_dir, max_context=max_context, prefill_buckets=(16,))
    params = shard_decoder_params(lm.decoder_config, lm.params, mesh)
    state = shard_state(lm.decoder_config, lm.new_state(), mesh)

    @jax.jit
    def step(params, tokens, state, n):
        return decoder_forward(lm.decoder_config, params, tokens, state, true_length=n)

    padded = np.zeros(16, np.int32)
    padded[: len(toks)] = toks
    logits, _ = step(params, jnp.asarray(padded), state, jnp.asarray(len(toks), jnp.int32))
    return np.asarray(logits[0])


def test_pure_tp4_matches_single_device(model_dir):
    toks = (np.arange(9) * 5) % 256
    lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    mesh = make_mesh(tp=4, devices=jax.devices()[:4])
    got = _sharded_logits(model_dir, mesh, toks)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_tp4_dp2_matches_single_device(model_dir):
    toks = (np.arange(9) * 5) % 256
    lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    got = _sharded_logits(model_dir, make_mesh(tp=4, dp=2), toks)
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)


def test_tp_quantized_params(quant_model_dir):
    toks = (np.arange(9) * 5) % 256
    lm = LanguageModel.from_dir(quant_model_dir, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    got = _sharded_logits(quant_model_dir, make_mesh(tp=4, dp=2), toks)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_validate_tp_rejects_indivisible(model_dir):
    lm = LanguageModel.from_dir(model_dir, max_context=64)
    with pytest.raises(ValueError):
        validate_tp(lm.decoder_config, 3)


def test_dp_batched_decode(model_dir):
    """vmap over a batch of sequences, batch dim sharded over dp."""
    mesh = make_mesh(tp=4, dp=2)
    lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    params = shard_decoder_params(lm.decoder_config, lm.params, mesh)

    batch = 2
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[lm.new_state() for _ in range(batch)])
    states = shard_state(lm.decoder_config, states, mesh, batched=True)
    toks = jnp.asarray([[1, 2, 3, 4], [9, 8, 7, 6]], jnp.int32)

    @jax.jit
    def batched_step(params, tokens, states):
        def one(tokens, state):
            return decoder_forward(lm.decoder_config, params, tokens, state, true_length=4)

        return jax.vmap(one, in_axes=(0, 0))(tokens, states)

    logits, _ = batched_step(params, toks, states)
    assert logits.shape == (batch, 1, 256)

    for b in range(batch):
        expected = _logits(
            LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(4,)),
            np.asarray(toks[b]),
        )
        np.testing.assert_allclose(np.asarray(logits[b, 0]), expected, rtol=2e-4, atol=2e-4)


def test_tp_moe_model(tmp_path):
    """MoE experts shard their hidden dim over tp; logits match 1-device."""
    from uzu_tpu.tools.synth import moe_config

    cfg = moe_config(num_layers=2, model_dim=64, hidden_dim=128, num_experts=4,
                     num_active=2, expert_hidden_dim=96, attn_heads=8,
                     attn_groups=4, attn_head_dim=16)
    d = synthesize(cfg, str(tmp_path / "moe_tp"), seed=6, dtype=np.float32)
    toks = (np.arange(9) * 5) % 512
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    got = _sharded_logits(d, make_mesh(tp=4, dp=2), toks)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_tp_gemma_model(tmp_path):
    """PLE + KV-sharing model under tp (PLE replicated, attention sharded)."""
    from uzu_tpu.tools.synth import gemma_config

    cfg = gemma_config(num_heads=4, num_groups=2, model_dim=96)
    d = synthesize(cfg, str(tmp_path / "gemma_tp"), seed=8, dtype=np.float32)
    toks = (np.arange(9) * 7) % 512
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    got = _sharded_logits(d, make_mesh(tp=2, dp=4), toks)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("family", ["qwen35", "mamba2", "lfm2"])
def test_tp_recurrent_mixer_model(tmp_path, family):
    """Hybrid recurrent-mixer models under tp: the mixer's fused in-proj /
    depthwise conv / recurrent state shard over the inner channel dim and
    the sharded logits must match single-device (prefill through BOTH the
    chunked cores and, via the short prompt, the per-token scan)."""
    from uzu_tpu.tools.synth import lfm2_config, mamba2_hybrid_config, qwen35_config

    cfg = {
        "qwen35": lambda: qwen35_config(num_layers=3, model_dim=64,
                                        hidden_dim=128, num_heads=4,
                                        num_groups=2, head_dim=16,
                                        value_head_dim=16, attn_every=3),
        "mamba2": lambda: mamba2_hybrid_config(num_layers=3, model_dim=64,
                                               hidden_dim=128, num_heads=4,
                                               num_groups=2, head_dim=16,
                                               state_dim=16, attn_every=3),
        "lfm2": lambda: lfm2_config(num_layers=3, model_dim=64,
                                    hidden_dim=128, attn_every=3),
    }[family]()
    d = synthesize(cfg, str(tmp_path / f"{family}_tp"), seed=11, dtype=np.float32)
    toks = (np.arange(9) * 7) % 512
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    got = _sharded_logits(d, make_mesh(tp=2, dp=4), toks)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_tp_recurrent_decode_stream(tmp_path):
    """Sharded GDN-hybrid decode (the stateful scan path) == single-device
    token stream through the product surface (LanguageModel(mesh=...))."""
    from uzu_tpu.parallel import make_mesh as _mm
    from uzu_tpu.tools.synth import qwen35_config

    cfg = qwen35_config(num_layers=3, model_dim=64, hidden_dim=128,
                        num_heads=4, num_groups=2, head_dim=16,
                        value_head_dim=16, attn_every=3)
    d = synthesize(cfg, str(tmp_path / "gdn_tp_stream"), seed=12, dtype=np.float32)
    toks = list((np.arange(40) * 7) % 512)
    want = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(64,)).generate_list(
        toks, 8, stop_token_ids=[])
    lm4 = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(64,),
                                 mesh=_mm(tp=2, dp=4))
    assert lm4.generate_list(toks, 8, stop_token_ids=[]) == want


def test_tp_hybrid_linear_model(tmp_path):
    """HybridSpec (RHT + QLoRA adapter) linears shard Megatron-style; the
    32-block RHT stays intact within each shard and logits match."""
    from uzu_tpu.config.model import (
        HybridSpec,
        IncoherenceProcessingMode,
        LowRankSpec,
    )

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=128, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    spec = HybridSpec(
        quantization_spec=IntSpec(bits=4, group_size=32, is_symmetric=True,
                                  layout=Layout.OUTPUT_INPUT),
        adapter_spec=LowRankSpec(rank=4),
        incoherence_block_size=32,
        incoherence_processing_mode=IncoherenceProcessingMode.INPUT_OUTPUT,
    )
    d = synthesize(cfg, str(tmp_path / "hybrid_tp"), seed=13,
                   linear_spec=spec, dtype=np.float32)
    toks = (np.arange(9) * 5) % 256
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    expected = _logits(lm, toks)
    got = _sharded_logits(d, make_mesh(tp=2, dp=4), toks)
    np.testing.assert_allclose(got, expected, rtol=2e-3, atol=2e-3)


def test_expert_parallel_all_to_all(tmp_path):
    """EP: experts sharded over 8 devices, tokens dispatched via all_to_all;
    with ample capacity the result equals single-device moe_forward exactly
    (and with starved capacity it still runs, just drops assignments)."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from uzu_tpu.models.moe import moe_forward
    from uzu_tpu.parallel.expert import default_capacity, moe_forward_ep
    from uzu_tpu.tools.synth import moe_config

    cfg_model = moe_config(num_layers=1, model_dim=64, num_experts=8,
                           num_active=2, expert_hidden_dim=96)
    d = synthesize(cfg_model, str(tmp_path / "moe_ep"), seed=9, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64)
    moe_cfg = lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = lm.params["layers"][0]["mlp"]

    mesh = make_mesh(tp=8, dp=1)
    rng = np.random.default_rng(0)
    s_local, dm = 16, 64  # per-device token slice
    n = 8
    x = jnp.asarray(rng.standard_normal((n * s_local, dm)), jnp.float32)

    expected = np.asarray(moe_forward(moe_cfg, params, x))

    cap = s_local * moe_cfg.num_active_routed_experts  # nothing can drop
    param_specs = {
        "router": jax.tree.map(lambda _: P(), params["router"]),
        "up": jax.tree.map(lambda _: P("tp"), params["up"]),
        "down": jax.tree.map(lambda _: P("tp"), params["down"]),
    }

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P("tp", None)),
        out_specs=P("tp", None),
        check_rep=False,
    )
    def ep(p, xs):
        return moe_forward_ep(moe_cfg, p, xs, axis_name="tp", capacity=cap)

    got = np.asarray(jax.jit(ep)(params, x))
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-4)

    # starved capacity: still finite, still runs
    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(param_specs, P("tp", None)),
        out_specs=P("tp", None),
        check_rep=False,
    )
    def ep_small(p, xs):
        return moe_forward_ep(moe_cfg, p, xs, axis_name="tp", capacity=8)

    small = np.asarray(jax.jit(ep_small)(params, x))
    assert np.isfinite(small).all()
    assert default_capacity(128, moe_cfg, 8) >= 8


def test_ring_attention_matches_reference():
    """Ring (blockwise) attention over a 4-device ring == full attention."""
    from functools import partial

    from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    from uzu_tpu.ops.attention import attention_reference
    from uzu_tpu.parallel.seqpar import make_sp_mesh, ring_attention

    rng = np.random.default_rng(2)
    s, h, g, dh, n = 32, 4, 2, 16, 4
    q = jnp.asarray(rng.standard_normal((s, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((s, g, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((s, g, dh)), jnp.float32)
    pos = jnp.arange(s, dtype=jnp.int32)
    scale = dh ** -0.5

    want = np.asarray(
        attention_reference(q, k, v, pos, scale=scale, is_causal=True)
    )

    mesh = make_sp_mesh(n)

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp"), P("sp")),
        out_specs=P("sp"), check_rep=False,
    )
    def ring(ql, kl, vl, pl):
        return ring_attention(
            ql, kl, vl, pl, pl, axis_name="sp", n_devices=n, scale=scale
        )

    got = np.asarray(jax.jit(ring)(q, k, v, pos))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # sliding window + soft cap variant
    want_w = np.asarray(
        attention_reference(q, k, v, pos, scale=scale, is_causal=True,
                            sliding_window_size=9, logit_soft_cap=30.0)
    )

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P("sp"), P("sp"), P("sp"), P("sp")),
        out_specs=P("sp"), check_rep=False,
    )
    def ring_w(ql, kl, vl, pl):
        return ring_attention(
            ql, kl, vl, pl, pl, axis_name="sp", n_devices=n, scale=scale,
            sliding_window_size=9, logit_soft_cap=30.0,
        )

    got_w = np.asarray(jax.jit(ring_w)(q, k, v, pos))
    np.testing.assert_allclose(got_w, want_w, rtol=2e-5, atol=2e-5)


def test_sequence_parallel_prefill_matches_single(model_dir):
    """SP prefill (tokens sharded over 4 devices) == single-device prefill,
    including the state it leaves behind (decode continuation agrees)."""
    from uzu_tpu.parallel.seqpar import make_sp_mesh, sequence_parallel_prefill

    toks = (np.arange(13) * 5) % 256
    lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    want_logits, want_state = lm.prefill(lm.new_state(), toks)

    mesh = make_sp_mesh(4)
    got_logits, got_state = sequence_parallel_prefill(
        lm.decoder_config, lm.params, lm.new_state(), toks, mesh
    )
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(want_logits), rtol=2e-4, atol=2e-4
    )
    # continuation: one decode step from each state produces the same logits
    nxt = jnp.asarray([int(np.argmax(np.asarray(want_logits)))], jnp.int32)

    @jax.jit
    def step(params, tokens, state):
        return decoder_forward(lm.decoder_config, params, tokens, state)

    l1, _ = step(lm.params, nxt, want_state)
    l2, _ = step(lm.params, nxt, got_state)
    np.testing.assert_allclose(np.asarray(l2), np.asarray(l1), rtol=2e-4, atol=2e-4)


def test_sequence_parallel_prefill_gemma(tmp_path):
    """SP prefill through PLE + KV-sharing + sliding window + soft caps."""
    from uzu_tpu.parallel.seqpar import make_sp_mesh, sequence_parallel_prefill
    from uzu_tpu.tools.synth import gemma_config

    cfg = gemma_config(num_heads=4, num_groups=2, model_dim=96)
    d = synthesize(cfg, str(tmp_path / "gemma_sp"), seed=12, dtype=np.float32)
    toks = (np.arange(11) * 3) % 512
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    want, _ = lm.prefill(lm.new_state(), toks)
    got, _ = sequence_parallel_prefill(
        lm.decoder_config, lm.params, lm.new_state(), toks, make_sp_mesh(4)
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


# -- product-surface wiring (round 2): the distributed layer must be
# reachable from LanguageModel / the engines / the server, not only from the
# raw sharding helpers above ------------------------------------------------


def test_language_model_tp_streams_identical(model_dir):
    """LanguageModel.from_dir(tp=, dp=) end-to-end generation is
    bit-identical to the single-device model."""
    toks = np.asarray([1, 2, 3, 4, 5])
    lm1 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    want = lm1.generate_list(toks, 10, stop_token_ids=[])
    lm4 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,),
                                 tp=4, dp=2)
    assert lm4.mesh is not None
    assert lm4.generate_list(toks, 10, stop_token_ids=[]) == want
    # sampled too (threefry keys are device-count independent)
    from uzu_tpu.engine.sampling import SamplingParams

    sp = SamplingParams(temperature=0.9, top_p=0.9)
    want_s = lm1.generate_list(toks, 10, sampling=sp, seed=7, stop_token_ids=[])
    assert lm4.generate_list(toks, 10, sampling=sp, seed=7, stop_token_ids=[]) == want_s


def test_batch_engine_over_mesh(model_dir):
    """Continuous batching on a (dp, tp) mesh: same streams as the
    single-device batch engine, slots sharded over dp."""
    from uzu_tpu.engine.batch import BatchEngine

    prompts = [[1, 2, 3], [9, 8, 7, 6], [42, 17], [5, 5, 5, 5, 5]]
    lm1 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    e1 = BatchEngine(lm1, batch_size=2, decode_chunk=4, stop_token_ids=[])
    r1 = [e1.submit(p, 8) for p in prompts]
    e1.run()

    lm4 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,),
                                 tp=4, dp=2)
    e4 = BatchEngine(lm4, batch_size=2, decode_chunk=4, stop_token_ids=[])
    r4 = [e4.submit(p, 8) for p in prompts]
    e4.run()
    for a, b in zip(r1, r4):
        assert a.tokens == b.tokens

    with pytest.raises(ValueError):
        BatchEngine(lm4, batch_size=3)  # 3 slots not divisible by dp=2


def test_paged_engine_over_mesh(model_dir):
    """Paged continuous batching with tp-sharded page pools matches the
    single-device paged engine."""
    from uzu_tpu.engine.paged_batch import PagedBatchEngine

    prompts = [[1, 2, 3], [9, 8, 7, 6], [42, 17]]
    lm1 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    e1 = PagedBatchEngine(lm1, batch_size=2, decode_chunk=4, num_pages=17,
                          page_size=8, stop_token_ids=[])
    r1 = [e1.submit(p, 8) for p in prompts]
    e1.run()

    lm4 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,),
                                 tp=4)
    e4 = PagedBatchEngine(lm4, batch_size=2, decode_chunk=4, num_pages=17,
                          page_size=8, stop_token_ids=[])
    r4 = [e4.submit(p, 8) for p in prompts]
    e4.run()
    for a, b in zip(r1, r4):
        assert a.tokens == b.tokens


def test_batched_server_over_mesh(model_dir, tmp_path):
    """The continuous-batching OpenAI server serves from a mesh-sharded
    model (the `cli serve --batched --tp N` path)."""
    import json
    import urllib.request

    from uzu_tpu.server.batched import serve_batched
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "tp_srv"), num_layers=2, model_dim=64,
                         hidden_dim=128, num_heads=8, num_groups=4, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64),
                                tp=4, dp=2)
    httpd = serve_batched(lm, Tokenizer(d), port=0, batch_size=2, decode_chunk=4)
    port = httpd.server_address[1]
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "hi"}],
                             "max_tokens": 6}).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=240) as r:
            out = json.load(r)
        assert out["usage"]["completion_tokens"] > 0
    finally:
        httpd.batch_server.shutdown()
        httpd.shutdown()


def test_cli_bench_tp(model_dir, tmp_path):
    """`cli bench --tp 4 --dp 2` runs and reports; sanity of the flag path."""
    import json

    from uzu_tpu.cli import main
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "cli_tp"), num_layers=2, model_dim=64,
                         hidden_dim=128, num_heads=8, num_groups=4, head_dim=16)
    task = tmp_path / "task.json"
    task.write_text(json.dumps({
        "messages": [{"role": "user", "content": "hello"}],
        "tokens_limit": 8, "number_of_runs": 1,
    }))
    out = tmp_path / "out.json"
    rc = main(["bench", d, str(task), str(out), "--max-context", "256",
               "--tp", "4", "--dp", "2"])
    assert rc == 0
    rep = json.loads(out.read_text())
    assert rep["tokens_count_output"] > 0


def test_pipeline_parallel_matches_single_device(tmp_path):
    """GPipe-style stage partition over pp=4: pipelined prefill + two decode
    steps produce the same per-sequence logits and KV as the vmapped
    single-device step (the cross-host axis TP cannot serve; SURVEY §2.7)."""
    from uzu_tpu.parallel import (
        make_pp_mesh,
        pipeline_forward,
        stack_pipeline_params,
        stack_pipeline_states,
        unstack_pipeline_states,
    )

    cfg = llama_config(num_layers=4, model_dim=64, hidden_dim=128, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "pp_llama"), seed=21, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    mesh = make_pp_mesh(4, devices=jax.devices()[:4])

    batch, s = 4, 8
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 256, (batch, s)).astype(np.int32)

    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[lm.new_state() for _ in range(batch)])
    pp_params = stack_pipeline_params(lm.decoder_config, lm.params, mesh)
    pp_states = stack_pipeline_states(lm.decoder_config, states, mesh, microbatches=2)

    # reference: vmapped single-device prefill + decode
    def ref_step(tokens, states, tl):
        def one(t, st):
            return decoder_forward(lm.decoder_config, lm.params, t, st, true_length=tl)
        return jax.vmap(one)(tokens, states)

    want, ref_states = ref_step(jnp.asarray(tokens), states, s)
    got, pp_states = pipeline_forward(
        lm.decoder_config, pp_params, jnp.asarray(tokens), pp_states, mesh,
        microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, 0]),
                               rtol=2e-4, atol=2e-4)

    # two greedy decode steps keep matching (state carried through the ring)
    for _ in range(2):
        nxt = jnp.argmax(want[:, 0], axis=-1).astype(jnp.int32)[:, None]
        want, ref_states = ref_step(nxt, ref_states, 1)
        got, pp_states = pipeline_forward(
            lm.decoder_config, pp_params, nxt, pp_states, mesh, microbatches=2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, 0]),
                                   rtol=2e-4, atol=2e-4)

    # the pipelined KV cache equals the reference cache exactly
    back = unstack_pipeline_states(pp_states)
    for li in range(4):
        for key in ("k", "v"):
            np.testing.assert_allclose(
                np.asarray(back["layers"][li][key]),
                np.asarray(ref_states["layers"][li][key]), rtol=2e-4, atol=2e-4)


def test_validate_pp_rejects_nonuniform(tmp_path):
    from uzu_tpu.parallel import validate_pp
    from uzu_tpu.tools.synth import qwen35_config

    cfg = qwen35_config(num_layers=4)
    with pytest.raises(ValueError):
        validate_pp(cfg.decoder_config, 2)
    cfg2 = llama_config(num_layers=4, model_dim=64, hidden_dim=128, num_heads=4,
                        num_groups=2, head_dim=16, vocab_size=256)
    with pytest.raises(ValueError):
        validate_pp(cfg2.decoder_config, 3)


def test_pipeline_times_tensor_parallel(tmp_path):
    """pp=2 × tp=4: the manual ppermute ring composes with GSPMD head
    sharding inside each stage (partial-auto shard_map); logits match the
    single-device step."""
    from uzu_tpu.parallel import (
        make_pp_mesh,
        pipeline_forward,
        stack_pipeline_params,
        stack_pipeline_states,
    )

    cfg = llama_config(num_layers=4, model_dim=64, hidden_dim=128, num_heads=8,
                       num_groups=4, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "pptp_llama"), seed=22, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    mesh = make_pp_mesh(pp=2, tp=4)

    batch, s = 4, 8
    tokens = np.random.default_rng(1).integers(0, 256, (batch, s)).astype(np.int32)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[lm.new_state() for _ in range(batch)])
    pp_params = stack_pipeline_params(lm.decoder_config, lm.params, mesh)
    pp_states = stack_pipeline_states(lm.decoder_config, states, mesh, microbatches=2)

    def one(t, st):
        return decoder_forward(lm.decoder_config, lm.params, t, st, true_length=s)

    want, _ = jax.vmap(one)(jnp.asarray(tokens), states)
    got, _ = pipeline_forward(
        lm.decoder_config, pp_params, jnp.asarray(tokens), pp_states, mesh,
        microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, 0]),
                               rtol=2e-4, atol=2e-4)


def test_spec_batch_engine_over_mesh(model_dir):
    """Speculative continuous batching (fused self-draft) over a (dp, tp)
    mesh matches the unsharded engine's streams."""
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    prompts = [[5, 6, 5, 6, 5], [1, 2, 3], [9, 9, 9, 9], [40, 41, 42]]
    lm1 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    eng1 = SpeculativeBatchEngine(lm1, batch_size=2, draft_block=3,
                                  draft_layers=1, stop_token_ids=[])
    want = [eng1.submit(p, 8) for p in prompts]
    eng1.run()

    lm4 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,),
                                 mesh=make_mesh(tp=4, dp=2))
    eng4 = SpeculativeBatchEngine(lm4, batch_size=2, draft_block=3,
                                  draft_layers=1, stop_token_ids=[])
    got = [eng4.submit(p, 8) for p in prompts]
    eng4.run()
    for a, b in zip(want, got):
        assert a.finished and b.finished
        assert a.tokens == b.tokens


def test_pipeline_parallel_hybrid_model(tmp_path):
    """PP over a periodic GDN+attention hybrid (Qwen3.5-style): stages are
    structurally identical when the mixer period divides L/P, so per-slot
    stacking carries both KV caches and recurrent conv/ssm states through
    the ring; logits match the vmapped single-device step."""
    from uzu_tpu.parallel import (
        make_pp_mesh,
        pipeline_forward,
        stack_pipeline_params,
        stack_pipeline_states,
    )
    from uzu_tpu.tools.synth import qwen35_config

    cfg = qwen35_config(num_layers=4, model_dim=64, hidden_dim=128,
                        num_heads=4, num_groups=2, head_dim=16,
                        value_head_dim=16, attn_every=2)
    d = synthesize(cfg, str(tmp_path / "pp_hybrid"), seed=23, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    mesh = make_pp_mesh(2, devices=jax.devices()[:2])

    batch, s = 4, 8
    tokens = np.random.default_rng(2).integers(0, 512, (batch, s)).astype(np.int32)
    states = jax.tree.map(lambda *xs: jnp.stack(xs), *[lm.new_state() for _ in range(batch)])
    pp_params = stack_pipeline_params(lm.decoder_config, lm.params, mesh)
    pp_states = stack_pipeline_states(lm.decoder_config, states, mesh, microbatches=2)

    def one(t, st):
        return decoder_forward(lm.decoder_config, lm.params, t, st, true_length=s)

    want, ref_states = jax.vmap(one)(jnp.asarray(tokens), states)
    got, pp_states = pipeline_forward(
        lm.decoder_config, pp_params, jnp.asarray(tokens), pp_states, mesh,
        microbatches=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want[:, 0]),
                               rtol=2e-4, atol=2e-4)

    # a decode step keeps matching (recurrent ssm/conv states ride the ring)
    nxt = jnp.argmax(want[:, 0], axis=-1).astype(jnp.int32)[:, None]
    want2, _ = jax.vmap(lambda t, st: decoder_forward(
        lm.decoder_config, lm.params, t, st, true_length=1))(nxt, ref_states)
    got2, _ = pipeline_forward(
        lm.decoder_config, pp_params, nxt, pp_states, mesh, microbatches=2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2[:, 0]),
                               rtol=2e-4, atol=2e-4)

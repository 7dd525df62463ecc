"""MoE block tests.

Mirrors the reference's MoE e2e strategy (tests/unit/encodable_block/moe/
moe_block_e2e_test.rs: GPU block vs a scalar host reference) — here the
gather (decode) and dense (prefill) data paths check each other, plus a
numpy scalar reference pins the routing/expert/finalize math.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import uzu_tpu.models.moe as moe_mod
from uzu_tpu import LanguageModel
from uzu_tpu.models.moe import moe_forward, router_topk
from uzu_tpu.tools.synth import moe_config, synthesize


@pytest.fixture(scope="module")
def moe_dir(tmp_path_factory):
    return synthesize(
        moe_config(), str(tmp_path_factory.mktemp("moe")), seed=5, dtype=np.float32
    )


@pytest.fixture(scope="module")
def moe_lm(moe_dir):
    return LanguageModel.from_dir(moe_dir, max_context=64, prefill_buckets=(8,))


def _numpy_moe_reference(cfg, params, x):
    """Scalar reference for router+experts+finalize (f32)."""
    p = lambda t: np.asarray(t, np.float32)
    logits = x @ p(params["router"]["w"]).T
    if "b" in params["router"]:
        logits = logits + p(params["router"]["b"])
    k = cfg.num_active_routed_experts
    dff = cfg.expert_hidden_dim
    out = np.zeros_like(x)
    for s in range(x.shape[0]):
        ids = np.argsort(-logits[s], kind="stable")[:k]
        vals = logits[s][ids]
        probs = np.exp(vals - vals.max())
        probs /= probs.sum()
        for prob, e in zip(probs, ids):
            up_out = x[s] @ p(params["up"]["w"][e]).T
            if "b" in params["up"]:
                up_out = up_out + p(params["up"]["b"][e])
            up, gate = up_out[:dff], up_out[dff:]
            hidden = gate / (1 + np.exp(-gate)) * up
            y = hidden @ p(params["down"]["w"][e]).T
            if "b" in params["down"]:
                y = y + p(params["down"]["b"][e])
            # down weights are lane-padded to a 128 multiple at load
            out[s] += prob * y[: x.shape[1]]
    return out


def test_moe_vs_numpy_reference(moe_lm, rng):
    cfg = moe_lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = moe_lm.params["layers"][0]["mlp"]
    x = rng.standard_normal((6, 64), dtype=np.float32)
    got = np.asarray(moe_forward(cfg, params, jnp.asarray(x)))
    want = _numpy_moe_reference(cfg, params, x)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_gather_and_dense_paths_agree(moe_lm, rng, monkeypatch):
    cfg = moe_lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = moe_lm.params["layers"][0]["mlp"]
    x = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32))
    dense = np.asarray(moe_forward(cfg, params, x))  # 3 <= threshold -> gather
    monkeypatch.setattr(moe_mod, "GATHER_PATH_MAX_TOKENS", 0)
    loop = np.asarray(moe_forward(cfg, params, x))
    np.testing.assert_allclose(dense, loop, rtol=1e-4, atol=1e-4)


def test_router_topk_renorm(moe_lm, rng):
    cfg = moe_lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = moe_lm.params["layers"][0]["mlp"]
    x = jnp.asarray(rng.standard_normal((4, 64), dtype=np.float32))
    ids, probs = router_topk(cfg, params, x)
    assert ids.shape == (4, cfg.num_active_routed_experts)
    np.testing.assert_allclose(np.asarray(probs).sum(-1), 1.0, rtol=1e-5)


def test_moe_model_end_to_end(moe_lm):
    toks = (np.arange(10) * 3) % 512
    l1, _ = moe_lm.prefill(moe_lm.new_state(), toks)
    assert l1.shape == (512,)
    out = moe_lm.generate_list(toks, 6, stop_token_ids=[])
    assert len(out) == 6


def test_moe_prefill_decode_consistency(moe_dir):
    toks = (np.arange(9) * 7) % 512
    lm1 = LanguageModel.from_dir(moe_dir, max_context=64, prefill_buckets=(16,))
    l1, _ = lm1.prefill(lm1.new_state(), toks)
    lm2 = LanguageModel.from_dir(moe_dir, max_context=64, prefill_buckets=(1,))
    s2 = lm2.new_state()
    for t in toks:
        l2, s2 = lm2.prefill(s2, np.array([t]))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=5e-4, atol=5e-4)


# -- quantized expert stacks (INT4/INT8 — the MXFP4-expert analogue) ----------


@pytest.fixture(scope="module")
def qmoe_dir(tmp_path_factory):
    from uzu_tpu.config.model import IntSpec, Layout

    spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                   layout=Layout.OUTPUT_INPUT)
    return synthesize(
        moe_config(model_dim=64, hidden_dim=128, expert_hidden_dim=96,
                   num_experts=8, num_active=2, vocab_size=512),
        str(tmp_path_factory.mktemp("qmoe")), seed=7, dtype=np.float32,
        linear_spec=spec, embedding_spec=spec,
    )


def test_quantized_experts_load_and_match_dequant(qmoe_dir):
    """INT4 expert stacks load as StackedQuantized; every forward path
    (gather decode / masked dense / grouped) matches the DEQUANTIZED
    dense computation within bf16-materialization tolerance."""
    from uzu_tpu.quant.format import StackedQuantized, dequantize_stacked

    lm = LanguageModel.from_dir(qmoe_dir, max_context=64, prefill_buckets=(8,))
    lc = lm.decoder_config.transformer_config.layer_configs[0]
    cfg = lc.mlp_config
    params = lm.params["layers"][0]["mlp"]
    assert isinstance(params["up"]["w"], StackedQuantized)
    assert params["up"]["w"].shape == (8, 2 * 96, 64)

    dense = {
        **params,
        "up": {**params["up"], "w": dequantize_stacked(params["up"]["w"],
                                                       jnp.float32)},
        "down": {**params["down"], "w": dequantize_stacked(params["down"]["w"],
                                                           jnp.float32)},
    }
    rng = np.random.default_rng(0)
    for s in (1, 3, 8):  # gather (<=4) and masked-dense widths
        x = jnp.asarray(rng.standard_normal((s, 64)), jnp.float32)
        got = np.asarray(moe_forward(cfg, params, x))
        want = np.asarray(moe_forward(cfg, dense, x))
        np.testing.assert_allclose(got, want, rtol=5e-2, atol=5e-3)


def test_quantized_experts_decode_equals_prefill(qmoe_dir):
    """End-to-end: greedy decode on the quantized-expert model equals
    teacher-forced re-prefill argmax (the engine invariant, tolerance-free
    at the ARGMAX level on this seed)."""
    lm = LanguageModel.from_dir(qmoe_dir, max_context=64, prefill_buckets=(8,))
    prompt = [1, 2, 3]
    toks = lm.generate_list(np.asarray(prompt), 8, stop_token_ids=[])
    state = lm.new_state()
    logits, _ = lm.prefill(state, np.asarray(prompt + toks[:-1], np.int32))
    assert int(np.argmax(np.asarray(logits))) == toks[-1]


def test_quantized_experts_serving(qmoe_dir):
    """The quantized-expert model serves through the paged + speculative
    engine identically to plain greedy decoding."""
    from uzu_tpu.engine.batch_spec import SpeculativePagedBatchEngine

    lm = LanguageModel.from_dir(qmoe_dir, max_context=128, prefill_buckets=(8,))
    prompt = [4, 5, 6]
    want = lm.generate_list(np.asarray(prompt), 10, stop_token_ids=[])
    eng = SpeculativePagedBatchEngine(lm, batch_size=2, draft_block=4,
                                      num_pages=16, page_size=16,
                                      stop_token_ids=[])
    r = eng.submit(prompt, 10)
    eng.run()
    assert r.tokens == want


def _synth_stack(rng, e, n, kdim, bits, g):
    from uzu_tpu.quant.format import StackedQuantized, pack_codes

    hi = (1 << bits) - 1
    codes = rng.integers(0, hi + 1, (e, n, kdim), dtype=np.uint8)
    scales = (rng.random((e, n, kdim // g)).astype(np.float32) * 0.02 + 0.01)
    return StackedQuantized(
        codes=jnp.asarray(pack_codes(codes, bits)),
        scales=jnp.asarray(scales),
        bits=bits, group_size=g, qbias_coeff=-float(1 << (bits - 1)),
    )


@pytest.mark.parametrize("bits,n,kdim", [
    (4, 256, 512),    # chunkless shallow K
    (4, 256, 352),    # non-128-divisible K (dff=1408-class whole-K block)
    (8, 256, 512),
    (4, 512, 4096),   # kg=128: chunked-scales path
])
def test_moe_expert_gemv_matches_oracle(rng, bits, n, kdim):
    """Fused expert-gather GEMV (interpret mode) == per-pair dequantized
    matmul. Pairs repeat experts and tokens (the S*K routed layout)."""
    from uzu_tpu.ops.pallas.moe_gemv import moe_expert_gemv, supported
    from uzu_tpu.quant.format import dequantize_stacked

    e, g = 5, 32
    sq = _synth_stack(rng, e, n, kdim, bits, g)
    assert supported(sq)
    ids = jnp.asarray([0, 3, 3, 4, 1, 0], jnp.int32)
    x = jnp.asarray(rng.standard_normal((ids.shape[0], kdim)), jnp.float32)
    got = np.asarray(moe_expert_gemv(sq, x, ids, interpret=True))
    dense = np.asarray(dequantize_stacked(sq, jnp.float32))
    want = np.stack([np.asarray(x[i]) @ dense[int(ids[i])].T
                     for i in range(ids.shape[0])])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_quantized_gather_kernel_path_matches_scan(qmoe_dir, rng, monkeypatch):
    """moe_forward's fused-kernel gather branch (forced pallas, interpreter
    on CPU) == the XLA dynamic-slice scan branch it replaces."""
    from uzu_tpu.ops.pallas import moe_gemv as gemv_mod

    lm = LanguageModel.from_dir(qmoe_dir, max_context=64, prefill_buckets=(8,))
    cfg = lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = lm.params["layers"][0]["mlp"]
    x = jnp.asarray(rng.standard_normal((3, 64)), jnp.float32)
    want = np.asarray(moe_forward(cfg, params, x))  # use_pallas() False: scan
    calls = []
    real = gemv_mod.moe_expert_gemv
    monkeypatch.setattr(
        gemv_mod, "moe_expert_gemv",
        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])
    monkeypatch.setenv("UZU_TPU_KERNELS", "pallas")
    got = np.asarray(moe_forward(cfg, params, x))
    assert len(calls) == 2, "fused kernel branch did not engage"
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_quantized_experts_padded_model_dim(tmp_path, monkeypatch, rng):
    """model_dim not 128-divisible (the real gpt-oss d=2880 class): the
    quantized down stack lane-pads N at load, every path slices back, and
    the fused kernels still engage under forced pallas."""
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.quant.format import StackedQuantized

    spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                   layout=Layout.OUTPUT_INPUT)
    d = synthesize(
        moe_config(model_dim=192, hidden_dim=384, expert_hidden_dim=96,
                   num_experts=8, num_active=2, vocab_size=512,
                   attn_head_dim=48),
        str(tmp_path / "qpad"), seed=11, dtype=np.float32, linear_spec=spec)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    params = lm.params["layers"][0]["mlp"]
    assert isinstance(params["down"]["w"], StackedQuantized)
    assert params["down"]["w"].shape[1] == 256  # 192 -> 256 lane pad
    cfg = lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    x = jnp.asarray(rng.standard_normal((3, 192)), jnp.float32)
    want = np.asarray(moe_forward(cfg, params, x))
    assert want.shape == (3, 192)
    x8 = jnp.asarray(rng.standard_normal((8, 192)), jnp.float32)
    want8 = np.asarray(moe_forward(cfg, params, x8))
    monkeypatch.setenv("UZU_TPU_KERNELS", "pallas")
    got = np.asarray(moe_forward(cfg, params, x))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    got8 = np.asarray(moe_forward(cfg, params, x8))
    np.testing.assert_allclose(got8, want8, rtol=2e-2, atol=2e-3)
    monkeypatch.delenv("UZU_TPU_KERNELS")
    # end-to-end: greedy decode == teacher-forced re-prefill argmax
    toks = lm.generate_list(np.asarray([1, 2, 3]), 6, stop_token_ids=[])
    state = lm.new_state()
    logits, _ = lm.prefill(state, np.asarray([1, 2, 3] + toks[:-1], np.int32))
    assert int(np.argmax(np.asarray(logits))) == toks[-1]

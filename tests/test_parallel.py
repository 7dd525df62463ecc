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

"""Recurrent-mixer tests (ShortConv / Mamba2 / Gated DeltaNet).

Strategy mirrors the reference's kernel-vs-reference discipline plus
state-invariance checks that pin the cross-chunk state handling:
- chunking invariance: one-shot prefill == token-at-a-time decode
  (exercises conv-state packing and recurrent state carry exactly like the
  reference's prefill vs decode kernel pair);
- padding invariance: bucketed (end-padded) prefill == exact prefill
  (exercises the identity-transition masking);
- a hand-computed ShortConv case against the kernel semantics of
  backends/cpu/kernel/short_conv/short_conv.rs.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.config.model import SeparableCausalConvConfig, ShortConvConfig
from uzu_tpu.models.ssm import make_ssm_state, ssm_forward
from uzu_tpu.tools.synth import (
    lfm2_config,
    mamba2_hybrid_config,
    qwen35_config,
    synthesize,
)

CONFIG_BUILDERS = {
    "lfm2": lfm2_config,
    "mamba2": mamba2_hybrid_config,
    "qwen35": qwen35_config,
}


@pytest.fixture(scope="module", params=list(CONFIG_BUILDERS))
def model_dir(request, tmp_path_factory):
    cfg = CONFIG_BUILDERS[request.param]()
    return synthesize(cfg, str(tmp_path_factory.mktemp(request.param)), seed=11, dtype=np.float32)


def test_prefill_decode_consistency(model_dir):
    """One-shot prefill == token-at-a-time stepping (state carry correct)."""
    toks = (np.arange(12) * 13) % 512
    lm1 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    l1, _ = lm1.prefill(lm1.new_state(), toks)

    lm2 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(1,))
    s2 = lm2.new_state()
    for t in toks:
        l2, s2 = lm2.prefill(s2, np.array([t]))

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=5e-4, atol=5e-4)


def test_mixed_chunking(model_dir):
    """Prefill split at an arbitrary boundary == one-shot prefill."""
    toks = (np.arange(11) * 29) % 512
    lm1 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    l1, _ = lm1.prefill(lm1.new_state(), toks)

    lm2 = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(4, 16))
    s2 = lm2.new_state()
    _, s2 = lm2.prefill(s2, toks[:7])
    l2, s2 = lm2.prefill(s2, toks[7:])

    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=5e-4, atol=5e-4)


def test_generation_runs(model_dir):
    lm = LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(16,))
    out = lm.generate_list(np.array([5, 6, 7]), 8, stop_token_ids=[])
    assert len(out) == 8
    out2 = lm.generate_list(np.array([5, 6, 7]), 8, stop_token_ids=[])
    assert out == out2


def test_short_conv_hand_computed():
    """Pin ShortConv to the reference kernel semantics on a tiny case."""
    d, kernel = 2, 3
    cfg = ShortConvConfig(
        in_projection_config=None,
        conv_config=SeparableCausalConvConfig(has_biases=False),
        out_projection_config=None,
        kernel_size=kernel,
    )
    # identity-ish projections so we can hand-compute:
    # in_proj = [pre | post | x] with pre = 1, post = 1, x = input
    w_in = np.zeros((3 * d, d), np.float32)
    w_in[2 * d :, :] = np.eye(d)  # x passthrough
    b_like_pre = np.zeros((3 * d,), np.float32)
    # make pre/post constant 1 via weights: impossible without bias, so use
    # rows that sum the input and inputs of ones instead
    w_in[:d, :] = 0.0
    w_out = np.eye(d, dtype=np.float32)

    conv_w = np.asarray([[0.5, 0.25, 1.0], [1.0, 0.0, 2.0]], np.float32)  # [d, k]

    params = {
        "in": {"w": jnp.asarray(w_in)},
        "out": {"w": jnp.asarray(w_out)},
        "conv_w": jnp.asarray(conv_w),
    }
    # With pre-gate = 0 the gated input x*pre is 0, so conv output is 0.
    state = make_ssm_state(cfg, d, jnp.float32)
    x = jnp.asarray(np.ones((4, d), np.float32))
    out, new_state = ssm_forward(cfg, params, x, None, state)
    np.testing.assert_allclose(np.asarray(out), 0.0)
    # conv state keeps last k-1 gated inputs (zeros here)
    np.testing.assert_allclose(np.asarray(new_state["conv"]), 0.0)

    # Now pre = sum(input) (row of ones): for input ones, pre = d = 2 -> x*pre = 2
    w_in2 = w_in.copy()
    w_in2[:d, :] = 1.0  # pre gate = sum of inputs = 2
    w_in2[d : 2 * d, :] = 0.5  # post gate = 0.5 * sum = 1
    params["in"]["w"] = jnp.asarray(w_in2)
    state = make_ssm_state(cfg, d, jnp.float32)
    out, new_state = ssm_forward(cfg, params, x, None, state)
    # gated input rows: x*pre = 2 for every token; post = 1
    # token 0: taps see [0, 0, 2] -> ch0: 1.0*2 = 2; ch1: 2*2 = 4
    # token 2+: taps see [2, 2, 2] -> ch0: (0.5+0.25+1)*2 = 3.5; ch1: 3*2=6
    np.testing.assert_allclose(np.asarray(out[0]), [2.0, 4.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out[3]), [3.5, 6.0], rtol=1e-5)
    np.testing.assert_allclose(np.asarray(new_state["conv"]), 2.0)


def test_delta_net_chunked_equals_scan():
    """The chunk-parallel WY-form delta rule == the per-token scan
    (the invariant behind the reference's DeltaNetPrefillChunked* kernels)."""
    from uzu_tpu.models.ssm import _delta_net_chunked

    rng = np.random.default_rng(3)
    s, h, dk, dv, chunk = 70, 3, 16, 24, 32  # 3 chunks, ragged tail
    qs = jnp.asarray(rng.standard_normal((s, h, dk)), jnp.float32)
    ks = jnp.asarray(rng.standard_normal((s, h, dk)), jnp.float32)
    vs = jnp.asarray(rng.standard_normal((s, h, dv)), jnp.float32)
    beta = jnp.asarray(rng.random((s, h)), jnp.float32)
    log_decay = jnp.asarray(-rng.random((s, h)) * 0.3, jnp.float32)
    # mask a padded tail like a bucketed prefill would
    valid = (np.arange(s) < 61)[:, None]
    beta = jnp.where(valid, beta, 0.0)
    log_decay = jnp.where(valid, log_decay, 0.0)
    ssm0 = jnp.asarray(rng.standard_normal((h, dv, dk)) * 0.1, jnp.float32)

    def step(ssm, inp):
        q_t, k_t, v_t, beta_t, decay_t = inp
        sk = jnp.einsum("hvk,hk->hv", ssm, k_t)
        sq = jnp.einsum("hvk,hk->hv", ssm, q_t)
        delta = beta_t[:, None] * (v_t - decay_t[:, None] * sk)
        kq = jnp.sum(k_t * q_t, axis=-1)
        o_t = decay_t[:, None] * sq + delta * kq[:, None]
        ssm = decay_t[:, None, None] * ssm + delta[:, :, None] * k_t[:, None, :]
        return ssm, o_t

    import jax

    ssm_ref, o_ref = jax.lax.scan(step, ssm0, (qs, ks, vs, beta, jnp.exp(log_decay)))
    ssm_chk, o_chk = _delta_net_chunked(qs, ks, vs, beta, log_decay, ssm0, chunk)
    np.testing.assert_allclose(np.asarray(o_chk)[:61], np.asarray(o_ref)[:61], rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ssm_chk), np.asarray(ssm_ref), rtol=5e-4, atol=5e-4)

    # regression: a FULL 64-row chunk with strong decay used to overflow the
    # upper-triangle decay-ratio exp into inf and leak NaN through the
    # multiplicative causal mask
    s2 = 64
    strong = jnp.asarray(-rng.random((s2, h)) * 2.0 - 0.5, jnp.float32)
    ssm_ref2, o_ref2 = jax.lax.scan(
        step, ssm0, (qs[:s2], ks[:s2], vs[:s2], beta[:s2], jnp.exp(strong))
    )
    ssm_chk2, o_chk2 = _delta_net_chunked(
        qs[:s2], ks[:s2], vs[:s2], beta[:s2], strong, ssm0, 64
    )
    assert np.isfinite(np.asarray(o_chk2)).all()
    np.testing.assert_allclose(np.asarray(o_chk2), np.asarray(o_ref2), rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(np.asarray(ssm_chk2), np.asarray(ssm_ref2), rtol=5e-4, atol=5e-4)


def test_mamba2_chunked_equals_scan():
    from uzu_tpu.models.ssm import _mamba2_chunked

    rng = np.random.default_rng(5)
    s, h, dh, n, chunk = 50, 2, 8, 12, 16
    xs = jnp.asarray(rng.standard_normal((s, h, dh)), jnp.float32)
    bs = jnp.asarray(rng.standard_normal((s, h, n)), jnp.float32)
    cs = jnp.asarray(rng.standard_normal((s, h, n)), jnp.float32)
    log_decay = jnp.asarray(-rng.random((s, h)) * 0.5, jnp.float32)
    valid = (np.arange(s) < 45)[:, None]
    xs = jnp.where(valid[:, :, None], xs, 0.0)
    log_decay = jnp.where(valid, log_decay, 0.0)
    ssm0 = jnp.asarray(rng.standard_normal((h, dh, n)) * 0.1, jnp.float32)

    def step(ssm, inp):
        x_t, b_t, c_t, decay_t = inp
        ssm = ssm * decay_t[:, None, None] + x_t[:, :, None] * b_t[:, None, :]
        return ssm, jnp.einsum("hdn,hn->hd", ssm, c_t)

    import jax

    ssm_ref, y_ref = jax.lax.scan(step, ssm0, (xs, bs, cs, jnp.exp(log_decay)))
    ssm_chk, y_chk = _mamba2_chunked(xs, bs, cs, log_decay, ssm0, chunk)
    np.testing.assert_allclose(np.asarray(y_chk)[:45], np.asarray(y_ref)[:45], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(ssm_chk), np.asarray(ssm_ref), rtol=2e-4, atol=2e-4)


def test_chunked_prefill_path_matches_scan_path(model_dir):
    """Model-level: a bucket-64 prefill (chunked core) == per-token decode."""
    toks = (np.arange(40) * 7) % 512
    lm1 = LanguageModel.from_dir(model_dir, max_context=128, prefill_buckets=(64,))
    l1, _ = lm1.prefill(lm1.new_state(), toks)
    lm2 = LanguageModel.from_dir(model_dir, max_context=128, prefill_buckets=(1,))
    s2 = lm2.new_state()
    for t in toks:
        l2, s2 = lm2.prefill(s2, np.array([t]))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=2e-3, atol=2e-3)


def test_gemma_ple_kv_sharing(tmp_path):
    """Gemma-style model: PLE + KV sharing + soft caps + sliding window.

    Chunked prefill vs token-at-a-time pins the PLE math and shared-KV
    state handling across chunk boundaries."""
    from uzu_tpu.tools.synth import gemma_config

    d = synthesize(gemma_config(), str(tmp_path / "gemma"), seed=21, dtype=np.float32)
    toks = (np.arange(12) * 19) % 512
    lm1 = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    l1, _ = lm1.prefill(lm1.new_state(), toks)
    lm2 = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(1,))
    s2 = lm2.new_state()
    for t in toks:
        l2, s2 = lm2.prefill(s2, np.array([t]))
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=5e-4, atol=5e-4)
    out = lm1.generate_list(toks, 6, stop_token_ids=[])
    assert len(out) == 6

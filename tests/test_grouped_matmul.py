"""Grouped expert matmul (MoE prefill kernel) tests.

Role parity: the reference's tiled expert prefill pipeline
(backends/metal/kernel/moe/experts_two_pass_prefill.metal + tiles_map.metal)
is validated there by moe_block_e2e_test.rs against a host reference; here
the Pallas kernel runs in interpreter mode against (a) an XLA oracle with
identical tile semantics and (b) the masked-dense moe_forward path.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import uzu_tpu.models.moe as moe_mod
from uzu_tpu import LanguageModel
from uzu_tpu.models.moe import moe_forward, router_topk
from uzu_tpu.ops.pallas.grouped_matmul import (
    grouped_matmul,
    grouped_matmul_xla,
    pick_blocks,
    route_layout,
    supports,
)
from uzu_tpu.tools.synth import moe_config, synthesize

BM = 16  # small tile for tests (production uses 64)


def _layout_np(flat_e, e, bm):
    """Numpy oracle for route_layout."""
    t = len(flat_e)
    order = np.argsort(flat_e, kind="stable")
    counts = np.bincount(flat_e, minlength=e)
    padded = -(-counts // bm) * bm
    pstart = np.concatenate([[0], np.cumsum(padded)])[:-1]
    start = np.concatenate([[0], np.cumsum(counts)])[:-1]
    dst = np.empty(t, np.int64)
    for j, tok in enumerate(order):
        ex = flat_e[tok]
        dst[j] = pstart[ex] + (j - start[ex])
    return order, dst, pstart, padded


def test_route_layout_matches_numpy():
    rng = np.random.default_rng(0)
    e = 7
    flat_e = rng.integers(0, e, 95).astype(np.int32)
    flat_e[flat_e == 3] = 1  # expert 3 gets zero tokens
    order, dst, tile_expert, used, row_expert = map(
        np.asarray, route_layout(jnp.asarray(flat_e), e, BM))
    o_np, d_np, pstart, padded = _layout_np(flat_e, e, BM)
    assert np.array_equal(order, o_np)
    assert np.array_equal(dst, d_np)
    total = padded.sum()
    assert used[0] == total // BM
    # every used tile's rows belong to exactly one expert
    for tmt in range(used[0]):
        row = tmt * BM
        ex = np.searchsorted(pstart, row, side="right") - 1
        # skip empty groups that share the same pstart
        while padded[ex] == 0:
            ex -= 1
        assert tile_expert[tmt] == ex
    # rows within the used range map to the owning expert
    for j, tok in enumerate(o_np):
        assert row_expert[d_np[j]] == flat_e[tok]
    # dst slots are unique
    assert len(set(dst.tolist())) == len(dst)


@pytest.mark.parametrize("n,k", [(256, 128), (128, 384)])
def test_kernel_matches_xla_oracle(n, k):
    rng = np.random.default_rng(1)
    e, t = 5, 70
    flat_e = rng.integers(0, e, t).astype(np.int32)
    order, dst, tile_expert, used, _ = route_layout(jnp.asarray(flat_e), e, BM)
    tp = (-(-t // BM)) * BM + e * BM
    x_pad = jnp.zeros((tp, k), jnp.float32).at[dst].set(
        jnp.asarray(rng.standard_normal((t, k)), jnp.float32))
    w = jnp.asarray(rng.standard_normal((e, n, k)) * 0.1, jnp.float32)
    got = grouped_matmul(x_pad, w, tile_expert, used, bm=BM, interpret=True)
    want = grouped_matmul_xla(x_pad, w, tile_expert, used, bm=BM)
    rows = np.asarray(dst)  # only real-token rows are defined output
    np.testing.assert_allclose(np.asarray(got)[rows], np.asarray(want)[rows],
                               rtol=1e-5, atol=1e-5)


def test_supports_and_blocks():
    assert supports(5760, 2880)      # gpt-oss up: bn=128, bk=whole 2880
    assert supports(2944, 2880)      # gpt-oss down (lane-padded d)
    assert supports(256, 128)
    assert not supports(192, 64)     # tiny test config: N not 128-divisible
    assert pick_blocks(4096, 2048) == (256, 1024)


@pytest.fixture(scope="module")
def grouped_lm(tmp_path_factory):
    # dims chosen so the grouped path tiles: 2*dff=256, down N=128
    d = synthesize(
        moe_config(model_dim=128, hidden_dim=256, expert_hidden_dim=128,
                   num_experts=8, num_active=2, vocab_size=512,
                   attn_head_dim=32),
        str(tmp_path_factory.mktemp("moe_grp")), seed=7, dtype=np.float32)
    return LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))


def test_grouped_forward_matches_dense(grouped_lm):
    cfg = grouped_lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = grouped_lm.params["layers"][0]["mlp"]
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((96, 128)), jnp.float32)
    dense = np.asarray(moe_forward(cfg, params, x))  # CPU -> dense path
    ids, probs = router_topk(cfg, params, x)
    grouped = np.asarray(
        moe_mod._grouped_forward(cfg, params, x, ids, probs, interpret=True))
    np.testing.assert_allclose(grouped[:, :128], dense, rtol=2e-4, atol=2e-4)


def test_grouped_forward_skewed_routing(grouped_lm):
    """All tokens forced onto one expert (max padding skew) and a router
    that never selects half the experts."""
    cfg = grouped_lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = grouped_lm.params["layers"][0]["mlp"]
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((64, 128)), jnp.float32)
    ids, probs = router_topk(cfg, params, x)
    # force: every token routed to experts {2, 5} with fixed probs
    ids = jnp.full_like(ids, 2).at[:, 1].set(5)
    probs = jnp.full_like(probs, 0.5)
    grouped = np.asarray(
        moe_mod._grouped_forward(cfg, params, x, ids, probs, interpret=True))

    # dense oracle under the same forced routing
    dff = cfg.expert_hidden_dim
    xf = np.asarray(x, np.float32)
    want = np.zeros((64, 128), np.float32)
    for col in range(2):
        e_id = int(ids[0, col])
        up = xf @ np.asarray(params["up"]["w"][e_id], np.float32).T
        up = up + np.asarray(params["up"]["b"][e_id], np.float32)
        u, g = up[:, :dff], up[:, dff:]
        hidden = g / (1 + np.exp(-g)) * u
        y = hidden @ np.asarray(params["down"]["w"][e_id], np.float32).T
        y = y + np.asarray(params["down"]["b"][e_id], np.float32)
        want += 0.5 * y[:, :128]
    np.testing.assert_allclose(grouped[:, :128], want, rtol=2e-4, atol=2e-4)


def test_lane_padded_down_projection(tmp_path_factory):
    """model_dim=160 (not 128-divisible): load_moe pads the down output dim
    to 256; grouped path tiles and every path slices back to 160."""
    d = synthesize(
        moe_config(model_dim=160, hidden_dim=256, expert_hidden_dim=128,
                   num_experts=4, num_active=2, vocab_size=512,
                   attn_heads=4, attn_groups=2, attn_head_dim=40),
        str(tmp_path_factory.mktemp("moe_pad")), seed=9, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    cfg = lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = lm.params["layers"][0]["mlp"]
    assert params["down"]["w"].shape[1] == 256  # padded
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((80, 160)), jnp.float32)
    dense = np.asarray(moe_forward(cfg, params, x))
    assert dense.shape == (80, 160)
    ids, probs = router_topk(cfg, params, x)
    grouped = np.asarray(
        moe_mod._grouped_forward(cfg, params, x, ids, probs, interpret=True))
    np.testing.assert_allclose(grouped[:, :160], dense, rtol=2e-4, atol=2e-4)


def _stack(rng, e, n, kdim, g=32):
    from uzu_tpu.quant.format import StackedQuantized, pack_codes

    codes = rng.integers(0, 16, (e, n, kdim), dtype=np.uint8)
    scales = rng.random((e, n, kdim // g)).astype(np.float32) * 0.02 + 0.01
    return StackedQuantized(
        codes=jnp.asarray(pack_codes(codes, 4)), scales=jnp.asarray(scales),
        bits=4, group_size=g, qbias_coeff=-8.0)


@pytest.mark.parametrize("n,k", [(256, 128), (128, 384), (512, 4096)])
def test_quant_kernel_matches_dequant_oracle(n, k):
    """Grouped matmul with in-kernel INT4 dequant == dense grouped oracle
    over the dequantized stack (f32 in interpret mode: exact math)."""
    from uzu_tpu.ops.pallas.grouped_matmul import (
        grouped_matmul_quant, supports_quant)
    from uzu_tpu.quant.format import dequantize_stacked

    rng = np.random.default_rng(2)
    e, t = 5, 70
    sq = _stack(rng, e, n, k)
    assert supports_quant(sq)
    flat_e = rng.integers(0, e, t).astype(np.int32)
    order, dst, tile_expert, used, _ = route_layout(jnp.asarray(flat_e), e, BM)
    tp = (-(-t // BM)) * BM + e * BM
    x_pad = jnp.zeros((tp, k), jnp.float32).at[dst].set(
        jnp.asarray(rng.standard_normal((t, k)), jnp.float32))
    got = grouped_matmul_quant(x_pad, sq, tile_expert, used, bm=BM,
                               interpret=True)
    w = dequantize_stacked(sq, jnp.float32)
    want = grouped_matmul_xla(x_pad, w, tile_expert, used, bm=BM)
    rows = np.asarray(dst)
    np.testing.assert_allclose(np.asarray(got)[rows], np.asarray(want)[rows],
                               rtol=1e-4, atol=1e-4)


def test_quant_grouped_forward_path_engages(tmp_path, monkeypatch):
    """moe_forward routes quantized prefill widths through the in-kernel-
    dequant grouped path under forced pallas, matching the XLA dequant
    route it replaces."""
    from uzu_tpu.config.model import IntSpec, Layout
    import uzu_tpu.models.moe as moe_mod
    from uzu_tpu.models.moe import moe_forward

    spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                   layout=Layout.OUTPUT_INPUT)
    d = synthesize(
        moe_config(model_dim=128, hidden_dim=256, expert_hidden_dim=128,
                   num_experts=8, num_active=2, vocab_size=512,
                   attn_head_dim=32),
        str(tmp_path / "qgrp"), seed=9, dtype=np.float32, linear_spec=spec)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
    cfg = lm.decoder_config.transformer_config.layer_configs[0].mlp_config
    params = lm.params["layers"][0]["mlp"]
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((8, 128)), jnp.float32)
    want = np.asarray(moe_forward(cfg, params, x))  # XLA dequant route
    calls = []
    real = moe_mod._grouped_quant_forward
    monkeypatch.setattr(
        moe_mod, "_grouped_quant_forward",
        lambda *a, **kw: (calls.append(1), real(*a, **kw))[1])
    monkeypatch.setenv("UZU_TPU_KERNELS", "pallas")
    got = np.asarray(moe_forward(cfg, params, x))
    assert calls, "quantized grouped branch did not engage"
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-3)

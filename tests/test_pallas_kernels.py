"""Pallas kernel tests (interpreter mode on CPU).

Port of the reference's kernel-vs-host-reference discipline
(tests/unit/backends/common/kernel/matmul/*_test.rs): each kernel runs in
Pallas interpret mode against the pure-XLA dequantize-then-dot reference
across quant methods, bit widths, group sizes, and M shapes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uzu_tpu.quant.format import dequantize, from_disk_tensors, quantize_reference
from uzu_tpu.ops.pallas.quant_matmul import quant_matmul_pallas, supported


def _make_qt(rng, n, k, bits, g, method, dtype=np.float32):
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.1
    parts = quantize_reference(w, bits, g, method, dtype=dtype)
    return from_disk_tensors(
        method,
        parts["weights"],
        parts["scales"],
        bits,
        g,
        zero_points=parts.get("zero_points"),
        biases=parts.get("biases"),
        dtype=jnp.float32,
    )


CASES = [
    (4, 32, "scale_symmetric"),
    (4, 64, "scale_bias"),
    (4, 128, "scale_zero_point"),
    (8, 32, "scale_symmetric"),
    (8, 64, "scale_zero_point"),
    (8, 128, "scale_bias"),
]


@pytest.mark.parametrize("bits,g,method", CASES)
@pytest.mark.parametrize("m", [1, 5, 16])
def test_quant_matmul_matches_reference(rng, bits, g, method, m):
    n, k = 256, 512
    qt = _make_qt(rng, n, k, bits, g, method)
    x = jnp.asarray(rng.standard_normal((m, k), dtype=np.float32))
    want = x @ dequantize(qt, jnp.float32).T
    got = quant_matmul_pallas(qt, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("bits", [4, 8])
def test_quant_matmul_deep_k_chunked_scales(rng, bits):
    """K=8192 @ g=32 has kg=256 > 128: decode-M engages the chunked-scales
    blocks (per-chunk 128-group scale tiles, grid-invariant expansion
    matrix). Oracle parity for the auto tile AND for every explicit deep-K
    autotune candidate — chunking derives from the FINAL tile, so measured
    table entries and block_k overrides run the same layout the tuner
    timed (chunked at kgc % 128 == 0, whole-kg resident otherwise)."""
    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p

    n, k = 256, 8192
    qt = _make_qt(rng, n, k, bits, 32, "scale_symmetric")
    want_w = dequantize(qt, jnp.float32).T
    x = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32))
    want = x @ want_w
    got = quant_matmul_pallas(qt, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3,
                               atol=1e-3)
    gsub = 32 // (2 if bits == 4 else 1)
    kp = k // (2 if bits == 4 else 1)
    # decode M=1 and prefill M=64, explicit tiles spanning unchunked
    # (kgc=64), exactly-chunked (kgc=128), and multi-chunk (kgc=256)
    x64 = jnp.asarray(rng.standard_normal((64, k), dtype=np.float32))
    want64 = x64 @ want_w
    for bk in (64 * gsub, 128 * gsub, 256 * gsub):
        if kp % bk:
            continue
        got1 = _quant_matmul_p(x, qt.codes, qt.scales, qt.qbias, bits=bits,
                               group_size=32, interpret=True, block_k=bk,
                               qbias_coeff=qt.qbias_coeff)[:1]
        np.testing.assert_allclose(np.asarray(got1), np.asarray(want),
                                   rtol=1e-3, atol=1e-3, err_msg=f"bk={bk}")
        got64 = _quant_matmul_p(x64, qt.codes, qt.scales, qt.qbias, bits=bits,
                                group_size=32, interpret=True, block_k=bk,
                                qbias_coeff=qt.qbias_coeff)
        np.testing.assert_allclose(np.asarray(got64), np.asarray(want64),
                                   rtol=2e-2, atol=2e-2, err_msg=f"bk={bk}")


def test_quant_matmul_bf16_scales_expansion_exact(rng):
    """bf16-stored scales take the single-pass bf16 expansion dot; every
    output column of the expansion selects exactly one scale, so the result
    must match the f32-scales kernel on identical values bit-for-bit."""
    n, k = 256, 512
    w = rng.standard_normal((n, k), dtype=np.float32) * 0.1
    parts = quantize_reference(w, 4, 32, "scale_symmetric")
    qt_bf16 = from_disk_tensors("scale_symmetric", parts["weights"],
                                parts["scales"], 4, 32, dtype=jnp.bfloat16)
    qt_f32 = from_disk_tensors("scale_symmetric", parts["weights"],
                               np.asarray(qt_bf16.scales, np.float32), 4, 32,
                               dtype=jnp.float32)
    # identical stored values, different dtypes -> identical dequant
    x = jnp.asarray(rng.standard_normal((1, k), dtype=np.float32))
    got_bf16 = quant_matmul_pallas(qt_bf16, x, interpret=True)
    got_f32 = quant_matmul_pallas(qt_f32, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got_bf16), np.asarray(got_f32),
                               rtol=0, atol=0)


def test_quant_matmul_3d_input(rng):
    qt = _make_qt(rng, 256, 512, 4, 32, "scale_symmetric")
    x = jnp.asarray(rng.standard_normal((2, 3, 512), dtype=np.float32))
    got = quant_matmul_pallas(qt, x, interpret=True)
    want = jnp.einsum("abk,nk->abn", x, dequantize(qt, jnp.float32))
    assert got.shape == (2, 3, 256)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-3)


def test_supported_routing(rng):
    # odd N -> unsupported, falls back to XLA path
    qt = _make_qt(rng, 192, 512, 4, 32, "scale_symmetric")
    assert not supported(qt, jnp.zeros((1, 512)))
    qt = _make_qt(rng, 256, 512, 4, 32, "scale_symmetric")
    assert supported(qt, jnp.zeros((1, 512)))


def test_forced_pallas_mode_end_to_end(rng, tmp_path, monkeypatch):
    """UZU_TPU_KERNELS=pallas runs the whole model through the kernels
    (interpret mode on CPU) and must match the XLA path."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=128, hidden_dim=256, num_heads=4,
                       num_groups=2, head_dim=32, vocab_size=256)
    spec = IntSpec(bits=4, group_size=32, is_symmetric=True, layout=Layout.OUTPUT_INPUT)
    d = synthesize(cfg, str(tmp_path / "m"), seed=3, linear_spec=spec, dtype=np.float32)
    toks = (np.arange(7) * 11) % 256

    monkeypatch.setenv("UZU_TPU_KERNELS", "xla")
    lm = LanguageModel.from_dir(d, max_context=32, prefill_buckets=(8,))
    want, _ = lm.prefill(lm.new_state(), toks)

    monkeypatch.setenv("UZU_TPU_KERNELS", "pallas")
    lm2 = LanguageModel.from_dir(d, max_context=32, prefill_buckets=(8,))
    got, _ = lm2.prefill(lm2.new_state(), toks)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-3, atol=2e-3)


# --------------------------------------------------------------------------
# Flash-attention prefill kernel
# --------------------------------------------------------------------------


def _fa_case(seed, s=64, c=256, h=8, g=2, dh=32, pos0=100):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((s, h, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((c, g, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((c, g, dh)), jnp.float32)
    pos = jnp.arange(s, dtype=jnp.int32) + pos0
    return q, k, v, pos


@pytest.mark.parametrize("variant", ["plain", "window", "softcap", "sinks"])
def test_flash_attention_matches_reference(variant):
    from uzu_tpu.ops.attention import attention_reference
    from uzu_tpu.ops.pallas.flash_attention import flash_attention

    q, k, v, pos = _fa_case(7)
    scale = q.shape[-1] ** -0.5
    kw = {}
    if variant == "window":
        kw["sliding_window_size"] = 37
    if variant == "softcap":
        kw["logit_soft_cap"] = 20.0
    if variant == "sinks":
        kw["sinks"] = jnp.asarray(np.random.default_rng(1).standard_normal(8), jnp.float32)
    want = attention_reference(q, k, v, pos, scale=scale, is_causal=True, **kw)
    got = flash_attention(q, k, v, pos, scale=scale, interpret=True, **kw)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_flash_attention_ring_layout_unsupported():
    """Ring layouts (arbitrary kv slot positions) stay on the einsum path;
    offset contiguous positions work in the kernel."""
    from uzu_tpu.ops.attention import attention_reference
    from uzu_tpu.ops.pallas.flash_attention import flash_attention, supported

    assert not supported(32, 8, 2, 32, 128, is_causal=True, suffix_mask=None,
                         kv_valid_length=None, kv_positions=object())
    q, k, v, pos = _fa_case(9, s=32, c=128, pos0=40)
    scale = q.shape[-1] ** -0.5
    want = attention_reference(q, k, v, pos, scale=scale)
    got = flash_attention(q, k, v, pos, scale=scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_flash_attention_int8_kv():
    """INT8 KV codes dequantized in-kernel == dequant-then-attend."""
    from uzu_tpu.models.kv_cache import _quantize_rows
    from uzu_tpu.ops.attention import attention_reference
    from uzu_tpu.ops.pallas.flash_attention import flash_attention

    q, k, v, pos = _fa_case(11, s=32, c=128)
    k_q, k_s = _quantize_rows(k)
    v_q, v_s = _quantize_rows(v)
    k_deq = k_q.astype(jnp.float32) * k_s[..., None]
    v_deq = v_q.astype(jnp.float32) * v_s[..., None]
    scale = q.shape[-1] ** -0.5
    want = attention_reference(q, k_deq, v_deq, pos, scale=scale)
    got = flash_attention(q, k_q, v_q, pos, scale=scale,
                          k_scales=k_s, v_scales=v_s, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_flash_attention_dispatch_in_forced_pallas(monkeypatch, tmp_path):
    """UZU_TPU_KERNELS=pallas routes prefill attention through the flash
    kernel (interpreter on CPU) and generation output is unchanged."""
    import uzu_tpu.runtime as runtime
    from uzu_tpu import LanguageModel
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=8,
                       num_groups=2, head_dim=16, vocab_size=256)
    d = synthesize(cfg, str(tmp_path / "fa_model"), seed=5, dtype=np.float32)
    toks = (np.arange(40) * 3) % 256
    lm = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(64,))
    want = lm.generate_list(toks, 6, stop_token_ids=[])
    monkeypatch.setenv("UZU_TPU_KERNELS", "pallas")
    lm2 = LanguageModel.from_dir(d, max_context=128, prefill_buckets=(64,))
    got = lm2.generate_list(toks, 6, stop_token_ids=[])
    assert got == want


def test_tile_table_lookup_and_policy(tmp_path, monkeypatch):
    """A measured tile table overrides the heuristic policy for matching
    shapes and is ignored when its entry doesn't divide the shape."""
    import json as _json

    from uzu_tpu.ops.pallas import autotune
    from uzu_tpu.ops.pallas.quant_matmul import _tile_policy

    table = {"4:1024:2048:gemm": [128, 512], "4:1024:2048:gemv": [256, 256],
             "4:999:2048:gemm": [512, 512]}
    path = tmp_path / "tiles.json"
    path.write_text(_json.dumps(table))
    monkeypatch.setenv("UZU_TPU_TILE_TABLE", str(path))
    autotune._load_table.cache_clear()
    try:
        # gemm bucket hit
        assert _tile_policy(1024, 1024, 16, 512, bits=4, kdim=2048) == (128, 512)
        # gemv bucket hit
        assert _tile_policy(1024, 1024, 16, 8, bits=4, kdim=2048) == (256, 256)
        # entry exists for N=999 but cannot divide it -> heuristic fallback
        # (the heuristic finds no tile either; the kernel wrapper's
        # supported() guard rejects such shapes before dispatch)
        tn, kc = _tile_policy(999, 1024, 16, 512, bits=4, kdim=2048)
        assert tn != 512 or kc != 512  # the bogus table entry was NOT used
        # no entry -> heuristic (deep-K prefill: r3 on-chip sweep winner)
        tn2, kc2 = _tile_policy(2048, 4096, 16, 512, bits=4, kdim=8192)
        assert (tn2, kc2) == (512, 1024)
    finally:
        autotune._load_table.cache_clear()


def test_tile_policy_vmem_budget():
    """Decode full-K chunks are capped by the Mosaic scoped-VMEM stack
    budget: the 8B down-projection (N=4096, K=14336, gs=32 -> kg=448,
    non-128-divisible so scales can't chunk) blew the 16 MB limit at
    kc=7168 on chip (CHIP_JOBS_r3.log bench_tiles: 26.87M scoped alloc);
    the policy must fall back to a deeper-than-512 chunk that fits."""
    from uzu_tpu.ops.pallas.quant_matmul import (
        _VMEM_STACK_BUDGET, _kernel_stack_bytes, _tile_policy)

    tn, kc = _tile_policy(4096, 7168, 16, 8, bits=4, kdim=14336)
    assert _kernel_stack_bytes(tn, kc, 7168 // 16, 16) <= _VMEM_STACK_BUDGET
    assert (tn, kc) == (256, 1024)  # deepest dividing chunk under budget
    # the model reproduces the observed on-chip reject
    assert _kernel_stack_bytes(256, 7168, 448, 16) > 16 * 1024 * 1024
    # 1B shapes keep their measured-optimal tiles (regression guard)
    assert _tile_policy(2048, 4096, 16, 8, bits=4, kdim=8192) == (128, 2048)
    assert _tile_policy(16384, 1024, 16, 8, bits=4, kdim=2048) == (256, 1024)


def test_quant_matmul_8b_down_shape_interpret(rng):
    """Numerics on the exact shape class that OOM'd on chip (scaled down in
    N for test speed, same K/kg structure: K=14336, gs=32, kg=448)."""
    qt = _make_qt(rng, 256, 14336, 4, 32, "scale_bias")
    x = jnp.asarray(rng.standard_normal((2, 14336), dtype=np.float32))
    want = x @ dequantize(qt, jnp.float32).T
    got = quant_matmul_pallas(qt, x, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-3, atol=1e-3)


def test_autotune_shapes_smoke(monkeypatch, tmp_path):
    """autotune runs end-to-end (interpreter on CPU) and produces winners
    that the kernel accepts."""
    from uzu_tpu.ops.pallas import autotune as at

    monkeypatch.setattr(at, "CANDIDATES", ((128, 128), (128, 64)))
    table = at.autotune_shapes([(128, 256)], m_list=(8,), reps=1, verbose=False)
    assert len(table) == 1
    ((key, val),) = table.items()
    assert key == "4:128:256:gemv:sym" and val[0] == 128
    p = at.save_table(table, str(tmp_path / "t.json"))
    import json as _json

    assert _json.load(open(p))[key] == val


# --------------------------------------------------------------------------
# Paged decode attention
# --------------------------------------------------------------------------


def test_paged_decode_attention_matches_reference():
    """Per-slot page tables over a shared pool: kernel == gather oracle,
    including ragged lengths, shared physical pages, and soft caps."""
    from uzu_tpu.ops.pallas.paged_attention import (
        paged_attention_reference,
        paged_decode_attention,
    )

    rng = np.random.default_rng(4)
    B, H, G, dh = 3, 8, 2, 32
    P, page, maxp = 16, 16, 6
    q = jnp.asarray(rng.standard_normal((B, H, dh)), jnp.float32)
    k_pool = jnp.asarray(rng.standard_normal((G, P, page, dh)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((G, P, page, dh)), jnp.float32)
    table = jnp.asarray(rng.integers(0, P, (B, maxp), dtype=np.int64), jnp.int32)
    table = table.at[2].set(table[0])  # slot 2 shares slot 0's pages (prefix sharing)
    lengths = jnp.asarray([37, 96, 17], jnp.int32)
    for cap in (None, 25.0):
        want = paged_attention_reference(q, k_pool, v_pool, table, lengths,
                                         scale=dh ** -0.5, logit_soft_cap=cap)
        got = paged_decode_attention(q, k_pool, v_pool, table, lengths,
                                     scale=dh ** -0.5, logit_soft_cap=cap,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)


def test_paged_decode_attention_window_sinks_matches_reference():
    """Sliding-window masking (with DMA-skip page clamping) and attention
    sinks (host-side stat fold) == the gather oracle, bf16 and i8 pools."""
    from uzu_tpu.ops.pallas.paged_attention import (
        paged_attention_reference,
        paged_decode_attention,
    )

    rng = np.random.default_rng(5)
    B, H, G, dh = 3, 8, 4, 32
    P, page, maxp = 16, 32, 6
    q = jnp.asarray(rng.standard_normal((B, H, dh)), jnp.float32)
    k_pool = jnp.asarray(rng.standard_normal((G, P, page, dh)), jnp.float32)
    v_pool = jnp.asarray(rng.standard_normal((G, P, page, dh)), jnp.float32)
    table = jnp.asarray(rng.integers(0, P, (B, maxp), dtype=np.int64), jnp.int32)
    lengths = jnp.asarray([77, 150, 9], jnp.int32)
    sinks = jnp.asarray(rng.standard_normal(H), jnp.float32)
    for window, s in [(40, None), (None, sinks), (40, sinks), (16, sinks)]:
        want = paged_attention_reference(
            q, k_pool, v_pool, table, lengths, scale=dh ** -0.5,
            sliding_window_size=window, sinks=s)
        got = paged_decode_attention(
            q, k_pool, v_pool, table, lengths, scale=dh ** -0.5,
            sliding_window_size=window, sinks=s, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2,
                                   err_msg=f"window={window} sinks={s is not None}")

    # i8 pools with window + sinks
    k_i8 = jnp.asarray(
        rng.integers(-127, 128, (G, P, page, dh), dtype=np.int64), jnp.int8)
    v_i8 = jnp.asarray(
        rng.integers(-127, 128, (G, P, page, dh), dtype=np.int64), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.005, 0.03, (G, P, page)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.005, 0.03, (G, P, page)), jnp.float32)
    want = paged_attention_reference(
        q, k_i8, v_i8, table, lengths, scale=dh ** -0.5,
        sliding_window_size=40, sinks=sinks, k_scales=k_s, v_scales=v_s)
    got = paged_decode_attention(
        q, k_i8, v_i8, table, lengths, scale=dh ** -0.5,
        sliding_window_size=40, sinks=sinks, k_scales=k_s, v_scales=v_s,
        interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_paged_decode_attention_int8_matches_reference():
    """INT8-pool kernel variant (codes + per-(token, kv-head) scales folded
    into the dots) == the dequantizing gather oracle."""
    from uzu_tpu.ops.pallas.paged_attention import (
        paged_attention_reference,
        paged_decode_attention,
    )

    rng = np.random.default_rng(11)
    B, H, G, dh = 3, 8, 2, 32
    P, page, maxp = 12, 32, 5
    q = jnp.asarray(rng.standard_normal((B, H, dh)), jnp.float32)
    # codes + scales with realistic magnitudes (absmax quantization)
    k_pool = jnp.asarray(
        rng.integers(-127, 128, (G, P, page, dh), dtype=np.int64), jnp.int8)
    v_pool = jnp.asarray(
        rng.integers(-127, 128, (G, P, page, dh), dtype=np.int64), jnp.int8)
    k_s = jnp.asarray(rng.uniform(0.005, 0.03, (G, P, page)), jnp.float32)
    v_s = jnp.asarray(rng.uniform(0.005, 0.03, (G, P, page)), jnp.float32)
    table = jnp.asarray(rng.integers(0, P, (B, maxp), dtype=np.int64), jnp.int32)
    table = table.at[2].set(table[0])  # shared physical pages
    lengths = jnp.asarray([41, 150, 9], jnp.int32)
    for cap in (None, 25.0):
        want = paged_attention_reference(
            q, k_pool, v_pool, table, lengths, scale=dh ** -0.5,
            logit_soft_cap=cap, k_scales=k_s, v_scales=v_s)
        got = paged_decode_attention(
            q, k_pool, v_pool, table, lengths, scale=dh ** -0.5,
            logit_soft_cap=cap, k_scales=k_s, v_scales=v_s, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-2, atol=2e-2)

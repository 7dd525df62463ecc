"""Quantization format tests: pack/unpack, dequant parity with the
reference's dequant formula, quantization error bounds."""

import numpy as np
import jax.numpy as jnp
import pytest

from uzu_tpu.quant.format import (
    dequantize,
    from_disk_tensors,
    pack_codes,
    quantize_reference,
    unpack_codes,
)


def reference_dequant(parts, method, bits, group_size, n, k):
    """Scalar reimplementation of the reference dequant
    (cpu/kernel/matmul/kernel.rs:226-275) for cross-checking."""
    pack = 8 // bits
    out = np.zeros((n, k), np.float32)
    codes = parts["weights"]
    scales = np.asarray(parts["scales"], np.float32)
    for row in range(n):
        for col in range(k):
            byte = codes[row, col // pack]
            code = (byte >> ((col % pack) * bits)) & ((1 << bits) - 1)
            g = col // group_size
            scale = scales[row, g]
            if method == "scale_zero_point":
                zp_arr = parts["zero_points"]
                if bits == 4:
                    b = zp_arr[row, g // 2]
                    zp = (b & 0xF) if g % 2 == 0 else (b >> 4) & 0xF
                else:
                    zp = zp_arr[row, g]
                bias = -scale * float(zp)
            elif method == "scale_bias":
                bias = float(np.asarray(parts["biases"], np.float32)[row, g])
            else:
                bias = -scale * float(1 << (bits - 1))
            out[row, col] = scale * float(code) + bias
    return out


@pytest.mark.parametrize("bits", [4, 8])
def test_pack_unpack_roundtrip(bits, rng):
    codes = rng.integers(0, 1 << bits, size=(4, 64), dtype=np.uint8)
    packed = pack_codes(codes, bits)
    unpacked = np.asarray(unpack_codes(jnp.asarray(packed), bits))
    np.testing.assert_array_equal(unpacked, codes)


@pytest.mark.parametrize("bits", [4, 8])
@pytest.mark.parametrize("method", ["scale_symmetric", "scale_bias", "scale_zero_point"])
def test_dequant_matches_reference_formula(bits, method, rng):
    n, k, g = 6, 64, 32
    w = rng.standard_normal((n, k)).astype(np.float32)
    parts = quantize_reference(w, bits, g, method, dtype=np.float32)
    ref = reference_dequant(parts, method, bits, g, n, k)
    qt = from_disk_tensors(
        method,
        parts["weights"],
        parts["scales"],
        bits,
        g,
        zero_points=parts.get("zero_points"),
        biases=parts.get("biases"),
        dtype=jnp.float32,
    )
    ours = np.asarray(dequantize(qt, dtype=jnp.float32))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("bits,method,tol", [
    (8, "scale_symmetric", 0.05),
    (8, "scale_bias", 0.02),
    (4, "scale_symmetric", 0.6),
    (4, "scale_zero_point", 0.3),
])
def test_quantization_error_bounded(bits, method, tol, rng):
    n, k, g = 8, 128, 32
    w = rng.standard_normal((n, k)).astype(np.float32)
    parts = quantize_reference(w, bits, g, method, dtype=np.float32)
    qt = from_disk_tensors(
        method, parts["weights"], parts["scales"], bits, g,
        zero_points=parts.get("zero_points"), biases=parts.get("biases"), dtype=jnp.float32,
    )
    wd = np.asarray(dequantize(qt, dtype=jnp.float32))
    err = np.abs(wd - w).max()
    assert err < tol, f"max quantization error {err}"


def test_quant_matmul_matches_dequant_matmul(rng):
    from uzu_tpu.ops.linear import linear_apply

    n, k, g = 32, 128, 32
    w = rng.standard_normal((n, k)).astype(np.float32)
    x = rng.standard_normal((3, k)).astype(np.float32)
    parts = quantize_reference(w, 4, g, "scale_symmetric", dtype=np.float32)
    qt = from_disk_tensors("scale_symmetric", parts["weights"], parts["scales"], 4, g, dtype=jnp.float32)
    y_quant = np.asarray(linear_apply(qt, jnp.asarray(x)))
    wd = np.asarray(dequantize(qt, dtype=jnp.float32))
    y_ref = x @ wd.T
    np.testing.assert_allclose(y_quant, y_ref, rtol=1e-4, atol=1e-4)


def test_banned_tokens_masked(tmp_path):
    from uzu_tpu import LanguageModel, SamplingParams
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                       num_groups=1, head_dim=16, vocab_size=64)
    d = synthesize(cfg, str(tmp_path / "b"), seed=1, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=32, prefill_buckets=(4,))
    base = lm.generate_list([1, 2, 3], 8, sampling=SamplingParams(), stop_token_ids=[])
    banned = tuple(set(base))
    out = lm.generate_list([1, 2, 3], 8,
                           sampling=SamplingParams(banned_tokens=banned),
                           stop_token_ids=[])
    assert not (set(out) & set(banned))


def test_split_n_routing_matches_dequant(monkeypatch):
    """N not tile-divisible (e.g. a GDN fused in_proj, N = 128k + tail):
    the wrapper runs the Pallas kernel (interpret mode here — forced on
    via UZU_TPU_KERNELS, else use_pallas() is False on the CPU mesh and
    this test would compare the fallback against itself) on the
    128-multiple row prefix and the XLA fallback on the tail — result
    matches the full dequant matmul (r5; previously the whole matrix
    fell back)."""
    import numpy as np
    import jax.numpy as jnp

    from uzu_tpu.ops.linear import quant_matmul
    from uzu_tpu.quant.format import dequantize, from_disk_tensors, quantize_reference

    monkeypatch.setenv("UZU_TPU_KERNELS", "pallas")
    rng = np.random.default_rng(3)
    n, k = 272, 512  # 256 kernel rows + 16 fallback rows
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    pack = quantize_reference(w, 4, 32, "scale_symmetric")
    qt = from_disk_tensors("scale_symmetric", pack["weights"], pack["scales"], 4, 32)
    x = jnp.asarray(rng.standard_normal((2, k)).astype(np.float32))
    got = np.asarray(quant_matmul(qt, x))
    want = np.asarray(x) @ np.asarray(dequantize(qt, dtype=jnp.float32)).T
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    # asymmetric weights carry a qbias TENSOR — _rows must slice it too
    pack_a = quantize_reference(w, 4, 32, "scale_bias")
    qt_a = from_disk_tensors("scale_bias", pack_a["weights"],
                             pack_a["scales"], 4, 32,
                             biases=pack_a["biases"])
    assert qt_a.qbias is not None
    got_a = np.asarray(quant_matmul(qt_a, x))
    want_a = np.asarray(x) @ np.asarray(dequantize(qt_a, dtype=jnp.float32)).T
    np.testing.assert_allclose(got_a, want_a, rtol=2e-4, atol=2e-4)

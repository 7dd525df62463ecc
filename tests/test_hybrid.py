"""HybridSpec (RHT incoherence + QLoRA adapter) tests.

Reference: encodable_block/linear/{rht_wrapper,qlora_wrapper}.rs and the
activation_transform CPU kernel. The decisive check: incoherence transforms
must COMPOSE to identity — a hybrid linear whose base stores the
transformed weights must reproduce the ORIGINAL W @ x up to quantization
error (the synthesizer quantizes in the transformed domain exactly like the
exporter).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.config.model import (
    HybridSpec,
    IncoherenceProcessingMode,
    IntSpec,
    Layout,
    LowRankSpec,
)
from uzu_tpu.ops.linear import linear_apply
from uzu_tpu.ops.rht import input_rht, output_rht, transform_weight_for_storage
from uzu_tpu.tools.synth import llama_config, synthesize


def test_rht_roundtrip(rng):
    """output_rht(H-domain) inverts input_rht's effect on a matmul."""
    k, n = 64, 96
    x = rng.standard_normal((3, k), dtype=np.float32)
    w = rng.standard_normal((n, k), dtype=np.float32)
    si = rng.choice([-1, 1], k).astype(np.int32)
    so = rng.choice([-1, 1], n).astype(np.int32)
    w_stored = transform_weight_for_storage(w, si, so)
    xb = input_rht(jnp.asarray(x), jnp.asarray(si, jnp.float32))
    y = np.asarray(xb) @ w_stored.T
    y = np.asarray(output_rht(jnp.asarray(y), jnp.asarray(so, jnp.float32)))
    np.testing.assert_allclose(y, x @ w.T, rtol=1e-4, atol=1e-4)


def _hybrid_spec(adapter_rank=None, incoherence=True):
    return HybridSpec(
        quantization_spec=IntSpec(bits=4, group_size=32, is_symmetric=True,
                                  layout=Layout.OUTPUT_INPUT),
        adapter_spec=LowRankSpec(rank=adapter_rank) if adapter_rank else None,
        incoherence_block_size=32 if incoherence else None,
        incoherence_processing_mode=IncoherenceProcessingMode.INPUT_OUTPUT,
    )


@pytest.mark.parametrize("rank,incoherence", [(None, True), (4, True), (4, False)])
def test_hybrid_model_loads_and_is_accurate(tmp_path, rng, rank, incoherence):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    spec = _hybrid_spec(adapter_rank=rank, incoherence=incoherence)
    d = synthesize(cfg, str(tmp_path / "hybrid"), seed=5, linear_spec=spec, dtype=np.float32)
    lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(16,))
    toks = (np.arange(9) * 5) % 256
    logits, _ = lm.prefill(lm.new_state(), toks)
    assert np.isfinite(np.asarray(logits)).all()
    out = lm.generate_list(toks, 6, stop_token_ids=[])
    assert len(out) == 6


def test_hybrid_matches_reference_formula(tmp_path, rng):
    """hybrid_apply == output_rht(base @ input_rht(x) + adapter path)."""
    from uzu_tpu.models.loader import load_linear
    from uzu_tpu.params.tree import ParameterLoader
    from uzu_tpu.quant.format import dequantize
    from uzu_tpu.tools.synth import ModelBuilder

    spec = _hybrid_spec(adapter_rank=4)
    b = ModelBuilder(seed=7, dtype=np.float32)
    b.linear("lin", 64, 96, spec, False)
    b.tensors["dummy"] = np.zeros(1, np.float32)
    from uzu_tpu.params.safetensors_io import save_file

    path = str(tmp_path / "t.safetensors")
    save_file(path, b.tensors, b.metadata)
    tree = ParameterLoader(path).tree()
    p = load_linear(tree.subtree("lin"), 64, 96, False)
    h = p["w"]
    assert h.adapter_down is not None and h.input_signs is not None

    x = jnp.asarray(rng.standard_normal((3, 64), dtype=np.float32))
    got = np.asarray(linear_apply(h, x))
    xb = input_rht(x, h.input_signs)
    want = np.asarray(xb) @ np.asarray(dequantize(h.base, jnp.float32)).T
    want = want + (np.asarray(x) @ np.asarray(h.adapter_down).T) @ np.asarray(h.adapter_up).T
    want = np.asarray(output_rht(jnp.asarray(want, jnp.float32), h.output_signs))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)

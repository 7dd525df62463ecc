"""Quality tooling tests: NLL harness + activation traces.

The NLL harness is validated against a direct full-sequence computation;
the trace pipeline against itself (save/load/compare) and across the
kv-quant switch (INT8 KV must stay within a small trace delta — the
measurable form of the reference's trace-based quantization validation).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.models.decoder import decoder_forward
from uzu_tpu.tools.quality import (
    capture_trace,
    compare_traces,
    load_trace,
    save_trace,
    sequence_nll,
)
from uzu_tpu.tools.synth import llama_config, synthesize


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    cfg = llama_config(num_layers=2, model_dim=64, hidden_dim=160, num_heads=4,
                       num_groups=2, head_dim=16, vocab_size=256)
    return synthesize(cfg, str(tmp_path_factory.mktemp("q_model")), seed=3, dtype=np.float32)


@pytest.fixture(scope="module")
def lm(model_dir):
    return LanguageModel.from_dir(model_dir, max_context=64, prefill_buckets=(8,))


def test_nll_matches_direct(lm):
    toks = (np.arange(20) * 7) % 256
    got = sequence_nll(lm, toks, chunk=8)  # ragged chunks: 8, 8, 3

    # direct: single full-length forward
    state = lm.new_state()
    logits, _ = decoder_forward(
        lm.decoder_config, lm.params, jnp.asarray(toks[:-1], jnp.int32), state,
        last_only=False,
    )
    logp = jax.nn.log_softmax(np.asarray(logits, np.float32), axis=-1)
    want = -np.mean([logp[i, toks[i + 1]] for i in range(len(toks) - 1)])
    assert got["count"] == len(toks) - 1
    np.testing.assert_allclose(got["nll"], want, rtol=1e-4, atol=1e-5)
    assert got["ppl"] == pytest.approx(float(np.exp(want)), rel=1e-4)


def test_trace_roundtrip_and_compare(lm, tmp_path):
    toks = (np.arange(10) * 3) % 256
    trace = capture_trace(lm, toks)
    assert "embedding" in trace and "layers.0" in trace and "logits" in trace
    path = str(tmp_path / "trace.safetensors")
    save_trace(path, trace)
    loaded = load_trace(path)
    report = compare_traces(trace, loaded)
    assert all(v["ok"] for k, v in report.items() if k != "__missing__")
    assert report["__missing__"] == []


def test_kv_quant_trace_delta(model_dir):
    """INT8 KV stays within a small per-layer activation delta of fp."""
    toks = (np.arange(16) * 5) % 256
    lm_fp = LanguageModel.from_dir(model_dir, max_context=64)
    lm_q = LanguageModel.from_dir(model_dir, max_context=64, kv_quant=True)
    t_fp = capture_trace(lm_fp, toks)
    t_q = capture_trace(lm_q, toks)
    report = compare_traces(t_q, t_fp, rtol=0.15, atol=0.05)
    bad = {k: v for k, v in report.items() if k != "__missing__" and not v["ok"]}
    assert not bad, bad


def test_nll_kv_quant_close(model_dir):
    toks = (np.arange(30) * 11) % 256
    base = sequence_nll(LanguageModel.from_dir(model_dir, max_context=64), toks)
    quant = sequence_nll(
        LanguageModel.from_dir(model_dir, max_context=64, kv_quant=True), toks
    )
    assert abs(quant["nll"] - base["nll"]) < 0.05


def test_telemetry_meter():
    """Host/device telemetry (keisoku parity): sampling + per-interval
    meter readings are sane."""
    import jax.numpy as jnp

    from uzu_tpu.tools.telemetry import ResourceMeter, sample

    s = sample()
    assert s.host.rss_bytes > 0
    assert s.host.peak_rss_bytes >= s.host.rss_bytes // 2
    assert s.cpu_seconds > 0

    m = ResourceMeter()
    m.start()
    keep = [jnp.ones((256, 256)) for _ in range(4)]
    r = m.stop()
    assert r.duration_s > 0
    assert r.cpu_seconds >= 0
    assert r.peak_rss_bytes > 0
    assert keep  # buffers alive across the meter window


def test_logs_and_event_journal(tmp_path):
    """File logging + local event journal (logs::start / telemetry parity)."""
    import json as _json
    import logging

    from uzu_tpu.tools import logs

    path = logs.start(str(tmp_path / "logs"))
    logs.logger("uzu_tpu.test").info("hello log")
    logs.event("reply_finished", tokens=42, model="m")
    for h in logging.getLogger("uzu_tpu").handlers:
        h.flush()
    assert "hello log" in open(path).read()
    events = [_json.loads(l) for l in open(str(tmp_path / "logs" / "events.jsonl"))]
    assert events[0]["event"] == "reply_finished" and events[0]["tokens"] == 42


def test_profile_capture_one_shot(tmp_path, monkeypatch):
    """UZU_TPU_PROFILE arms a one-shot jax.profiler capture of the first
    prefill/decode dispatch (ref capture.rs UZU_CAPTURE_FIRST_*)."""
    import os

    import numpy as np

    from uzu_tpu import LanguageModel
    from uzu_tpu.tools import profile as prof
    from uzu_tpu.tools.synth import llama_config, synthesize

    monkeypatch.setenv("UZU_TPU_PROFILE", "prefill,decode")
    monkeypatch.setenv("UZU_TPU_PROFILE_DIR", str(tmp_path / "traces"))
    prof.reset()
    try:
        cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64,
                           num_heads=2, num_groups=1, head_dim=16,
                           vocab_size=64)
        d = synthesize(cfg, str(tmp_path / "m"), seed=0, dtype=np.float32)
        lm = LanguageModel.from_dir(d, max_context=64, prefill_buckets=(8,))
        lm.generate_list(np.asarray([1, 2, 3]), 4, stop_token_ids=[])
        entries = os.listdir(str(tmp_path / "traces"))
        assert any(e.startswith("prefill_") for e in entries), entries
        assert any(e.startswith("decode_") for e in entries), entries
        # one-shot: a second run must not add captures
        before = len(entries)
        lm.generate_list(np.asarray([1, 2, 3]), 4, stop_token_ids=[])
        assert len(os.listdir(str(tmp_path / "traces"))) == before
    finally:
        prof.reset()

"""Quality measurement: teacher-forced NLL/perplexity + activation traces.

Reference counterparts:
- perplexity: BASELINE target "perplexity delta vs FP16 at INT4" — the
  reference validates quantization against a source-of-truth implementation
  via activation traces; a teacher-forced NLL harness is the measurable
  equivalent.
- traces: models ship traces.safetensors with per-layer activations for
  offline correctness comparison (uzu/src/storage/download_contents.rs:5-33);
  here `capture_trace` dumps per-layer hidden states for the same purpose
  and `compare_traces` diffs two runs (the tools/model_compare role).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..models.decoder import (
    decoder_forward,
    embedding_lookup,
    embedding_readout,
    layer_forward,
)
from ..ops.norm import normalize


def sequence_nll(lm, tokens, chunk: int = 256) -> dict:
    """Teacher-forced negative log-likelihood of `tokens` under the model.

    Returns {"nll": mean nats/token, "ppl": perplexity, "count": N}.
    """
    tokens = np.asarray(tokens, np.int32)
    assert tokens.ndim == 1 and len(tokens) >= 2
    if len(tokens) > lm.max_context:
        raise ValueError(
            f"sequence of {len(tokens)} tokens exceeds max_context={lm.max_context}"
        )
    chunk = min(chunk, lm.max_context)
    cfg = lm.decoder_config

    @jax.jit
    def chunk_nll(params, state, chunk_tokens, targets, n_real):
        logits, state = decoder_forward(
            cfg, params, chunk_tokens, state, last_only=False, true_length=n_real
        )
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        picked = jnp.take_along_axis(logp, targets[:, None], axis=-1)[:, 0]
        mask = jnp.arange(chunk_tokens.shape[0]) < n_real
        return -jnp.sum(jnp.where(mask, picked, 0.0)), state

    state = lm.new_state()
    total, count = 0.0, 0
    i = 0
    while i < len(tokens) - 1:
        take = min(chunk, len(tokens) - 1 - i)
        padded = np.zeros(chunk, np.int32)
        padded[:take] = tokens[i : i + take]
        targets = np.zeros(chunk, np.int32)
        targets[:take] = tokens[i + 1 : i + 1 + take]
        nll, state = chunk_nll(
            lm.params, state, jnp.asarray(padded), jnp.asarray(targets),
            jnp.asarray(take, jnp.int32),
        )
        total += float(nll)
        count += take
        i += take
    nll = total / count
    return {"nll": nll, "ppl": float(np.exp(nll)), "count": count}


def capture_trace(lm, tokens) -> dict[str, np.ndarray]:
    """Per-layer activation dump for a single forward pass (the reference's
    traces.safetensors content): embedding output + each layer's hidden."""
    cfg = lm.decoder_config
    tcfg = cfg.transformer_config
    tokens = jnp.asarray(np.asarray(tokens, np.int32))
    state = lm.new_state()
    positions = jnp.arange(tokens.shape[0], dtype=jnp.int32)

    out: dict[str, np.ndarray] = {}
    table = lm.params["embedding"].get("tied", lm.params["embedding"].get("input"))
    x = embedding_lookup(table, tokens)
    if cfg.embedding_config.input_scale is not None:
        x = (x.astype(jnp.float32) * cfg.embedding_config.input_scale).astype(x.dtype)
    out["embedding"] = np.asarray(x, np.float32)

    per_layer = None
    if cfg.ple_model_config is not None:
        from ..models.ple import ple_inputs

        per_layer = ple_inputs(
            cfg.ple_model_config, lm.params["per_layer_embedding"], tokens, x
        )

    states = []
    for i, lc in enumerate(tcfg.layer_configs):
        src = lc.kv_source_layer_index
        shared = states[src] if src is not None else None
        x, new_state = layer_forward(
            lc, lm.params["layers"][i], x, positions, state["layers"][i], shared,
            tokens.shape[0],
            per_layer[:, i] if per_layer is not None else None,
        )
        states.append(new_state)
        out[f"layers.{i}"] = np.asarray(x, np.float32)

    x = normalize(
        x, tcfg.output_norm_config, lm.params["output_norm"]["scales"],
        lm.params["output_norm"].get("biases"),
    )
    out["output_norm"] = np.asarray(x, np.float32)
    out_table = lm.params["embedding"].get("tied", lm.params["embedding"].get("output"))
    out["logits"] = np.asarray(
        embedding_readout(out_table, x, cfg.embedding_config.logit_soft_cap), np.float32
    )
    return out


def save_trace(path: str, trace: dict[str, np.ndarray]) -> None:
    from ..params.safetensors_io import save_file

    save_file(path, trace)


def load_trace(path: str) -> dict[str, np.ndarray]:
    from ..params.safetensors_io import SafetensorsFile

    f = SafetensorsFile(path)
    return {k: f.read(k) for k in f.keys()}


def compare_traces(a: dict, b: dict, rtol=1e-3, atol=1e-3) -> dict[str, dict]:
    """Per-tensor max abs/rel error report (tools/model_compare role)."""
    report = {}
    for key in sorted(set(a) & set(b)):
        x, y = np.asarray(a[key], np.float32), np.asarray(b[key], np.float32)
        if x.shape != y.shape:
            report[key] = {"shape_mismatch": (x.shape, y.shape), "ok": False}
            continue
        abs_err = float(np.max(np.abs(x - y))) if x.size else 0.0
        denom = np.maximum(np.abs(y), 1e-6)
        rel_err = float(np.max(np.abs(x - y) / denom)) if x.size else 0.0
        report[key] = {
            "max_abs_err": abs_err,
            "max_rel_err": rel_err,
            "ok": bool(np.allclose(x, y, rtol=rtol, atol=atol)),
        }
    report["__missing__"] = sorted(set(a) ^ set(b))
    return report

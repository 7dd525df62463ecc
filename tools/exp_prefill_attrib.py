"""On-chip PREFILL-chunk floor attribution for the 1B flagship.

The r3 prefill_breakdown measured the 512-token chunk at 13.47 ms with the
four quantized matmuls summing to 8.94 ms — a 4.5 ms (34%) residual
outside the matmuls. This probe attributes that residual by ablation,
exactly like tools/exp_moe_attrib.py does for the MoE decode step: each
variant monkeypatches ONE component to an identity/constant BEFORE the jit
trace, so the prefill executable compiles without it, and full-minus-
variant is that component's in-context cost (fusion and overlap effects
included — the honest number, unlike isolated micro-probes).

Variants:
  attn_identity  attention_forward -> passthrough   scores/AV einsums + KV append
  norm_identity  decoder._norm -> x                 all RMS norms (VPU + HBM traffic)
  rope_identity  decoder.apply_rope -> q            rotary tables + elementwise
  embed_const    embedding_lookup -> zeros          quantized-table gather
  readout_zero   embedding_readout -> zeros         end-of-chunk logits GEMV

Timing: differential between a 1-chunk and a 3-chunk prefill (one
device_get each; launch + tunnel roundtrip cancel pair-wise), median of 5
diffs -> ms per marginal 512-token chunk.

    python tools/exp_prefill_attrib.py [model_dir]
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK = int(os.environ.get("UZU_EXP_CHUNK", "512"))


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def chunk_ms(lm) -> float:
    import jax

    p1 = (np.arange(CHUNK) * 13) % 128
    p3 = (np.arange(3 * CHUNK) * 13) % 128

    def run(p):
        state = lm.new_state()
        logits, _ = lm.prefill(state, p)
        jax.device_get(logits[:1])

    run(p1)
    run(p3)
    diffs = [_timeit(lambda: run(p3)) - _timeit(lambda: run(p1))
             for _ in range(5)]
    return max(float(np.median(diffs)) / 2, 1e-9) * 1e3


def _patches(variant: str, cfg):
    import jax.numpy as jnp

    import uzu_tpu.models.decoder as dec

    if variant == "full":
        return []
    if variant == "attn_identity":
        def ident_attn(mixer_cfg, layer_cfg, params, h, positions, kv, owns,
                       true_length=None, tree=None, seq_axis=None,
                       ctx_limit=None):
            return h, kv

        return [(dec, "attention_forward", ident_attn)]
    if variant == "norm_identity":
        return [(dec, "_norm", lambda key, cfg_, params, x: x)]
    if variant == "rope_identity":
        return [(dec, "apply_rope", lambda q, cos, sin: q)]
    if variant == "embed_const":
        def const_embed(table, tokens, dtype=None):
            return jnp.zeros(tokens.shape + (cfg.transformer_config.model_dim,),
                             dtype or jnp.float32)

        return [(dec, "embedding_lookup", const_embed)]
    if variant == "readout_zero":
        def zero_readout(table, x, soft_cap=None):
            return jnp.zeros((x.shape[0], cfg.vocab_size), jnp.float32)

        return [(dec, "embedding_readout", zero_readout)]
    raise ValueError(variant)


def main() -> None:
    from uzu_tpu import LanguageModel

    mdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".bench_cache", "llama1b_int4")
    results = {}
    variants = ["full", "attn_identity", "norm_identity", "rope_identity",
                "embed_const", "readout_zero"]
    for variant in variants:
        lm = LanguageModel.from_dir(mdir, max_context=4 * CHUNK,
                                    prefill_buckets=(CHUNK,))
        cfg = lm.decoder_config
        saved = []
        try:
            for mod, attr, repl in _patches(variant, cfg):
                saved.append((mod, attr, getattr(mod, attr)))
                setattr(mod, attr, repl)
            ms = chunk_ms(lm)
        finally:
            for mod, attr, orig in saved:
                setattr(mod, attr, orig)
        results[variant] = ms
        out = {"variant": variant, "chunk_ms": round(ms, 4)}
        if variant != "full":
            out["component_ms"] = round(results["full"] - ms, 4)
        print(json.dumps(out), flush=True)

    full = results["full"]
    attrib = {v: round(full - results[v], 4) for v in variants if v != "full"}
    explained = sum(max(d, 0.0) for d in attrib.values())
    print(json.dumps({
        "full_ms": round(full, 4),
        "attributed_ms": attrib,
        "matmul_residual_note": "matmul_sum from prefill_breakdown r3: 8.94 ms",
        "unexplained_ms": round(full - explained, 4),
        "tok_s_at_full": round(CHUNK / full * 1e3, 1),
    }), flush=True)


if __name__ == "__main__":
    main()

"""Sustained-prefill attribution at the bench shape (VERDICT r4 #3).

The online-softmax dispatch won 10.79 vs 14.78 ms per 512-chunk in the
C<=2048 A/B, yet the driver's sustained number (3584 tokens, 7 chunks,
ctx 0->3.5k) reads 19.7-20.8 ms per chunk. This probe attributes the
sustained shape itself:

  1. per-chunk MARGINAL cost curve: T(k+1 chunks) - T(k chunks) for
     k=1..6 — how cost grows with context (executable per ctx bucket);
  2. the same curve with attention ablated (attn_identity monkeypatch):
     the non-attention floor per chunk and attention's in-context cost
     at each ctx window;
  3. rooflines per chunk: weight-matmul FLOPs at bf16 peak, attention
     FLOPs, and KV bytes at the practical HBM rate — is the attention
     remainder irreducible bytes/FLOPs or dispatch glue?

    python tools/exp_prefill_sustained.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK = 512
NCHUNKS = 7


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def curve(lm) -> list:
    """Marginal per-chunk ms at each chunk index (differential pairs)."""
    import jax

    def run(nc):
        p = (np.arange(nc * CHUNK) * 13) % 128
        state = lm.new_state()
        logits, _ = lm.prefill(state, p)
        jax.device_get(logits[:1])

    for nc in range(1, NCHUNKS + 1):  # compile/warm every ctx bucket
        run(nc)
    out = []
    for nc in range(1, NCHUNKS):
        diffs = [_timeit(lambda: run(nc + 1)) - _timeit(lambda: run(nc))
                 for _ in range(5)]
        out.append(round(max(float(np.median(diffs)), 1e-9) * 1e3, 3))
    return out


def main() -> None:
    import jax

    from uzu_tpu import LanguageModel
    import uzu_tpu.models.decoder as dec

    mdir = os.path.join(REPO, ".bench_cache", "llama1b_int4")
    lm = LanguageModel.from_dir(mdir, max_context=8192,
                                prefill_buckets=(32, CHUNK))
    cfg = lm.decoder_config

    full = curve(lm)
    print(json.dumps({"arm": "full", "marginal_chunk_ms": full}), flush=True)

    # attention ablated (fresh model object, same executable cache keying
    # is per-patch-trace: patch BEFORE any jit of these buckets)
    lm2 = LanguageModel.from_dir(mdir, max_context=8192,
                                 prefill_buckets=(32, CHUNK))

    def ident_attn(mixer_cfg, layer_cfg, params, h, positions, kv, owns,
                   true_length=None, tree=None, seq_axis=None,
                   ctx_limit=None):
        return h, kv

    saved = dec.attention_forward
    try:
        dec.attention_forward = ident_attn
        noattn = curve(lm2)
    finally:
        dec.attention_forward = saved
    print(json.dumps({"arm": "attn_identity", "marginal_chunk_ms": noattn}),
          flush=True)

    # rooflines per chunk index (chunk i covers positions [i*512,(i+1)*512))
    import bench

    kind, bw = bench.device_bandwidth()
    peak = bench.device_peak_bf16(kind)
    tc = cfg.transformer_config
    d = tc.model_dim
    n_layers = len(tc.layer_configs)
    mc = tc.layer_configs[0].mixer_config
    h_, g_, dh = mc.num_heads, mc.num_groups, mc.head_dim
    w_flops_tok = bench.flops_per_token(cfg, avg_ctx=0)  # matmuls only
    rows = []
    for i in range(1, NCHUNKS):
        avg_ctx = (i + 0.5) * CHUNK
        attn_flops = 4.0 * avg_ctx * h_ * dh * CHUNK * n_layers
        kv_bytes = 2 * avg_ctx * g_ * dh * 2 * n_layers * 2  # K+V bf16 read
        rows.append({
            "chunk_idx": i, "ctx": int((i + 1) * CHUNK),
            "marginal_ms": full[i - 1],
            "attn_ms_measured": round(full[i - 1] - noattn[i - 1], 3),
            "wmatmul_ms_at_peak": round(w_flops_tok * CHUNK / peak * 1e3, 3),
            "attn_ms_at_peak": round(attn_flops / peak * 1e3, 3),
            "kv_read_ms_at_150gbs": round(kv_bytes / 150e9 * 1e3, 3),
        })
    mfu = [round(w_flops_tok * CHUNK / (t * 1e-3) / peak, 3) for t in full]
    print(json.dumps({"rooflines": rows, "mfu_per_chunk": mfu}), flush=True)


if __name__ == "__main__":
    main()

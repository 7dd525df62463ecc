"""Qwen3.5-0.8B-class bench (BASELINE.md targets row 1).

The BASELINE north-star names "Decode tok/s/chip, Qwen3.5-0.8B INT4" —
a HYBRID model (Gated DeltaNet mixers with periodic GQA attention,
tools/synth.qwen35_config), so its decode step streams weights plus the
recurrent state instead of a growing KV cache. Synthesized at 0.8B-class
dims with seeded random weights, INT4 g32 symmetric linears, cached under
.bench_cache/qwen08_int4.

SoL accounting: bytes touched per step = weight bytes + decode-state
bytes (the GDN [H, dh, vdh] state + conv tails + the few attention
layers' KV at mid-context — NOT the state-pytree capacity).

    python -m uzu_tpu.tools.bench_qwen08 /root/repo
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

# 0.8B-class hybrid: 24 layers (attention every 4th), D=1280, ff=4608,
# GDN H=8/G=4 dh=128 vdh=128, vocab 128k tied (~0.75B params)
DIMS = dict(
    num_layers=24, model_dim=1280, hidden_dim=4608, vocab_size=128256,
    num_heads=8, num_groups=4, head_dim=128, value_head_dim=128,
    kernel_size=4, attn_every=4,
)


def model_dir(repo: str) -> str:
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.tools.synth import qwen35_config, synthesize

    out = os.path.join(repo, ".bench_cache", "qwen08_int4")
    if not os.path.exists(os.path.join(out, "model.safetensors")):
        spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                       layout=Layout.OUTPUT_INPUT)
        synthesize(qwen35_config(**DIMS), out, seed=2, linear_spec=spec,
                   embedding_spec=spec, fill="fast")
    return out


def bench_qwen08(repo: str, stage=None, *, gen_len: int = 64) -> dict:
    import jax

    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.sampling import SamplingParams

    stage = stage or (lambda s: None)
    out: dict = {}

    stage("qwen08: synth/load")
    mdir = model_dir(repo)
    t0 = time.perf_counter()
    lm = LanguageModel.from_dir(mdir, max_context=4096,
                                prefill_buckets=(32, 512))
    out["load_s"] = round(time.perf_counter() - t0, 2)
    wbytes = sum(x.nbytes for x in jax.tree.leaves(lm.params))
    out["weight_bytes"] = wbytes

    prompt_len = 128
    gen_mid = gen_len // 2
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, lm.decoder_config.vocab_size, prompt_len)
    sampling = SamplingParams()

    # per-step STREAMED state, not state-pytree capacity (new_state()
    # allocates attention KV at full max_context; a decode step reads
    # only ~mid-context rows — the bench8b convention): recurrent leaves
    # (GDN [H, dh, vdh] states + conv tails — fully read+written each
    # step) + attention KV at mid-context.
    from uzu_tpu.config.model import AttentionConfig

    attn_cfgs = [lc.mixer_config
                 for lc in lm.decoder_config.transformer_config.layer_configs
                 if isinstance(lc.mixer_config, AttentionConfig)]
    kv_cap_bytes = sum(2 * lm.max_context * mc.num_groups * mc.head_dim * 2
                       for mc in attn_cfgs)
    mid_ctx = prompt_len + gen_mid
    kv_mid_bytes = sum(2 * mid_ctx * mc.num_groups * mc.head_dim * 2
                       for mc in attn_cfgs)
    total_state = sum(x.nbytes for x in jax.tree.leaves(lm.new_state()))
    state_bytes = total_state - kv_cap_bytes + kv_mid_bytes
    out["state_bytes"] = state_bytes

    from bench import probe_interleaved_decode  # repo-root module

    stage("qwen08: warmup (compiles)")
    list(lm.generate(prompt, gen_len, sampling=sampling, stop_token_ids=[]))
    stage("qwen08: decode x2 (probe-interleaved)")
    out.update(probe_interleaved_decode(lm, prompt, gen_len, sampling,
                                        wbytes + state_bytes))

    stage("qwen08: prefill")
    sustain = 2048
    lp = rng.integers(0, lm.decoder_config.vocab_size, sustain)
    for _ in range(2):
        st = lm.new_state()
        t0 = time.perf_counter()
        logits, st = lm.prefill(st, lp)
        jax.device_get(logits[:1])
        out["prefill_tok_s"] = round(sustain / (time.perf_counter() - t0), 2)
    return out


def main() -> None:
    import sys

    repo = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, repo)

    def stage(s):
        print(f"[qwen08] {s}", file=sys.stderr, flush=True)

    res = bench_qwen08(repo, stage)
    print(json.dumps({"metric": "qwen08_decode_tok_s", **res}))


if __name__ == "__main__":
    main()

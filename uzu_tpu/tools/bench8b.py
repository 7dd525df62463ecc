"""8B-class flagship bench (BASELINE.md config[1]: Llama-3.1-8B INT4).

INT4 group-32 symmetric 8B weights are ~4.6 GB — they fit a single v5e's
16 GB HBM with room for KV pools. This is the config that actually stresses
HBM streaming (the 1B flagship's 0.7 GB leaves most of the bandwidth story
untested). Synthesized with seeded random weights (the reference's
load_language_model_random strategy, crates/backend-uzu loader tests) and
cached under .bench_cache/llama8b_int4.

Called from bench.py when budget remains, and runnable standalone:
    python -m uzu_tpu.tools.bench8b
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

DIMS = dict(
    num_layers=32, model_dim=4096, hidden_dim=14336, num_heads=32,
    num_groups=8, head_dim=128, vocab_size=128256, max_seq=8192,
    rope_base=500000.0, llama3_rope_scaling=True, tied=False,
)


def model_dir(repo: str) -> str:
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.tools.synth import llama_config, synthesize

    out = os.path.join(repo, ".bench_cache", "llama8b_int4")
    if not os.path.exists(os.path.join(out, "model.safetensors")):
        spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                       layout=Layout.OUTPUT_INPUT)
        synthesize(llama_config(**DIMS), out, seed=1, linear_spec=spec,
                   embedding_spec=spec, fill="fast")
    return out


def bench_8b(repo: str, stage=None, *, gen_len: int = 64,
             paged: bool = False, remaining=None) -> dict:
    """Measure 8B single-stream decode (+optionally paged B=8) and return a
    result dict. `stage` is a progress-marker callback; `remaining` returns
    seconds of budget left (optional stages self-gate on it)."""
    import jax

    from uzu_tpu import LanguageModel
    from uzu_tpu.config.model import AttentionConfig
    from uzu_tpu.engine.sampling import SamplingParams

    stage = stage or (lambda s: None)
    out: dict = {}

    stage("8b: synth/load")
    mdir = model_dir(repo)
    t0 = time.perf_counter()
    lm = LanguageModel.from_dir(mdir, max_context=1024, prefill_buckets=(32, 512))
    out["load_s"] = round(time.perf_counter() - t0, 2)

    wbytes = sum(x.nbytes for x in jax.tree.leaves(lm.params))
    out["weight_bytes"] = wbytes

    prompt_len = 128
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, lm.decoder_config.vocab_size, prompt_len)
    sampling = SamplingParams()

    # same SoL accounting as the 1B headline: bytes touched per step
    kv_dtype_bytes = 2
    mid_ctx = prompt_len + gen_len // 2
    kv_bytes = sum(
        2 * mid_ctx * lc.mixer_config.num_groups * lc.mixer_config.head_dim
        * kv_dtype_bytes
        for lc in lm.decoder_config.transformer_config.layer_configs
        if isinstance(lc.mixer_config, AttentionConfig)
    )
    from bench import probe_interleaved_decode  # repo-root module

    stage("8b: warmup (compiles)")
    list(lm.generate(prompt, gen_len, sampling=sampling, stop_token_ids=[]))
    stage("8b: decode x2 (probe-interleaved)")
    out.update(probe_interleaved_decode(lm, prompt, gen_len, sampling,
                                        wbytes + kv_bytes))

    if paged and (remaining is None or remaining() > 420):
        stage("8b: paged B=8 (compiles)")
        from uzu_tpu.engine.paged_batch import PagedBatchEngine

        def paged_run(nreq, gen_b):
            eng = PagedBatchEngine(
                lm, batch_size=8, decode_chunk=16, num_pages=128,
                page_size=64, sampling=sampling, stop_token_ids=[])
            reqs = [
                eng.submit(rng.integers(0, lm.decoder_config.vocab_size, 32),
                           gen_b)
                for _ in range(nreq)
            ]
            tb = time.perf_counter()
            eng.run()
            return sum(len(r.tokens) for r in reqs) / (time.perf_counter() - tb)

        paged_run(8, 16)  # warm/compile
        stage("8b: paged B=8 measure")
        out["paged8_tok_s"] = round(max(paged_run(16, 48) for _ in range(2)), 2)

    return out


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import sys

    sys.path.insert(0, repo)

    def stage(s):
        print(f"[bench8b] {s}", file=sys.stderr, flush=True)

    res = bench_8b(repo, stage, paged="--paged" in sys.argv)
    print(json.dumps({"metric": "llama8b_decode_tok_s", **res}))


if __name__ == "__main__":
    main()

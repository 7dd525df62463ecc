"""Quality + speculation evidence on the REAL-statistics in-repo model
(VERDICT r4 #5 closure measurement).

Requires the trained artifacts from

    python -m uzu_tpu.tools.train_tiny .bench_cache/tiny_real --steps 1500

Measures, on the trained ~18M byte-level model:

  1. Held-out perplexity of the bf16 arm vs the INT4 g32 symmetric arm
     quantized from the SAME trained weights — the BASELINE "INT4 ppl
     delta vs FP16" target, finally on a model where ppl means something.
  2. Self-speculation (truncated self-draft, draft_layers=4, k=4):
     measured acceptance and decode tok/s vs the plain loop — interleaved
     A/B in one window.
  3. Ngram speculation acceptance on the same prompts (chain drafts).

    python tools/exp_real_stats.py [--prefix .bench_cache/tiny_real]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def ppl(lm, n_seqs=16, seq=511) -> float:
    # eval at the TRAINED context (seq 512): positions past the training
    # length extrapolate badly (1.57 vs 0.29 nats at 1024 vs 256, r5)
    from uzu_tpu.tools.corpus import generate_tokens
    from uzu_tpu.tools.quality import sequence_nll

    ev = generate_tokens(n_seqs * (seq + 1), seed=12345)  # held-out seed
    nlls, count = 0.0, 0
    for i in range(n_seqs):
        r = sequence_nll(lm, ev[i * (seq + 1): (i + 1) * (seq + 1)])
        nlls += r["nll"] * r["count"]
        count += r["count"]
    return nlls / count


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--prefix", default=".bench_cache/tiny_real")
    ap.add_argument("--gen", type=int, default=256)
    args = ap.parse_args()

    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.engine import StreamMetrics
    from uzu_tpu.engine.speculation import (
        NgramSpeculator,
        SpeculationMetrics,
        SpeculativeDecoder,
        self_speculative_decoder,
    )
    from uzu_tpu.tools.corpus import heldout_prompts

    out = {}
    lm4 = LanguageModel.from_dir(args.prefix + "_int4", max_context=1024,
                                 prefill_buckets=(32, 256))
    lmf = LanguageModel.from_dir(args.prefix + "_bf16", max_context=1024,
                                 prefill_buckets=(32, 256))
    nll_f, nll_4 = ppl(lmf), ppl(lm4)
    out["nll_bf16"] = round(nll_f, 4)
    out["nll_int4"] = round(nll_4, 4)
    out["ppl_bf16"] = round(float(np.exp(nll_f)), 3)
    out["ppl_int4"] = round(float(np.exp(nll_4)), 3)
    out["ppl_delta_pct"] = round(
        100 * (float(np.exp(nll_4)) / float(np.exp(nll_f)) - 1), 2)
    print(json.dumps({"stage": "ppl", **out}), flush=True)

    # speculation on the INT4 arm (the serving configuration)
    lm = lm4
    prompts = heldout_prompts(k=4, length=64)
    spec = self_speculative_decoder(lm, k=4)

    # warm both loops
    list(lm.generate(np.asarray(prompts[0]), 32, stop_token_ids=[]))
    list(spec.generate(prompts[0], 32, stop_token_ids=[],
                       metrics=SpeculationMetrics()))

    plain_rates, spec_rates, accepts, prefixes = [], [], [], []
    for p in prompts:
        m = StreamMetrics()
        t0 = time.perf_counter()
        toks = list(lm.generate(np.asarray(p), args.gen, stop_token_ids=[],
                                metrics=m))
        plain_rates.append(len(toks) / (time.perf_counter() - t0))
        sm = SpeculationMetrics()
        t0 = time.perf_counter()
        toks_s = list(spec.generate(p, args.gen, stop_token_ids=[],
                                    metrics=sm))
        spec_rates.append(len(toks_s) / (time.perf_counter() - t0))
        accepts.append(sm.acceptance_rate)
        # on chip the spec loop runs a DIFFERENT executable than the plain
        # loop: bf16-contract reduction order can flip greedy argmax on
        # near-ties (the pinned on-chip determinism boundary) — bit-exact
        # equality is a CPU-mesh invariant; here record the shared prefix
        pre = 0
        for a, c in zip(toks, toks_s):
            if a != c:
                break
            pre += 1
        prefixes.append(pre / max(1, len(toks)))
    out2 = {
        "spec_shared_prefix": round(float(np.mean(prefixes)), 3),
        "plain_tok_s": round(float(np.median(plain_rates)), 1),
        "selfspec_tok_s": round(float(np.median(spec_rates)), 1),
        "selfspec_acceptance": round(float(np.mean(accepts)), 4),
        "selfspec_speedup": round(
            float(np.median(spec_rates)) / float(np.median(plain_rates)), 3),
    }
    print(json.dumps({"stage": "selfspec", **out2}), flush=True)

    # ngram chain speculation acceptance
    ng_accepts, ng_rates = [], []
    for p in prompts:
        dec = SpeculativeDecoder(lm, NgramSpeculator(k=4))
        sm = SpeculationMetrics()
        t0 = time.perf_counter()
        toks_n = list(dec.generate(p, args.gen, stop_token_ids=[],
                                   metrics=sm))
        ng_rates.append(len(toks_n) / (time.perf_counter() - t0))
        ng_accepts.append(sm.acceptance_rate)
    out3 = {
        "ngram_tok_s": round(float(np.median(ng_rates)), 1),
        "ngram_acceptance": round(float(np.mean(ng_accepts)), 4),
    }
    print(json.dumps({"stage": "ngram", **out3}), flush=True)
    print(json.dumps({**out, **out2, **out3}), flush=True)


if __name__ == "__main__":
    main()

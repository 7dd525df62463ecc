"""Fused multi-round speculation: measured tunnel economics (DESIGN.md
"Future work" item 1, landed).

BASELINE r5 attribution: unconstrained single-stream speculation pays one
~25 ms host fetch PER ROUND, so even 0.95-acceptance trained-draft
speculation loses to the engine's fused 64-step plain chunks on the tiny
real-statistics model (~650 tok/s plain vs tunnel-bound spec). The fused
decoder (engine/fused_spec.py) moves R rounds inside one executable, so
the fetch amortizes R-fold and the compute term (fwd-equivalents/token)
decides. With the trained 3M draft at 0.95 acceptance and k=4 this pencils
to ~0.36 fwd-equiv/token.

Arms (single stream, tiny_real_int4, held-out prompts, greedy):
  plain          engine fused-chunk decode (the r5 baseline)
  per_round      SpeculativeDecoder + trained draft, k=4 (tunnel-bound)
  fused_rN       FusedSpeculativeDecoder + trained draft, k=4, rounds=N
  fused_self     FusedSpeculativeDecoder self-draft dl=7, k=2 (no artifact)

All arms interleave within one chip window; per-arm medians over reps.

    python tools/exp_fused_spec.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

GEN = 256


def main() -> None:
    from exp_spec_tuned import ensure_draft

    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.fused_spec import FusedSpeculativeDecoder
    from uzu_tpu.engine.speculation import (
        DraftModelSpeculator,
        SpeculationMetrics,
        SpeculativeDecoder,
    )
    from uzu_tpu.tools.corpus import heldout_prompts

    lm = LanguageModel.from_dir(
        os.path.join(REPO, ".bench_cache", "tiny_real_int4"),
        max_context=1024, prefill_buckets=(32, 256))
    draft = LanguageModel.from_dir(ensure_draft(), max_context=1024,
                                   prefill_buckets=(32, 256))
    prompts = heldout_prompts(k=2, length=64)

    arms = {
        "plain": lambda p: lm.generate_list(p, GEN, stop_token_ids=[]),
    }

    def spec_arm(dec):
        def run(p, _dec=dec):
            m = SpeculationMetrics()
            toks = list(_dec.generate(p, GEN, stop_token_ids=[], metrics=m))
            run.acc = m.acceptance_rate
            run.rounds = m.num_verify_passes
            return toks
        return run

    arms["per_round"] = spec_arm(
        SpeculativeDecoder(lm, DraftModelSpeculator(draft, k=4)))
    for rounds in (8, 16):
        arms[f"fused_r{rounds}"] = spec_arm(
            FusedSpeculativeDecoder(lm, draft_lm=draft, k=4, rounds=rounds))
    arms["fused_self"] = spec_arm(
        FusedSpeculativeDecoder(lm, draft_layers=7, k=2, rounds=8))
    arms["fused_ngram"] = spec_arm(
        FusedSpeculativeDecoder(lm, ngram=True, k=8, rounds=16))

    # warm every executable BEFORE any timing (remote AOT compiles are
    # minutes; a cold arm inside the timed loop poisons the window)
    ref = None
    for name, fn in arms.items():
        t0 = time.perf_counter()
        toks = fn(prompts[0])
        print(json.dumps({"stage": "warm", "arm": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
        if ref is None:
            ref = toks
        else:
            npfx = next((i for i, (a, b) in enumerate(zip(toks, ref))
                         if a != b), min(len(toks), len(ref)))
            # cross-variant argmax flips are allowed on chip (CLAUDE.md
            # determinism boundary); a SHORT shared prefix means a bug
            print(json.dumps({"stage": "prefix", "arm": name,
                              "shared": npfx, "of": len(ref)}), flush=True)

    # interleaved timed reps
    results = {n: [] for n in arms}
    accs = {}
    for rep in range(3):
        for name, fn in arms.items():
            p = prompts[rep % len(prompts)]
            t0 = time.perf_counter()
            toks = fn(p)
            dt = time.perf_counter() - t0
            results[name].append(len(toks) / dt)
            if hasattr(fn, "acc"):
                accs[name] = round(fn.acc, 4)

    out = {"stage": "fused_spec", "gen": GEN}
    for name, rates in results.items():
        out[f"{name}_tok_s"] = round(float(np.median(rates)), 1)
    out["acceptance"] = accs
    plain = out["plain_tok_s"]
    out["best_speedup"] = round(
        max(v for k, v in out.items()
            if isinstance(v, float) and k.endswith("_tok_s")) / plain, 3)
    print(json.dumps(out), flush=True)

    # batched: plain BatchEngine vs per-round vs fused-rounds self-draft
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine

    def agg(engine_cls, **kw):
        eng = engine_cls(lm, batch_size=4, stop_token_ids=[], **kw)
        reqs = [eng.submit(p, GEN) for p in heldout_prompts(k=4, length=64)]
        t0 = time.perf_counter()
        eng.run()
        return sum(len(r.tokens) for r in reqs) / (time.perf_counter() - t0)

    barms = {
        "bplain": (BatchEngine, {"decode_chunk": 8}),
        "bspec_r1": (SpeculativeBatchEngine,
                     {"draft_block": 4, "draft_layers": 6}),
        "bspec_r8": (SpeculativeBatchEngine,
                     {"draft_block": 4, "draft_layers": 6, "spec_rounds": 8}),
        "bngram_r8": (SpeculativeBatchEngine,
                      {"draft_block": 8, "device_ngram": True,
                       "spec_rounds": 8}),
    }
    for name, (cls, kw) in barms.items():  # warm (compiles)
        t0 = time.perf_counter()
        agg(cls, **kw)
        print(json.dumps({"stage": "warm", "arm": name,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    bout = {"stage": "fused_spec_batched", "b": 4, "gen": GEN}
    bres = {n: [] for n in barms}
    for _ in range(3):
        for name, (cls, kw) in barms.items():
            bres[name].append(agg(cls, **kw))
    for name, rates in bres.items():
        bout[f"{name}_tok_s"] = round(float(np.median(rates)), 1)
    bout["fused_vs_per_round"] = round(
        bout["bspec_r8_tok_s"] / bout["bspec_r1_tok_s"], 3)
    bout["fused_vs_plain"] = round(
        bout["bspec_r8_tok_s"] / bout["bplain_tok_s"], 3)
    print(json.dumps(bout), flush=True)


if __name__ == "__main__":
    main()

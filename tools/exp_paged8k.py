"""Chip-side anatomy of the paged8_8k E2E serving stage (VERDICT r4 #1).

BENCH_r04: paged8_8k_tok_s 43.0 vs paged8_8k_steady_tok_s 475 — ~4x off
the component sum. Hypothesis from the scheduler code: `step()` admits at
most ONE 512-token prefill chunk per cycle once any stream is live, so
admitting 8 x 7936-token prompts takes ~112 cycles, each also paying a
mostly-idle fused decode chunk (~150-270 ms at 8k ctx). The r5 greedy-fill
policy admits until slots are full before dispatching decode.

This probe reproduces the bench shape (8 reqs x 7936 prompt, gen 96,
page=256, pages=300) under BOTH policies with per-cycle anatomy.

    python tools/exp_paged8k.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_once(lm, greedy, gen_b, label, nreq=8, prompt_len=7936):
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.engine.sampling import SamplingParams

    rng = np.random.default_rng(0)
    eng = PagedBatchEngine(lm, batch_size=8, decode_chunk=16, num_pages=300,
                           page_size=256, sampling=SamplingParams(),
                           stop_token_ids=[], admit_greedy=greedy)
    reqs = [eng.submit(rng.integers(0, lm.decoder_config.vocab_size,
                                    prompt_len), gen_b) for _ in range(nreq)]
    cyc = []
    t_start = time.perf_counter()
    while eng.queue or eng.num_active or eng._pending or eng._admitting:
        t0 = time.perf_counter()
        eng.step()
        cyc.append((time.perf_counter() - t0, eng.num_active))
    wall = time.perf_counter() - t_start
    total = sum(len(r.tokens) for r in reqs)
    c = np.array([t for t, _ in cyc])
    occ = np.array([o for _, o in cyc], float)
    out = {
        "label": label, "greedy": greedy, "cycles": len(cyc),
        "tokens": total, "wall_s": round(wall, 2),
        "tok_s": round(total / wall, 1),
        "mean_occupancy": round(float(occ.mean()), 2),
        "cycle_ms_p50": round(float(np.percentile(c, 50)) * 1e3, 1),
        "cycle_ms_p90": round(float(np.percentile(c, 90)) * 1e3, 1),
        "cycle_ms_max": round(float(c.max()) * 1e3, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    import bench
    from uzu_tpu import LanguageModel

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=8192,
                                prefill_buckets=(32, 512))
    # warmup/compile at the bench warmup shape (gen 16)
    run_once(lm, True, 16, "warm greedy (gen 16)")
    run_once(lm, True, 96, "greedy run1")
    run_once(lm, False, 96, "interleaved run1")
    run_once(lm, True, 96, "greedy run2")
    run_once(lm, False, 96, "interleaved run2")


if __name__ == "__main__":
    main()

"""Cycle anatomy of the dense batch4 E2E stage (mirror of exp_paged_e2e).

batch_step measured the fused B=4 chunk at 82.7 ms (774 tok/s aggregate
steady) while the bench batch4 e2e stage reads ~374. Per-cycle wall
timing over the exact bench shape (4 reqs, gen 256, admissions included)
shows where the run loses 2x.

    python tools/exp_batch_e2e.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_once(lm, nreq, gen_b, label):
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.sampling import SamplingParams

    rng = np.random.default_rng(0)
    eng = BatchEngine(lm, batch_size=4, decode_chunk=16,
                      sampling=SamplingParams(), stop_token_ids=[])
    reqs = [eng.submit(rng.integers(0, lm.decoder_config.vocab_size, 32),
                       gen_b) for _ in range(nreq)]
    cyc = []
    t_start = time.perf_counter()
    while eng.step():
        cyc.append(time.perf_counter() - t_start)
        t_start = time.perf_counter()
    wall = sum(cyc)
    total = sum(len(r.tokens) for r in reqs)
    c = np.array(cyc) if cyc else np.zeros(1)
    out = {
        "label": label, "cycles": len(cyc), "tokens": total,
        "tok_s": round(total / wall, 1) if wall else 0.0,
        "cycle_ms_p50": round(float(np.percentile(c, 50)) * 1e3, 1),
        "cycle_ms_p90": round(float(np.percentile(c, 90)) * 1e3, 1),
        "cycle_ms_max": round(float(c.max()) * 1e3, 1),
        "cycle_ms_all": [round(float(x) * 1e3, 1) for x in c[:40]],
    }
    print(json.dumps(out), flush=True)


def main() -> None:
    import bench
    from uzu_tpu import LanguageModel

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=8192,
                                prefill_buckets=(32, 512))
    run_once(lm, 4, 64, "warm (gen 64 — the bench warmup shape)")
    run_once(lm, 4, 256, "measure (4 reqs, gen 256 — the bench shape)")
    run_once(lm, 4, 256, "measure repeat")


if __name__ == "__main__":
    main()

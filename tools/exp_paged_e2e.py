"""Chip-side cycle anatomy of the paged8 E2E serving stage.

paged_step_v4 measured steady-state at 8.22 ms/step (973 tok/s aggregate)
while the bench paged8 e2e stage reads 178 tok/s — and the same
oversubscribed run on CPU schedules near-ideally (40 tokens/cycle). This
probe reproduces the e2e stage ON CHIP with per-cycle wall timing to see
where the chip run loses 4-5x: mid-measure executable loads (ctx-bucket
or tail-chunk variants the gen-32 warmup never compiled), fetch stalls,
or admission cycles.

    python tools/exp_paged_e2e.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_once(lm, nreq, gen_b, label):
    from uzu_tpu.engine.paged_batch import PagedBatchEngine
    from uzu_tpu.engine.sampling import SamplingParams

    rng = np.random.default_rng(0)
    eng = PagedBatchEngine(lm, batch_size=8, decode_chunk=16, num_pages=256,
                           page_size=64, sampling=SamplingParams(),
                           stop_token_ids=[])
    reqs = [eng.submit(rng.integers(0, lm.decoder_config.vocab_size, 32),
                       gen_b) for _ in range(nreq)]
    cyc = []
    t_start = time.perf_counter()
    while eng.queue or eng.num_active or eng._pending or eng._admitting:
        t0 = time.perf_counter()
        eng.step()
        cyc.append(time.perf_counter() - t0)
    wall = time.perf_counter() - t_start
    total = sum(len(r.tokens) for r in reqs)
    c = np.array(cyc)
    out = {
        "label": label, "cycles": len(cyc), "tokens": total,
        "tok_s": round(total / wall, 1),
        "tokens_per_cycle": round(total / len(cyc), 1),
        "cycle_ms_p50": round(float(np.percentile(c, 50)) * 1e3, 1),
        "cycle_ms_p90": round(float(np.percentile(c, 90)) * 1e3, 1),
        "cycle_ms_max": round(float(c.max()) * 1e3, 1),
        "slow_cycle_ms_sum": round(
            float(c[c > 2 * np.percentile(c, 50)].sum()) * 1e3, 1),
    }
    print(json.dumps(out), flush=True)
    return out


def main() -> None:
    import bench
    from uzu_tpu import LanguageModel

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=8192,
                                prefill_buckets=(32, 512))
    run_once(lm, 8, 32, "warm (8 reqs, gen 32 — the bench warmup shape)")
    run_once(lm, 16, 192, "measure1 (16 reqs, gen 192)")
    run_once(lm, 16, 192, "measure2 (repeat — clean if run1 paid loads)")


if __name__ == "__main__":
    main()

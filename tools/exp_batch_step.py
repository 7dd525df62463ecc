"""Dense batched decode: pure step time vs batch width, on chip.

bench batch4 has sat at ~374-389 aggregate (10.5 ms per 4-token step)
since r3 while the weight stream bounds the step at ~3.6 ms (the same
695 MB the single stream reads) + ~0.6 ms of bucketed KV reads. This
probe times the BatchEngine's fused decode chunk directly at B in
{1, 2, 4, 8} (steady state, no admissions, differential between two
chunk counts) to split engine-loop overhead from step compute.

    python tools/exp_batch_step.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.sampling import SamplingParams

    model_dir, _ = bench.flagship_dir(True)
    max_ctx = int(os.environ.get("UZU_EXP_CTX", "2048"))
    lm = LanguageModel.from_dir(model_dir, max_context=max_ctx,
                                prefill_buckets=(32, 512))
    print(json.dumps({"max_context": max_ctx}), flush=True)
    rng = np.random.default_rng(0)
    for bsz in (1, 2, 4, 8):
        eng = BatchEngine(lm, batch_size=bsz, decode_chunk=16,
                          sampling=SamplingParams(), stop_token_ids=[])
        for _ in range(bsz):
            eng.submit(rng.integers(0, lm.decoder_config.vocab_size, 32),
                       100_000)
        for _ in range(8):  # admit + warm
            eng.step()
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            eng.step()
        dt = (time.perf_counter() - t0) / n
        print(json.dumps({
            "B": bsz,
            "chunk16_ms": round(dt * 1e3, 2),
            "step_ms": round(dt / 16 * 1e3, 3),
            "agg_tok_s": round(bsz * 16 / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()

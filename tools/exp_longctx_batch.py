"""On-chip: DENSE batch engine decode at long context, B=8 — the contiguous
KV counterpart of exp_paged_step (isolates the paged layout/kernel cost
from the batched-decode baseline: same model, same B, same C, full-layout
slot KV instead of page pools).

    UZU_EXP_CTX=8192 UZU_EXP_PREFILL=7936 python tools/exp_longctx_batch.py
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch import BatchEngine

    ctx = int(os.environ.get("UZU_EXP_CTX", 8192))
    plen = int(os.environ.get("UZU_EXP_PREFILL", ctx - 256))
    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=ctx,
                                prefill_buckets=(32, 512))
    rng = np.random.default_rng(0)
    eng = BatchEngine(lm, batch_size=8, decode_chunk=16, stop_token_ids=[])
    reqs = [eng.submit(rng.integers(0, lm.decoder_config.vocab_size, plen),
                       10_000)
            for _ in range(8)]
    for _ in range(12):  # admit + warm
        eng.step()
    t0 = time.perf_counter()
    n = 12
    for _ in range(n):
        eng.step()
    dt = (time.perf_counter() - t0) / n
    print(f"dense ctx={ctx} plen={plen}: {dt*1e3:.1f} ms per 16-step chunk "
          f"({16*8/dt:.0f} tok/s aggregate, {dt/16*1e3:.2f} ms/step)")


if __name__ == "__main__":
    main()

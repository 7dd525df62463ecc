"""p50 TTFT per context length (BASELINE targets row 3).

Measures wall time from generate() to the FIRST yielded token on the 1B
flagship at prompt lengths 512 / 2048 / 7936 (chunked prefill + first
sample + the pipelined first fetch), 5 reps each, p50 reported.

    python tools/exp_ttft.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from uzu_tpu import LanguageModel

    lm = LanguageModel.from_dir(
        os.path.join(REPO, ".bench_cache", "llama1b_int4"),
        max_context=8192, prefill_buckets=(32, 512))
    rng = np.random.default_rng(0)
    out = {}
    for ctx in (512, 2048, 7936):
        prompt = rng.integers(0, lm.decoder_config.vocab_size, ctx)
        # warm every executable for this ctx
        gen = lm.generate(prompt, 4, stop_token_ids=[])
        list(gen)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            g = lm.generate(prompt, 4, stop_token_ids=[])
            next(g)
            ts.append(time.perf_counter() - t0)
            list(g)
        out[f"ttft_p50_ctx{ctx}_s"] = round(float(np.percentile(ts, 50)), 4)
        out[f"ttft_p95_ctx{ctx}_s"] = round(float(np.percentile(ts, 95)), 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""Prefill chunk-width sweep: does a wider chunk lift prefill MFU?

r5 landed online-softmax prefill attention and measured the 512-chunk
marginal at 11.6-12.4 ms (MFU 0.57-0.61). paged8_8k e2e (~185 tok/s) is
now PREFILL-BOUND by arithmetic (63.5k prompt tokens at ~25k tok/s ≈
2.5 s of a ~4 s cycle), so sustained-prefill MFU is the remaining
headline lever. A wider chunk amortizes per-chunk overheads (launch,
state plumbing, bucket switches) and gives XLA larger GEMMs to tile —
this sweep measures e2e sustained rate AND the marginal chunk MFU at
widths 512 / 1024 / 2048 on the 1B flagship, interleaved in one window.

    python tools/exp_prefill_width.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TOTAL = 4096  # tokens per sustained prefill (8 x 512 ... 2 x 2048)


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import jax

    import bench
    from uzu_tpu import LanguageModel

    model_dir, _ = bench.flagship_dir(on_tpu=True)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, 128256, TOTAL)

    lms = {}
    for width in (512, 1024, 2048):
        lms[width] = LanguageModel.from_dir(
            model_dir, max_context=8192, prefill_buckets=(32, width))

    def run(lm, n_tokens):
        st = lm.new_state()
        logits, _ = lm.prefill(st, prompt[:n_tokens])
        jax.device_get(logits[:1])

    def lo_tokens(width):
        # differential low arm: >= 1 chunk (w=2048: 4096-2*2048 would be 0)
        return max(width, TOTAL - 2 * width)

    # warm every executable (compiles are minutes on the tunnel)
    for width, lm in lms.items():
        t0 = time.perf_counter()
        run(lm, TOTAL)
        run(lm, lo_tokens(width))
        print(json.dumps({"stage": "warm", "width": width,
                          "s": round(time.perf_counter() - t0, 1)}),
              flush=True)

    out = {"stage": "prefill_width", "total_tokens": TOTAL}
    fpt = bench.flops_per_token(lms[512].decoder_config, avg_ctx=TOTAL * 0.75)
    peak = bench.device_peak_bf16("tpu v5 lite")
    for rep in range(3):
        for width, lm in lms.items():
            e2e = TOTAL / _timeit(lambda: run(lm, TOTAL))
            # marginal: trailing chunks by differential
            lo = lo_tokens(width)
            d = (_timeit(lambda: run(lm, TOTAL))
                 - _timeit(lambda: run(lm, lo))) / ((TOTAL - lo) // width)
            out.setdefault(f"w{width}_e2e", []).append(round(e2e, 1))
            out.setdefault(f"w{width}_marginal_ms", []).append(
                round(d * 1e3, 2))
            out.setdefault(f"w{width}_mfu", []).append(
                round((width / max(d, 1e-9)) * fpt / peak, 4))
    for k, v in list(out.items()):
        if isinstance(v, list):
            out[k] = float(np.median(v))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""On-chip A/B: attention path at LONG context (VERDICT round-1 item 10).

Round-1 policy (einsum short-ctx / online-softmax long-ctx, flash kernel
off on TPU) was measured at S=512, C<=4096. This re-measures IN CONTEXT at
decode positions ~8k and ~14k and prefill chunks S=512 over an 8k prompt,
flagship model, real chip. Run twice in one window:

  python tools/exp_longctx_attention.py          # default path
  UZU_TPU_FLASH=1 python tools/exp_longctx_attention.py   # flash engaged
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax

    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.engine import StreamMetrics
    from uzu_tpu.engine.sampling import SamplingParams

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=16384,
                                prefill_buckets=(32, 512))
    rng = np.random.default_rng(0)
    V = lm.decoder_config.vocab_size
    flash = os.environ.get("UZU_TPU_FLASH", "") == "1"
    print(f"variant={'flash' if flash else 'default'}")

    for ctx in (8192, 14336):
        prompt = rng.integers(0, V, ctx - 64)
        # warm compile
        t0 = time.perf_counter()
        m = StreamMetrics()
        out = list(lm.generate(prompt, 48, sampling=SamplingParams(),
                               stop_token_ids=[], metrics=m))
        compile_s = time.perf_counter() - t0
        rates = []
        for _ in range(3):
            m = StreamMetrics()
            list(lm.generate(prompt, 48, sampling=SamplingParams(),
                             stop_token_ids=[], metrics=m))
            rates.append(m.decode_tokens_per_second)
        print(f"ctx={ctx}: decode {float(np.median(rates)):.1f} tok/s "
              f"(prefill {m.prefill_tokens_per_second:.0f} tok/s, "
              f"first-run total {compile_s:.1f}s)")


if __name__ == "__main__":
    main()

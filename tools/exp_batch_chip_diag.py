"""On-chip: WHICH batched engine diverges from single-stream greedy?

serving_smoke r3 failed `spec greedy == plain greedy` on chip while the
single-stream diag showed spec == plain exactly. This isolates the engine:
reproduces the smoke's exact submissions and compares each engine's greedy
slot to single-stream generate_list, printing the first divergence index
per engine (plain batch-4 with mixed neighbors, spec batch-2 with a
sampled neighbor, each ALSO re-run with no neighbors).
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def first_div(a, b):
    return next((i for i, (x, y) in enumerate(zip(a, b)) if x != y), None)


def main():
    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.batch import BatchEngine
    from uzu_tpu.engine.batch_spec import SpeculativeBatchEngine
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32, 512))
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, lm.decoder_config.vocab_size, 48))
    single = lm.generate_list(np.asarray(prompt), 24, stop_token_ids=[])

    out = {"single": single[:8]}

    eng = BatchEngine(lm, batch_size=4, decode_chunk=8, stop_token_ids=[],
                      prefix_min=16)
    r1 = eng.submit(prompt, 24)
    eng.submit(prompt[:40], 24, sampling=SamplingParams(
        temperature=0.9, top_k=50, top_p=0.95), seed=3)
    eng.submit(prompt[:32], 24, frequency_penalty=1.5, seed=7)
    r4 = eng.submit(prompt, 24, logprobs=3)
    eng.run()
    out["plain_mixed_div"] = first_div(single, r1.tokens)
    out["plain_logprobs_div"] = first_div(single, r4.tokens)

    eng2 = BatchEngine(lm, batch_size=4, decode_chunk=8, stop_token_ids=[])
    p1 = eng2.submit(prompt, 24)
    eng2.run()
    out["plain_solo_div"] = first_div(single, p1.tokens)

    seng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                  stop_token_ids=[])
    s1 = seng.submit(prompt, 24)
    seng.submit(prompt[:40], 24, sampling=SamplingParams(
        temperature=0.9, top_k=50), seed=3)
    seng.run()
    out["spec_mixed_div"] = first_div(single, s1.tokens)
    out["spec_mixed_tokens"] = s1.tokens[:8]

    seng2 = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                   stop_token_ids=[])
    q1 = seng2.submit(prompt, 24)
    seng2.run()
    out["spec_solo_div"] = first_div(single, q1.tokens)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

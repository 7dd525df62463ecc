"""On-chip smoke of the round-2 serving executables on the flagship model.

The serving features are pinned exhaustively on the CPU mesh; this drives
the REAL-chip executable variants once each — dynamic per-request sampling,
presence/frequency penalties (count rows through the fused scan), logprobs,
speculative verify, and paged admission with the automatic prefix cache —
and prints one JSON line per stage so a Mosaic/compile regression on any
variant is attributable. Run:

    PYTHONPATH=. python -m uzu_tpu.tools.exp_serving_smoke .bench_cache/llama1b_int4
"""

from __future__ import annotations

import json
import sys
import time


def main(model_dir: str) -> None:
    import numpy as np

    from ..engine.engine import LanguageModel
    from ..engine.sampling import SamplingParams
    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    t0 = time.time()

    def stage(name, **kw):
        print(json.dumps({"stage": name, "t": round(time.time() - t0, 1), **kw}),
              flush=True)

    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32, 512))
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, lm.decoder_config.vocab_size, 48))
    stage("loaded")

    from ..engine.batch import BatchEngine

    def shared_len(a, b):
        return next((i for i, (x, y) in enumerate(zip(a, b)) if x != y),
                    min(len(a), len(b)))

    # Clean STATIC-variant baseline: one greedy request, no neighbors that
    # could flip a chunk to a dynamic executable. Every cross-engine
    # comparison below measures against this, not against a slot from the
    # mixed engine (r3b smoke failed by comparing spec-solo to a greedy
    # slot whose chunks had dynamic-variant NEIGHBORS — itself a
    # cross-variant comparison; CHIP_JOBS_r3.log serving_smoke_v2).
    eng0 = BatchEngine(lm, batch_size=2, decode_chunk=8, stop_token_ids=[],
                       prefix_min=0)
    base = eng0.submit(prompt, 24)
    eng0.run()
    stage("baseline", greedy=base.tokens[:4])

    # All four request kinds in one engine. Slots admit PIPELINED, so two
    # same-prompt slots compute token i in different decode chunks, and the
    # chunks' executable variant mix differs (the sampled/penalty neighbors
    # flip chunks to dynamic programs) — a cross-variant comparison, which
    # on chip only guarantees a shared greedy prefix (low-bit drift flips
    # argmax near-ties; determinism boundary in CLAUDE.md).
    eng = BatchEngine(lm, batch_size=4, decode_chunk=8, stop_token_ids=[],
                      prefix_min=16)
    r1 = eng.submit(prompt, 24)  # static greedy
    r2 = eng.submit(prompt[:40], 24,
                    sampling=SamplingParams(temperature=0.9, top_k=50,
                                            top_p=0.95), seed=3)
    r3 = eng.submit(prompt[:32], 24, frequency_penalty=1.5, seed=7)
    r4 = eng.submit(prompt, 24, logprobs=3)
    eng.run()
    assert all(len(r.tokens) == 24 for r in (r1, r2, r3, r4))
    assert len(r4.logprob_content) == 24
    shared_lp = shared_len(r4.tokens, r1.tokens)
    assert shared_lp >= 8, f"logprobs-slot greedy diverged too early ({shared_lp})"
    shared_mixed = shared_len(r1.tokens, base.tokens)
    assert shared_mixed >= 8, \
        f"mixed-engine greedy diverged from baseline too early ({shared_mixed})"
    stage("dense_variants", greedy=r1.tokens[:4], sampled=r2.tokens[:4],
          penalized_distinct=len(set(r3.tokens)), lp_greedy_shared=shared_lp,
          base_shared=shared_mixed,
          first_lp=round(r4.logprob_content[0][0], 3))

    # WITHIN-variant exactness: two greedy slots, one with logprobs, no
    # dynamic neighbors, prefix sharing off — every chunk runs the same
    # logprobs-enabled program over symmetric rows, so the tokens must
    # match bit-exactly even on chip.
    eng2 = BatchEngine(lm, batch_size=2, decode_chunk=8, stop_token_ids=[],
                       prefix_min=0)
    g1 = eng2.submit(prompt, 24)
    g4 = eng2.submit(prompt, 24, logprobs=3)
    eng2.run()
    assert g4.tokens == g1.tokens, "logprobs row must not change greedy"
    stage("dense_logprobs_exact")

    # shared-prefix KV-copy admission on chip: the copied rows are pinned
    # bit-exact on the CPU mesh; here the donor copy + chunk-staggered
    # decode must at least hold a long shared greedy prefix.
    peng0 = BatchEngine(lm, batch_size=2, decode_chunk=8, stop_token_ids=[],
                        prefix_min=16)
    p1 = peng0.submit(prompt, 24)
    p2 = peng0.submit(prompt, 24)  # admitted via donor KV copy from p1
    peng0.run()
    shared_p = shared_len(p2.tokens, p1.tokens)
    assert shared_p >= 8, f"prefix-admitted greedy diverged too early ({shared_p})"
    stage("dense_prefix_admission", greedy_shared=shared_p)

    from ..engine.paged_batch import PagedBatchEngine

    peng = PagedBatchEngine(lm, batch_size=4, decode_chunk=8, num_pages=64,
                            page_size=64, stop_token_ids=[])
    a = peng.submit(prompt, 18)  # history 48+17 = 65 > page_size: retires
    peng.run()
    assert len(peng._retired) == 1
    retired_pages = peng.pool.pages(next(iter(peng._retired)))
    follow = prompt + a.tokens[:17] + [11, 12]
    b = peng.submit(follow, 16, logprobs=2)
    peng.step()  # admission: must SHARE the retired page, not re-prefill it
    slot_b = next(i for i, s in enumerate(peng.slots) if s.request is b)
    assert peng.pool.pages(slot_b)[:1] == retired_pages[:1], "APC share missed"
    peng.run()
    assert len(b.logprob_content) == 16
    stage("paged_apc", retired=len(peng._retired), b_tokens=b.tokens[:4])

    from ..engine.batch_spec import SpeculativeBatchEngine

    # spec SOLO (static executables) vs the static plain baseline. The
    # verify is still a DIFFERENT XLA program than the decode chunk (K rows
    # per step), so even this is a cross-program comparison on chip: the r3
    # diag observed bit-equality once, but low-bit drift can legally flip
    # near-ties. Pin a long shared prefix; REPORT exactness so the queue
    # logs accumulate evidence instead of burning the run on an assert.
    # Bit-exact cross-variant invariants stay pinned on the CPU mesh.
    ssolo = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                   stop_token_ids=[])
    s0 = ssolo.submit(prompt, 24)
    ssolo.run()
    shared_s0 = shared_len(s0.tokens, base.tokens)
    assert shared_s0 >= 8, f"spec-solo greedy diverged too early ({shared_s0})"
    stage("spec_solo", exact=s0.tokens == base.tokens, greedy_shared=shared_s0)

    seng = SpeculativeBatchEngine(lm, batch_size=2, draft_block=4,
                                  stop_token_ids=[])
    s1 = seng.submit(prompt, 24)
    s2 = seng.submit(prompt[:40], 24,
                     sampling=SamplingParams(temperature=0.9, top_k=50), seed=3)
    seng.run()
    shared = shared_len(s1.tokens, base.tokens)
    assert shared >= 8, f"dynamic-variant greedy diverged too early ({shared})"
    acc = seng.metrics.num_tokens_accepted / max(
        1, seng.metrics.num_tokens_proposed)
    stage("spec_dynamic", acceptance=round(acc, 3), greedy_shared=shared)

    stage("ALL_OK")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else ".bench_cache/llama1b_int4")

"""Prefill attention-core A/B/C on chip: einsum vs Pallas flash vs online.

r4 prefill_attrib measured attention at ~6.6 ms of a 14.8 ms 512-token
chunk on the 1B flagship: at prefill widths the einsum path materializes
[H, S, C] f32 scores through HBM (~2 GB/chunk at C=2k across 16 layers),
and — unlike the decode widths the r1 policy was measured at — that
traffic CANNOT hide under the ~43 MB/layer weight stream. This probe
re-runs the whole-prefill A/B on today's code with three arms:

  einsum   current short-context dispatch (full score materialization)
  flash    UZU_TPU_FLASH=1   (Pallas kernel; r1 measured it 10% slower
           at C=1024 — re-test now that attention is known to be 44%)
  online   UZU_TPU_ONLINE=1  (chunked online softmax at every C; score
           blocks sized ONLINE_CHUNK stay fusable)

Arms share one process; each gets a fresh LanguageModel (per-arm jit
caches; the env flags are read at trace time). Warmups first, then
measurement rounds INTERLEAVE the arms so window drift cancels:
chunk_ms = differential 1-chunk vs 3-chunk prefill, median over rounds.

    python tools/exp_prefill_attn_ab.py
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNK = int(os.environ.get("UZU_EXP_CHUNK", "512"))
ROUNDS = 5

ARMS = [
    ("einsum", {}),
    ("flash", {"UZU_TPU_FLASH": "1"}),
    ("online", {"UZU_TPU_ONLINE": "1"}),
]


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def main() -> None:
    import jax

    from uzu_tpu import LanguageModel

    mdir = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, ".bench_cache", "llama1b_int4")
    p1 = (np.arange(CHUNK) * 13) % 128
    p3 = (np.arange(3 * CHUNK) * 13) % 128

    def runner(lm, p):
        def run():
            state = lm.new_state()
            logits, _ = lm.prefill(state, p)
            jax.device_get(logits[:1])
        return run

    arms = {}
    for name, env in ARMS:
        for k in ("UZU_TPU_FLASH", "UZU_TPU_ONLINE"):
            os.environ.pop(k, None)
        os.environ.update(env)
        lm = LanguageModel.from_dir(mdir, max_context=4 * CHUNK,
                                    prefill_buckets=(CHUNK,))
        r1, r3 = runner(lm, p1), runner(lm, p3)
        r1(), r3()  # trace+compile under this arm's env
        arms[name] = (r1, r3)
        print(json.dumps({"arm": name, "warmed": True}), flush=True)

    diffs = {name: [] for name, _ in ARMS}
    for _ in range(ROUNDS):
        for name, _ in ARMS:
            r1, r3 = arms[name]
            diffs[name].append(_timeit(r3) - _timeit(r1))
    out = {}
    for name, _ in ARMS:
        out[name + "_chunk_ms"] = round(
            max(float(np.median(diffs[name])) / 2, 1e-9) * 1e3, 4)
    base = out["einsum_chunk_ms"]
    best = min(out, key=out.get)
    out["verdict"] = best.replace("_chunk_ms", "")
    out["saving_ms_vs_einsum"] = round(base - out[best], 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

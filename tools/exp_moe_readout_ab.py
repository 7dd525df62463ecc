"""On-chip A/B: INT4 readout (embedding_spec) on the gptoss_small bench model.

The r3 full-quantization A/B (attention AND readout INT4) lost end-to-end
(348.7 vs 405.9 tok/s) and was adjudicated "bf16 attention/readout wins at
D=1024". But the readout is the single largest non-expert byte stream in
the step (untied output embedding, 32768 x 1024 bf16 = 67 MB vs 16.8 MB
INT4 — ~0.23 ms at the practical stream), and the quant GEMV is proven
exact + fast at this N (conformance qmm_i4_1b_readout cell, 32k x 2048).
This probe isolates the readout choice: expert stacks INT4 in both arms,
attention bf16 in both arms, ONLY the embedding spec differs.

Interleaved pairs (A, B, A, B, ...), median of per-pair step-time diffs —
window drift cancels pair-wise (house A/B discipline).

    python tools/exp_moe_readout_ab.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from exp_moe_attrib import step_ms  # noqa: E402  (same timing discipline)


def _model(name: str, quant_readout: bool) -> str:
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.tools.benchmoe import DIMS
    from uzu_tpu.tools.synth import gptoss_config, synthesize

    out = os.path.join(REPO, ".bench_cache", name)
    if not os.path.exists(os.path.join(out, "model.safetensors")):
        spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                       layout=Layout.OUTPUT_INPUT)
        synthesize(gptoss_config(**DIMS), out, seed=5, fill="fast",
                   expert_spec=spec,
                   embedding_spec=spec if quant_readout else None)
    return out


def main() -> None:
    from uzu_tpu import LanguageModel

    dirs = {
        "bf16_readout": _model("gptoss_small_eq4", False),
        "int4_readout": _model("gptoss_small_eq4_ro", True),
    }
    lms = {k: LanguageModel.from_dir(d, max_context=512, prefill_buckets=(64,))
           for k, d in dirs.items()}
    # warm both (compiles) before any timed pair
    for k, lm in lms.items():
        ms = step_ms(lm)
        print(json.dumps({"warm": k, "step_ms": round(ms, 4)}), flush=True)

    pairs = []
    for i in range(4):
        a = step_ms(lms["bf16_readout"])
        b = step_ms(lms["int4_readout"])
        pairs.append(a - b)
        print(json.dumps({"pair": i, "bf16_ms": round(a, 4),
                          "int4_ms": round(b, 4),
                          "diff_ms": round(a - b, 4)}), flush=True)
    med = float(np.median(pairs))
    print(json.dumps({
        "verdict": "int4_readout_wins" if med > 0 else "bf16_readout_wins",
        "median_saving_ms": round(med, 4),
    }), flush=True)


if __name__ == "__main__":
    main()

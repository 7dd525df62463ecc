"""On-chip: MoE decode step floor vs active-expert count (K-sweep).

r3b benches show gptoss_small decode efficiency FALLING as active bytes
shrink (464 MB -> vs_practical 0.76, 265 MB -> 0.39, 133 MB -> 0.19) at
near-constant step time — evidence of a fixed non-expert floor. Sweep
num_active K in {1, 2, 4, 8} on otherwise-identical INT4-expert synth
models and fit step_ms = floor + K * per_expert_ms:

- per_expert slope vs the INT4 SoL (~2.16 MB/expert-pair -> ~9 us at
  250 GB/s) says whether the gather path streams at speed;
- the intercept says how much step time is attention + router + readout
  + sampling + scan glue (the thing to attack if it dominates).

    python tools/exp_moe_floor.py
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


def step_ms(lm) -> float:
    """Fused decode step, differential 16- vs 48-step chunks (house rules:
    launch + tunnel roundtrip cancel pair-wise)."""
    import jax
    import jax.numpy as jnp

    from uzu_tpu.engine.sampling import SamplingParams

    state = lm.new_state()
    _, state = lm.prefill(state, (np.arange(48) * 13) % 128)
    k_s, k_b = 16, 48
    dec_s = lm._decode_fn(SamplingParams(), k_s, ())
    dec_b = lm._decode_fn(SamplingParams(), k_b, ())
    keys_s = jax.random.split(jax.random.PRNGKey(0), k_s)
    keys_b = jax.random.split(jax.random.PRNGKey(1), k_b)

    def run(dec, keys):
        nonlocal state
        state, emitted, _ = dec(lm.params, state, jnp.asarray(7, jnp.int32),
                                jnp.asarray(False), keys.shape[0], keys)
        jax.device_get(emitted[0])

    run(dec_s, keys_s)
    run(dec_b, keys_b)
    diffs = [
        _timeit(lambda: run(dec_b, keys_b)) - _timeit(lambda: run(dec_s, keys_s))
        for _ in range(5)
    ]
    return max(float(np.median(diffs)) / (k_b - k_s), 1e-9) * 1e3


def main():
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.engine.engine import LanguageModel
    from uzu_tpu.runtime import enable_compilation_cache
    from uzu_tpu.tools.benchmoe import DIMS
    from uzu_tpu.tools.synth import gptoss_config, synthesize

    enable_compilation_cache()
    ks = [int(v) for v in os.environ.get("UZU_EXP_KS", "1,2,4,8").split(",")]
    rows = []
    for k in ks:
        dims = dict(DIMS, num_active=k)
        out = os.path.join(REPO, ".bench_cache", f"gptoss_small_eq4_k{k}")
        if not os.path.exists(os.path.join(out, "model.safetensors")):
            spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                           layout=Layout.OUTPUT_INPUT)
            synthesize(gptoss_config(**dims), out, seed=5, fill="fast",
                       expert_spec=spec)
        lm = LanguageModel.from_dir(out, max_context=1024,
                                    prefill_buckets=(64,))
        ms = step_ms(lm)
        rows.append((k, ms))
        print(json.dumps({"k": k, "step_ms": round(ms, 4)}), flush=True)
        del lm
    if len(rows) >= 2:
        kv = np.array([r[0] for r in rows], np.float64)
        tv = np.array([r[1] for r in rows], np.float64)
        slope, floor = np.polyfit(kv, tv, 1)
        # INT4 expert-pair bytes per layer step: (2*dff*D + D*dff)/2 + scales
        d, dff, nl = DIMS["model_dim"], DIMS["expert_hidden_dim"], DIMS["num_layers"]
        per_pair_mb = (3 * dff * d / 2 + 3 * dff * d / 32 * 2) * nl / 1e6
        print(json.dumps({
            "floor_ms": round(float(floor), 4),
            "per_expert_ms": round(float(slope), 4),
            "per_expert_active_mb": round(per_pair_mb, 2),
            "per_expert_gbs": round(per_pair_mb / max(float(slope), 1e-9), 1),
        }), flush=True)


if __name__ == "__main__":
    main()

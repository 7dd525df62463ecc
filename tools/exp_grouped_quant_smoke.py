"""On-chip: quantized grouped MoE prefill — correctness + timing vs the
XLA dequantize-stacks route it replaces (gpt-oss-small INT4 experts).

The XLA route materializes the FULL bf16 expert stacks per chunk
(E/K_active x more transient bytes than the routed weights); the grouped
kernel dequantizes INT4 blocks in-VMEM. Compares moe_forward end-to-end
(router + layout + both matmuls) at prefill widths.

    python tools/exp_grouped_quant_smoke.py
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


def main():
    import jax
    import jax.numpy as jnp

    from uzu_tpu.engine.engine import LanguageModel
    from uzu_tpu.models.moe import moe_forward
    from uzu_tpu.runtime import enable_compilation_cache
    from uzu_tpu.tools.benchmoe import model_dir

    enable_compilation_cache()
    lm = LanguageModel.from_dir(model_dir(REPO), max_context=1024,
                                prefill_buckets=(32, 512))
    lc = next(c for c in lm.decoder_config.transformer_config.layer_configs)
    cfg = lc.mlp_config
    params = lm.params["layers"][0]["mlp"]
    d = lm.decoder_config.transformer_config.model_dim
    rng = np.random.default_rng(0)

    fwd = jax.jit(lambda x: moe_forward(cfg, params, x))

    for s in (64, 256, 512):
        x = jnp.asarray(rng.standard_normal((s, d)) * 0.3, jnp.bfloat16)
        os.environ["UZU_TPU_KERNELS"] = "xla"
        want = np.asarray(jax.jit(
            lambda x: moe_forward(cfg, params, x))(x), np.float32)
        os.environ["UZU_TPU_KERNELS"] = "pallas"
        got = np.asarray(jax.jit(
            lambda x: moe_forward(cfg, params, x))(x), np.float32)
        err = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-2)))
        print(json.dumps({"s": s, "max_rel_err": round(err, 6)}), flush=True)

    # timing, scan-folded differential per path
    for name, mode in (("quant_grouped", "pallas"), ("xla_dequant", "xla")):
        os.environ["UZU_TPU_KERNELS"] = mode

        @jax.jit
        def run(xs):
            def body(acc, xv):
                return acc + jnp.sum(moe_forward(cfg, params, xv)
                                     .astype(jnp.float32)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
            return acc

        def inputs(reps, s=256):
            return jnp.asarray(rng.standard_normal((reps, s, d)) * 0.3,
                               jnp.bfloat16)

        small, big = inputs(4), inputs(12)
        jax.device_get(run(small))
        jax.device_get(run(big))
        diffs = [
            _timeit(lambda: jax.device_get(run(big)))
            - _timeit(lambda: jax.device_get(run(small)))
            for _ in range(5)
        ]
        dt = max(float(np.median(diffs)) / 8, 1e-9)
        print(json.dumps({name: {"ms_per_256tok_layer": round(dt * 1e3, 4)}}),
              flush=True)
    os.environ.pop("UZU_TPU_KERNELS", None)


if __name__ == "__main__":
    main()

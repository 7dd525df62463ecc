"""On-chip: prefill-M quantized matmul — is the dequant kernel MXU-bound?

bench r3: prefill 13.1k tok/s == ~16 TFLOPs on a ~200 TFLOP (bf16) MXU.
At prefill M the matmul is compute-bound, so the in-kernel dequant
expansion competes with the real dots. Candidates on the flagship's
up|gate weight at M in {128, 512}:

  kernel : production fused dequant matmul (ops/pallas/quant_matmul)
  xla_dq : dequantize the whole weight to bf16 (XLA ops), then dense dot
           — 2x HBM bytes, zero in-kernel expansion
  dense  : dot against a PRE-materialized bf16 weight (upper bound: what
           the MXU gives this shape with no quantization at all)

Differential scan-folded timing; prints ms + effective TFLOPs each.
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

    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.ops.linear import linear_apply
    from uzu_tpu.quant.format import dequantize
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32,))
    w = lm.params["layers"][0]["mlp"]["up"]["w"]
    n, kdim = w.shape
    wd = jnp.asarray(dequantize(w), jnp.bfloat16)  # [N, K] bf16
    rng = np.random.default_rng(0)

    def kernel_fn(args, xv):
        wq, _ = args
        return jnp.sum(linear_apply(wq, xv).astype(jnp.float32))

    def xla_dq_fn(args, xv):
        wq, _ = args
        from uzu_tpu.quant.format import dequantize as dq

        wt = dq(wq).astype(jnp.bfloat16)
        y = jax.lax.dot_general(xv, wt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(y)

    def dense_fn(args, xv):
        _, wt = args
        y = jax.lax.dot_general(xv, wt, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return jnp.sum(y)

    for m in (128, 512):
        flops = 2 * m * n * kdim
        out = {"m": m}
        for name, fn in (("kernel", kernel_fn), ("xla_dq", xla_dq_fn),
                         ("dense", dense_fn)):

            @jax.jit
            def run(args, xs, fn=fn):
                def body(acc, xv):
                    return acc + fn(args, xv), None

                acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
                return acc

            def inputs(reps):
                scales_i = 1.0 + 1e-3 * jnp.arange(reps, dtype=jnp.float32)
                x0 = jnp.asarray(rng.standard_normal((m, kdim)), jnp.bfloat16)
                return jax.device_put(
                    (x0[None] * scales_i[:, None, None]).astype(jnp.bfloat16))

            args = (w, wd)
            ks, kb = (8, 40) if m >= 512 else (16, 80)
            xs_s, xs_b = inputs(ks), inputs(kb)
            try:
                jax.device_get(run(args, xs_s))
                jax.device_get(run(args, xs_b))
                diffs = [
                    _timeit(lambda: jax.device_get(run(args, xs_b)))
                    - _timeit(lambda: jax.device_get(run(args, xs_s)))
                    for _ in range(5)
                ]
                dt = max(float(np.median(diffs)) / (kb - ks), 1e-9)
                out[name] = {"ms": round(dt * 1e3, 4),
                             "tflops": round(flops / dt / 1e12, 1)}
            except Exception as exc:  # noqa: BLE001
                out[name] = {"err": type(exc).__name__}
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()

"""On-chip A/B: INT8-activation matmul vs the current bf16-act x int4-weight
path (VERDICT round-1 item 9; reference capability: matmul_a.rs:8).

The open question: at prefill shapes (M >= 512) and wide-batch decode
(B = 32), does an int8-activation MXU matmul (2x the bf16 MXU rate on v5e)
beat the current path (int4 weights dequantized in-kernel, bf16 MXU)?
Variant B uses dynamic per-row activation scales and per-output-channel
int8 weights (the deployable W8A8 shape; W4A8 with group scales would add
a group-batched contraction on top).

Timing: scan-K-iterations-in-one-dispatch with per-iteration inputs, A/B
interleaved, median of diffs (cancels launch + roundtrip).
"""

import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.ops.linear import linear_apply

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=256, prefill_buckets=(32,))
    w4 = lm.params["layers"][0]["mlp"]["up"]["w"]  # int4 QuantizedTensor
    d = lm.decoder_config.transformer_config.model_dim

    # per-channel int8 requant of the same weights for variant B
    rng = np.random.default_rng(0)
    wf = np.asarray(
        jax.device_get(jax.jit(lambda w: linear_apply(
            w, jnp.eye(d, dtype=jnp.bfloat16)))(w4))
    ).astype(np.float32).T  # [N, K] dense equivalent
    ws = np.abs(wf).max(axis=1) / 127.0
    w8 = np.clip(np.round(wf / ws[:, None]), -127, 127).astype(np.int8)
    w8_d = jax.device_put(jnp.asarray(w8))
    ws_d = jax.device_put(jnp.asarray(ws, jnp.float32))

    def path_a(w, xs):
        def body(acc, xv):
            return acc + jnp.sum(linear_apply(w, xv).astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    def path_b(w8_, ws_, xs):
        def body(acc, xv):
            s = jnp.max(jnp.abs(xv.astype(jnp.float32)), axis=-1) / 127.0
            s = jnp.maximum(s, 1e-8)
            xq = jnp.clip(jnp.round(xv.astype(jnp.float32) / s[:, None]),
                          -127, 127).astype(jnp.int8)
            acc32 = jax.lax.dot_general(
                xq, w8_, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            y = acc32.astype(jnp.float32) * s[:, None] * ws_[None, :]
            return acc + jnp.sum(y), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    fa = jax.jit(path_a)
    fb = jax.jit(path_b)

    for m in (32, 512, 2048):
        k = max(4, 256 // max(m // 32, 1))
        xs = jax.device_put(jnp.asarray(
            rng.standard_normal((k, m, d)).astype(np.float32) * 0.1,
            jnp.bfloat16))
        jax.device_get(fa(w4, xs))
        jax.device_get(fb(w8_d, ws_d, xs))

        def t(f, *args):
            t0 = time.perf_counter()
            jax.device_get(f(*args))
            return time.perf_counter() - t0

        diffs_a, diffs_b = [], []
        for _ in range(5):
            diffs_a.append(t(fa, w4, xs))
            diffs_b.append(t(fb, w8_d, ws_d, xs))
        ta = float(np.median(diffs_a)) / k
        tb = float(np.median(diffs_b)) / k
        flops = 2 * m * d * w8.shape[0]
        print(f"M={m}: bf16xint4 {ta*1e3:.3f} ms ({flops/ta/1e12:.1f} TF)  "
              f"int8xint8 {tb*1e3:.3f} ms ({flops/tb/1e12:.1f} TF)  "
              f"speedup x{ta/tb:.2f}")


if __name__ == "__main__":
    main()

"""On-chip: fused MoE expert-gather GEMV — correctness + timing vs the
XLA dynamic-slice scan it replaces (gpt-oss-small dims, INT4 experts).

    python tools/exp_moe_gemv_smoke.py
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

    from uzu_tpu.ops.pallas.moe_gemv import moe_expert_gemv
    from uzu_tpu.quant.format import (
        StackedQuantized, dequantize, dequantize_stacked, pack_codes)
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    d, dff, e, k = 1024, 1408, 16, 4
    g = 32
    rng = np.random.default_rng(0)

    def stack(n, kdim):
        codes = rng.integers(0, 16, (e, n, kdim), dtype=np.uint8)
        scales = rng.random((e, n, kdim // g)).astype(np.float32) * 0.02 + 0.01
        return StackedQuantized(
            codes=jnp.asarray(pack_codes(codes, 4)),
            scales=jnp.asarray(scales), bits=4, group_size=g,
            qbias_coeff=-8.0)

    w13 = stack(2 * dff, d)
    w2 = stack(d, dff)

    # correctness on real Mosaic
    ids = jnp.asarray([2, 7, 11, 5], jnp.int32)
    x = jnp.asarray(rng.standard_normal((k, d)), jnp.float32)
    got = np.asarray(moe_expert_gemv(w13, x, ids))
    dense = np.asarray(dequantize_stacked(w13, jnp.float32))
    want = np.stack([np.asarray(x[i]) @ dense[int(ids[i])].T for i in range(k)])
    err = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-3)))
    print(json.dumps({"w13_max_rel_err": round(err, 6)}), flush=True)

    h = jnp.asarray(rng.standard_normal((k, dff)), jnp.float32)
    got2 = np.asarray(moe_expert_gemv(w2, h, ids))
    dense2 = np.asarray(dequantize_stacked(w2, jnp.float32))
    want2 = np.stack([np.asarray(h[i]) @ dense2[int(ids[i])].T for i in range(k)])
    err2 = float(np.max(np.abs(got2 - want2) / (np.abs(want2) + 1e-3)))
    print(json.dumps({"w2_max_rel_err": round(err2, 6)}), flush=True)

    # timing: one layer's up+down over K=4 pairs, kernel vs XLA scan,
    # differential between two scan lengths (house rules)
    def kernel_layer(x1, idv):
        up = moe_expert_gemv(w13, jnp.broadcast_to(x1, (k, d)), idv)
        hid = up[:, :dff] * jax.nn.sigmoid(up[:, dff:])
        return moe_expert_gemv(w2, hid, idv)

    def xla_layer(x1, idv):
        def one(carry, idx):
            w13_e = dequantize(w13.expert(idx), jnp.float32)
            up = x1 @ w13_e.T
            hid = up[:dff] * jax.nn.sigmoid(up[dff:])
            w2_e = dequantize(w2.expert(idx), jnp.float32)
            return carry + w2_e @ hid, None

        acc, _ = jax.lax.scan(one, jnp.zeros((d,), jnp.float32), idv)
        return acc

    for name, fn in (("kernel", lambda x1, idv: jnp.sum(kernel_layer(x1, idv))),
                     ("xla_scan", lambda x1, idv: jnp.sum(xla_layer(x1, idv)))):

        @jax.jit
        def run(xs, idss, fn=fn):
            def body(acc, xv):
                x1, idv = xv
                return acc + fn(x1, idv), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (xs, idss))
            return acc

        def inputs(reps):
            xs = jnp.asarray(rng.standard_normal((reps, d)), jnp.float32)
            idss = jnp.asarray(np.stack([
                rng.choice(e, k, replace=False) for _ in range(reps)]),
                jnp.int32)
            return xs, idss

        small, big = inputs(16), inputs(80)
        jax.device_get(run(*small))
        jax.device_get(run(*big))
        diffs = [
            _timeit(lambda: jax.device_get(run(*big)))
            - _timeit(lambda: jax.device_get(run(*small)))
            for _ in range(5)
        ]
        dt = max(float(np.median(diffs)) / 64, 1e-9)
        nb = k * (w13.nbytes + w2.nbytes) // e
        print(json.dumps({name: {"ms": round(dt * 1e3, 4),
                                 "gbs": round(nb / dt / 1e9, 1)}}), flush=True)


if __name__ == "__main__":
    main()

"""On-chip: MoE gather-decode strategies — can XLA reach stream rate?

The moe_decode micro (kernel_micros r3) measured 0.44 ms for ~35 MB of
active expert weights (~79 GB/s) — 2-3x under the achievable stream. The
gather path materializes jnp.take copies of the K selected experts'
weights before the einsum (read + write + read). Candidates:

  take:   current production path (take + einsum)
  slice:  lax.scan over the K active experts, dynamic_slice straight into
          the dot (XLA may fuse the slice into the matmul's HBM read)
  frozen: einsum with STATIC expert slices (upper bound: what the matmul
          costs with no routing indirection at all)

Differential scan-folded timing; gpt-oss-small dims (D=1024, dff=1408,
E=16, K=4, bf16).
"""

import functools
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

    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    d, dff, e, k = 1024, 1408, 16, 4
    rng = np.random.default_rng(0)
    w13 = jnp.asarray(rng.standard_normal((e, 2 * dff, d)) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.standard_normal((e, d, dff)) * 0.02, jnp.bfloat16)
    active_nb = k * (w13.nbytes + w2.nbytes) // e

    def silu(x):
        return x * jax.nn.sigmoid(x)

    def expert_out(up_out, w2_sel, probs):
        up, gate = up_out[..., :dff], up_out[..., dff:]
        hidden = (silu(gate) * up).astype(jnp.bfloat16)
        out = jnp.einsum("kh,kdh->kd", hidden, w2_sel.astype(jnp.bfloat16))
        return jnp.sum(out * probs[:, None], axis=0)

    def take_path(w13, w2, x, ids, probs):
        w13_sel = jnp.take(w13, ids, axis=0)
        w2_sel = jnp.take(w2, ids, axis=0)
        up_out = jnp.einsum("d,khd->kh", x.astype(jnp.bfloat16), w13_sel)
        return expert_out(up_out.astype(jnp.float32), w2_sel, probs)

    def slice_path(w13, w2, x, ids, probs):
        def one(carry, idx_p):
            idx, p = idx_p
            w13_e = jax.lax.dynamic_index_in_dim(w13, idx, 0, keepdims=False)
            up_out = (x.astype(jnp.bfloat16) @ w13_e.T).astype(jnp.float32)
            up, gate = up_out[:dff], up_out[dff:]
            hidden = (silu(gate) * up).astype(jnp.bfloat16)
            w2_e = jax.lax.dynamic_index_in_dim(w2, idx, 0, keepdims=False)
            return carry + p * (w2_e @ hidden).astype(jnp.float32), None

        acc, _ = jax.lax.scan(one, jnp.zeros((d,), jnp.float32),
                              (ids, probs))
        return acc

    def frozen_path(w13, w2, x, ids, probs):
        # static slices 0..k-1 — no routing indirection (upper bound)
        up_out = jnp.einsum("d,khd->kh", x.astype(jnp.bfloat16), w13[:k])
        return expert_out(up_out.astype(jnp.float32), w2[:k], probs)

    results = {}
    for name, fn in (("take", take_path), ("slice", slice_path),
                     ("frozen", frozen_path)):

        @jax.jit
        def run(w13, w2, xs, ids_s, probs_s, fn=fn):
            def body(acc, xv):
                x, ids, probs = xv
                return acc + jnp.sum(fn(w13, w2, x, ids, probs)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (xs, ids_s, probs_s))
            return acc

        def inputs(reps):
            xs = jnp.asarray(rng.standard_normal((reps, d)), jnp.bfloat16)
            ids = jnp.asarray(
                np.stack([rng.choice(e, k, replace=False)
                          for _ in range(reps)]), jnp.int32)
            probs = jnp.asarray(rng.random((reps, k)) + 0.1, jnp.float32)
            return xs, ids, probs

        small, big = inputs(16), inputs(80)
        jax.device_get(run(w13, w2, *small))
        jax.device_get(run(w13, w2, *big))
        diffs = [
            _timeit(lambda: jax.device_get(run(w13, w2, *big)))
            - _timeit(lambda: jax.device_get(run(w13, w2, *small)))
            for _ in range(5)
        ]
        dt = max(float(np.median(diffs)) / 64, 1e-9)
        results[name] = {"ms": round(dt * 1e3, 4),
                         "gbs": round(active_nb / dt / 1e9, 1)}
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps({"active_mb": round(active_nb / 1e6, 1),
                      "results": results}))


if __name__ == "__main__":
    main()

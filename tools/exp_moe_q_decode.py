"""On-chip: INT4-quantized MoE expert decode — which path pays?

Real gpt-oss ships MXFP4 experts; INT4 experts cut the dominant MoE
decode byte stream (the K active experts' weights) 4x. Candidates at
gpt-oss-small dims (D=1024, dff=1408, E=16, K=4):

  bf16   : dynamic-slice bf16 experts into the dot (current production,
           521 GB/s measured r3)
  xla_dq : dynamic-slice INT4 codes+scales, XLA dequant fused into the dot
  kernel : dynamic-slice INT4 parts, fused Pallas dequant matmul per
           expert (the slice materializes a copy first — pallas inputs
           cannot fuse — but codes are 4x smaller than bf16)

Reports ms per token-step and effective GB/s over the ACTIVE int4 bytes
(bf16 row reports its own bf16 bytes).
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

    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p
    from uzu_tpu.quant.format import quantize_reference
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    d, dff, e, k = 1024, 1408, 16, 4
    g = 32
    rng = np.random.default_rng(0)
    w13f = rng.standard_normal((e, 2 * dff, d)).astype(np.float32) * 0.02
    w2f = rng.standard_normal((e, d, dff)).astype(np.float32) * 0.02

    def qstack(wf):
        codes, scales = [], []
        for i in range(wf.shape[0]):
            parts = quantize_reference(wf[i], 4, g, "scale_symmetric")
            codes.append(parts["weights"])
            scales.append(parts["scales"])
        return (jnp.asarray(np.stack(codes)), jnp.asarray(np.stack(scales)))

    w13q = qstack(w13f)
    w2q = qstack(w2f)
    w13 = jnp.asarray(w13f, jnp.bfloat16)
    w2 = jnp.asarray(w2f, jnp.bfloat16)

    def silu(x):
        return x * jax.nn.sigmoid(x)

    def combine(up_out, down_fn, probs):
        up, gate = up_out[:dff], up_out[dff:]
        hidden = silu(gate) * up
        return down_fn(hidden)

    def bf16_path(args, x, ids, probs):
        w13, w2 = args

        def one(carry, idx_p):
            idx, p = idx_p
            w13_e = jax.lax.dynamic_index_in_dim(w13, idx, 0, keepdims=False)
            up_out = (x @ w13_e.astype(jnp.float32).T)
            w2_e = jax.lax.dynamic_index_in_dim(w2, idx, 0, keepdims=False)
            out = combine(up_out, lambda h: w2_e.astype(jnp.float32) @ h, p)
            return carry + p * out, None

        acc, _ = jax.lax.scan(one, jnp.zeros((d,), jnp.float32), (ids, probs))
        return acc

    def dq(codes_e, scales_e):
        # (code - 8) * scale, scales repeated over the group dim; codes are
        # packed two-per-byte [N, K/2]
        lo = (codes_e & 0xF).astype(jnp.int32)
        hi = (codes_e >> 4).astype(jnp.int32)
        codes = jnp.stack([lo, hi], axis=-1).reshape(codes_e.shape[0], -1)
        sc = jnp.repeat(scales_e.astype(jnp.float32), g, axis=-1)
        return (codes.astype(jnp.float32) - 8.0) * sc

    def xla_dq_path(args, x, ids, probs):
        (c13, s13), (c2, s2) = args

        def one(carry, idx_p):
            idx, p = idx_p
            w13_e = dq(jax.lax.dynamic_index_in_dim(c13, idx, 0, keepdims=False),
                       jax.lax.dynamic_index_in_dim(s13, idx, 0, keepdims=False))
            up_out = x @ w13_e.T
            w2_e = dq(jax.lax.dynamic_index_in_dim(c2, idx, 0, keepdims=False),
                      jax.lax.dynamic_index_in_dim(s2, idx, 0, keepdims=False))
            out = combine(up_out, lambda h: w2_e @ h, p)
            return carry + p * out, None

        acc, _ = jax.lax.scan(one, jnp.zeros((d,), jnp.float32), (ids, probs))
        return acc

    def kernel_path(args, x, ids, probs):
        (c13, s13), (c2, s2) = args

        def one(carry, idx_p):
            idx, p = idx_p
            ce = jax.lax.dynamic_index_in_dim(c13, idx, 0, keepdims=False)
            se = jax.lax.dynamic_index_in_dim(s13, idx, 0, keepdims=False)
            up_out = _quant_matmul_p(x[None].astype(jnp.bfloat16), ce, se,
                                     None, bits=4, group_size=g,
                                     qbias_coeff=-8.0)[0]
            ce2 = jax.lax.dynamic_index_in_dim(c2, idx, 0, keepdims=False)
            se2 = jax.lax.dynamic_index_in_dim(s2, idx, 0, keepdims=False)
            out = combine(
                up_out,
                lambda h: _quant_matmul_p(
                    h[None].astype(jnp.bfloat16), ce2, se2, None, bits=4,
                    group_size=g, qbias_coeff=-8.0)[0],
                p)
            return carry + p * out, None

        acc, _ = jax.lax.scan(one, jnp.zeros((d,), jnp.float32), (ids, probs))
        return acc

    nb_bf16 = k * (w13.nbytes + w2.nbytes) // e
    nb_q = k * sum(x.nbytes for x in (*w13q, *w2q)) // e
    for name, fn, args, nb in (
        ("bf16", bf16_path, (w13, w2), nb_bf16),
        ("xla_dq", xla_dq_path, (w13q, w2q), nb_q),
        ("kernel", kernel_path, (w13q, w2q), nb_q),
    ):

        @jax.jit
        def run(args, xs, ids_s, probs_s, fn=fn):
            def body(acc, xv):
                x, ids, probs = xv
                return acc + jnp.sum(fn(args, x, ids, probs)), None

            acc, _ = jax.lax.scan(body, jnp.float32(0), (xs, ids_s, probs_s))
            return acc

        def inputs(reps):
            xs = jnp.asarray(rng.standard_normal((reps, d)), jnp.float32)
            idsv = jnp.asarray(np.stack([
                rng.choice(e, k, replace=False) for _ in range(reps)
            ]), jnp.int32)
            pv = jnp.asarray(rng.random((reps, k)) + 0.1, jnp.float32)
            return xs, idsv, pv

        small, big = inputs(16), inputs(80)
        try:
            jax.device_get(run(args, *small))
            jax.device_get(run(args, *big))
            diffs = [
                _timeit(lambda: jax.device_get(run(args, *big)))
                - _timeit(lambda: jax.device_get(run(args, *small)))
                for _ in range(5)
            ]
            dt = max(float(np.median(diffs)) / 64, 1e-9)
            print(json.dumps({name: {"ms": round(dt * 1e3, 4),
                                     "gbs": round(nb / dt / 1e9, 1),
                                     "active_mb": round(nb / 1e6, 1)}}),
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({name: {"err": f"{type(exc).__name__}: {exc}"[:200]}}),
                  flush=True)


if __name__ == "__main__":
    main()

"""On-chip: per-shape decode-GEMV timing for every distinct linear in the
flagship step + the non-matmul residue.

Single-stream decode measures ~200 tok/s (5 ms/step) against a ~3.5 ms
sum-of-weight-bytes bound at the in-window stream rate; this attributes
the residue. Each distinct weight (qkv, out, up, down, embedding readout)
is timed with the differential-scan protocol from bench.quant_matmul_probe
(two scan lengths, median of interleaved diffs — launch + roundtrip cancel).

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
       python tools/exp_gemv_shapes.py
"""

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


def time_matmul(w, d_in, label):
    import jax
    import jax.numpy as jnp

    from uzu_tpu.ops.linear import linear_apply

    def run(weights, inputs):
        def body(acc, xv):
            return acc + linear_apply(weights, xv).astype(jnp.float32), None

        y0 = jnp.zeros((1, linear_apply(weights, inputs[0]).shape[-1]),
                       jnp.float32)
        acc, _ = jax.lax.scan(body, y0, inputs)
        return acc

    f = jax.jit(run)

    def inputs(k):
        return jax.device_put(
            (jnp.arange(k, dtype=jnp.float32)[:, None, None] * 1e-3
             + jnp.ones((k, 1, d_in), jnp.float32)).astype(jnp.bfloat16))

    k_s, k_b = 32, 160
    xs_s, xs_b = inputs(k_s), inputs(k_b)
    jax.device_get(f(w, xs_s))
    jax.device_get(f(w, xs_b))
    diffs = [
        _timeit(lambda: jax.device_get(f(w, xs_b)))
        - _timeit(lambda: jax.device_get(f(w, xs_s)))
        for _ in range(5)
    ]
    dt = max(float(np.median(diffs)) / (k_b - k_s), 1e-9)
    wbytes = sum(
        getattr(w, n).nbytes for n in ("codes", "scales", "qbias")
        if getattr(w, n, None) is not None
    ) if hasattr(w, "codes") else w.nbytes
    print(f"{label:22s} {dt*1e3:7.3f} ms  {wbytes/2**20:8.1f} MiB  "
          f"{wbytes/dt/1e9:6.1f} GB/s", flush=True)
    return dt, wbytes


def main():
    import bench
    from uzu_tpu import LanguageModel

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32,))
    d = lm.decoder_config.transformer_config.model_dim
    nl = len(lm.decoder_config.transformer_config.layer_configs)
    l0 = lm.params["layers"][0]

    total = 0.0
    per_layer = 0.0
    for label, w, din in [
        ("qkv", l0["mixer"]["qkv"]["w"], d),
        ("attn out", l0["mixer"]["out"]["w"], d),
        ("mlp up(+gate)", l0["mlp"]["up"]["w"], d),
        ("mlp down", l0["mlp"]["down"]["w"],
         lm.decoder_config.transformer_config.hidden_dim),
    ]:
        dt, _ = time_matmul(w, din, label)
        per_layer += dt
    total += per_layer * nl
    emb = lm.params["embedding"].get("tied", lm.params["embedding"].get("output"))
    dt, _ = time_matmul(emb, d, "embedding readout")
    total += dt
    print(f"\nsum of matmuls: {total*1e3:.2f} ms/step "
          f"({per_layer*1e3:.3f} ms/layer x {nl} + readout {dt*1e3:.3f})")
    print("bench decode_step_ms tells the residue (non-matmul + scan).")


if __name__ == "__main__":
    main()

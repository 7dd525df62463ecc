"""On-chip: tile sweep for the DOWN projection decode GEMV.

step_breakdown_v2 measured the flagship's down GEMV at 174 GB/s vs 252
for up|gate and ~390 for qkv/out — the weakest matmul in the step (0.054
ms of a 3.25 ms step x 16 layers = 27%). This sweeps (block_n, block_k)
candidates on the exact down weight with the DIFFERENTIAL scan probe (the
method that produced the 174 number — rankings sit above the launch
floor, unlike the r2 autotune micros) and prints GB/s per candidate, plus
the same sweep for up|gate as a sanity anchor.
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


def probe(w, bn, bk, m=1, k_small=32, k_big=160, pairs=5):
    import jax
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p

    kdim = w.shape[1]
    rng = np.random.default_rng(0)

    def inputs(reps):
        scales_i = 1.0 + 1e-3 * jnp.arange(reps, dtype=jnp.float32)
        x0 = jnp.asarray(rng.standard_normal((m, kdim)), jnp.bfloat16)
        return jax.device_put(
            (x0[None] * scales_i[:, None, None]).astype(jnp.bfloat16))

    import functools

    @functools.partial(jax.jit, static_argnames=("bn", "bk"))
    def run(codes, scales, xs, bn, bk):
        def body(acc, xv):
            y = _quant_matmul_p(xv, codes, scales, None, bits=w.bits,
                                group_size=w.group_size, block_n=bn,
                                block_k=bk, qbias_coeff=w.qbias_coeff)
            return acc + jnp.sum(y), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    xs_s, xs_b = inputs(k_small), inputs(k_big)
    jax.device_get(run(w.codes, w.scales, xs_s, bn, bk))
    jax.device_get(run(w.codes, w.scales, xs_b, bn, bk))
    diffs = [
        _timeit(lambda: jax.device_get(run(w.codes, w.scales, xs_b, bn, bk)))
        - _timeit(lambda: jax.device_get(run(w.codes, w.scales, xs_s, bn, bk)))
        for _ in range(pairs)
    ]
    dt = max(float(np.median(diffs)) / (k_big - k_small), 1e-9)
    nb = w.codes.nbytes + w.scales.nbytes
    return dt * 1e3, nb / dt / 1e9


def main():
    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32,))
    l0 = lm.params["layers"][0]
    emb = lm.params["embedding"]
    shapes = [("down", l0["mlp"]["down"]["w"]),
              ("up|gate", l0["mlp"]["up"]["w"])]
    if os.environ.get("UZU_EXP_READOUT"):
        shapes = [("readout", emb.get("tied", emb.get("output")))]
    if os.environ.get("UZU_EXP_ATTN"):
        shapes = [("qkv", l0["mixer"]["qkv"]["w"]),
                  ("out", l0["mixer"]["out"]["w"])]
    m = int(os.environ.get("UZU_EXP_M", "1"))  # prefill-M sweeps: 128/512
    for name, w in shapes:
        n, kdim = w.shape
        k2 = kdim // 2
        rows = []
        for bn in (128, 256, 512):
            if n % bn:
                continue
            for bk in (256, 512, 1024, 2048):
                if k2 % bk or bk % (w.group_size // 2):
                    continue
                try:
                    # large-M sweeps shrink the scan reps (input buffers
                    # scale with m; the per-rep work is m x larger anyway)
                    reps = dict(k_small=8, k_big=40) if m >= 32 else {}
                    ms, gbs = probe(w, bn, bk, m=m, **reps)
                    rows.append({"bn": bn, "bk2": bk, "ms": round(ms, 4),
                                 "gbs": round(gbs, 1)})
                except Exception as exc:  # noqa: BLE001
                    rows.append({"bn": bn, "bk2": bk,
                                 "err": type(exc).__name__})
        rows.sort(key=lambda r: r.get("ms", 1e9))
        print(json.dumps({"shape": name, "n": n, "k": kdim,
                          "default_first3": rows[:3], "all": rows}),
              flush=True)


if __name__ == "__main__":
    main()

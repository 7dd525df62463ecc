"""Decode-step time breakdown: per-matmul-shape scan probes vs the full step.

The bench's quant_matmul_probe times only the largest decode GEMV (up);
this experiment times EVERY distinct quantized-linear shape of a model the
same scan-folded way, sums them per decode step, and compares against the
measured fused step — the residual is attention reads + norms + sampling +
readout glue and any lost overlap. Run on the real chip:

    PYTHONPATH=. python -m uzu_tpu.tools.exp_step_breakdown .bench_cache/llama1b_int4
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def time_shape(lm, w, m: int, k_small: int = 32, k_big: int = 160,
               pairs: int = 5) -> float:
    """ms per call of linear_apply on weight `w` with [m, K] inputs.

    DIFFERENTIAL between two scan lengths (house timing rules, same as
    bench.quant_matmul_probe): a lone device_get pays the ~25 ms tunnel
    roundtrip, which at reps=64 masquerades as a 0.39 ms/call floor —
    the r3 run that 'measured' every shape at 0.38-0.46 ms (9 GB/s!) and
    drove the residual to -566% was exactly that artifact. Interleaved
    pairs, median of diffs, so launch + roundtrip cancel pair-wise."""
    import jax
    import jax.numpy as jnp

    from ..ops.linear import linear_apply

    kdim = w.shape[1]  # arrays and QuantizedTensor both expose .shape

    def inputs(reps: int):
        scales_i = (1.0 + 1e-3 * jnp.arange(reps, dtype=jnp.float32))
        x0 = jnp.asarray(
            np.random.default_rng(0).standard_normal((m, kdim)), jnp.bfloat16)
        return jax.device_put((x0[None] * scales_i[:, None, None]
                               ).astype(jnp.bfloat16))

    @jax.jit
    def run(w, xs):
        def body(acc, xv):
            y = linear_apply(w, xv)
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    xs_s, xs_b = inputs(k_small), inputs(k_big)
    jax.device_get(run(w, xs_s))  # compile + warm both lengths
    jax.device_get(run(w, xs_b))
    diffs = [
        _timeit(lambda: jax.device_get(run(w, xs_b)))
        - _timeit(lambda: jax.device_get(run(w, xs_s)))
        for _ in range(pairs)
    ]
    dt = max(float(np.median(diffs)) / (k_big - k_small), 1e-9)
    return dt * 1e3


def weight_nbytes(w) -> int:
    import jax

    return sum(x.nbytes for x in jax.tree.leaves(w))


def prefill_main(model_dir: str, chunk: int = 512) -> dict:
    """Prefill-chunk breakdown: per-shape GEMM probes at M=chunk vs the
    fused prefill differential (a 3-chunk prompt minus a 1-chunk prompt =
    2 chunks of pure prefill; launch + tunnel roundtrip cancel)."""
    import jax

    from ..engine.engine import LanguageModel
    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    lm = LanguageModel.from_dir(model_dir, max_context=4 * chunk,
                                prefill_buckets=(chunk,))
    cfg = lm.decoder_config.transformer_config
    l0 = lm.params["layers"][0]
    probes = {
        "qkv": l0["mixer"]["qkv"]["w"],
        "out": l0["mixer"]["out"]["w"],
        "up|gate": l0["mlp"]["up"]["w"],
        "down": l0["mlp"]["down"]["w"],
    }
    rows = {}
    per_layer_ms = 0.0
    for name, w in probes.items():
        ms = time_shape(lm, w, chunk)
        nb = weight_nbytes(w)
        rows[name] = {"ms": round(ms, 4), "mb": round(nb / 1e6, 1)}
        per_layer_ms += ms
    n_layers = len(cfg.layer_configs)
    matmul_total = per_layer_ms * n_layers

    prompt1 = (np.arange(chunk) * 13) % 128
    prompt3 = (np.arange(3 * chunk) * 13) % 128

    def run(p):
        state = lm.new_state()
        logits, _ = lm.prefill(state, p)
        jax.device_get(logits[:1])

    run(prompt1)
    run(prompt3)
    diffs = [_timeit(lambda: run(prompt3)) - _timeit(lambda: run(prompt1))
             for _ in range(5)]
    chunk_ms = max(float(np.median(diffs)) / 2, 1e-9) * 1e3
    out = {
        "per_shape": rows,
        "matmul_sum_ms": round(matmul_total, 3),
        "prefill_chunk_ms": round(chunk_ms, 3),
        "residual_ms": round(chunk_ms - matmul_total, 3),
        "residual_pct": round(100 * (chunk_ms - matmul_total) / chunk_ms, 1),
    }
    print(json.dumps(out, indent=1))
    return out


def main(model_dir: str, m: int = 1) -> dict:
    from ..engine.engine import LanguageModel
    from ..runtime import enable_compilation_cache

    enable_compilation_cache()
    lm = LanguageModel.from_dir(model_dir, max_context=1024, prefill_buckets=(64,))
    cfg = lm.decoder_config.transformer_config

    # distinct (role, weight) instances of layer 0 + the readout; every
    # layer repeats the same shapes
    l0 = lm.params["layers"][0]
    probes = {
        "qkv": l0["mixer"]["qkv"]["w"],
        "out": l0["mixer"]["out"]["w"],
        "up|gate": l0["mlp"]["up"]["w"],
        "down": l0["mlp"]["down"]["w"],
    }
    emb = lm.params["embedding"].get("tied", lm.params["embedding"].get("output"))

    rows = {}
    per_layer_ms = 0.0
    for name, w in probes.items():
        ms = time_shape(lm, w, m)
        nb = weight_nbytes(w)
        rows[name] = {"ms": round(ms, 4), "mb": round(nb / 1e6, 1),
                      "gbs": round(nb / ms / 1e6, 1)}
        per_layer_ms += ms
    ms_read = time_shape(lm, emb, 1)
    nb_read = weight_nbytes(emb)
    rows["readout"] = {"ms": round(ms_read, 4), "mb": round(nb_read / 1e6, 1),
                       "gbs": round(nb_read / ms_read / 1e6, 1)}

    n_layers = len(cfg.layer_configs)
    matmul_total = per_layer_ms * n_layers + ms_read

    # the fused step, same scan-folded discipline (single stream, pos ~ 64)
    import jax
    import jax.numpy as jnp

    from ..engine.sampling import SamplingParams

    state = lm.new_state()
    _, state = lm.prefill(state, (np.arange(48) * 13) % 128)
    # DIFFERENTIAL between a 16- and a 48-step decode chunk: the shared
    # constant (launch + ~25 ms tunnel roundtrip) cancels pair-wise,
    # leaving 32 steps of pure fused-step time per pair
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

    run(dec_s, keys_s)  # compile + warm both
    run(dec_b, keys_b)
    diffs = [
        _timeit(lambda: run(dec_b, keys_b)) - _timeit(lambda: run(dec_s, keys_s))
        for _ in range(5)
    ]
    step_ms = max(float(np.median(diffs)) / (k_b - k_s), 1e-9) * 1e3

    out = {
        "per_shape": rows,
        "n_layers": n_layers,
        "matmul_sum_ms": round(matmul_total, 3),
        "step_ms": round(step_ms, 3),
        "residual_ms": round(step_ms - matmul_total, 3),
        "residual_pct": round(100 * (step_ms - matmul_total) / step_ms, 1),
    }
    print(json.dumps(out, indent=1))
    return out


if __name__ == "__main__":
    import os

    _dir = sys.argv[1] if len(sys.argv) > 1 else ".bench_cache/llama1b_int4"
    if os.environ.get("UZU_EXP_PREFILL_BREAKDOWN"):
        prefill_main(_dir, int(os.environ.get("UZU_EXP_CHUNK", "512")))
    else:
        main(_dir)

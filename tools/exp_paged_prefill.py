"""Attribution of the paged prefill chunk cost at 8k context (r5).

exp_paged8k measured greedy-fill admission at ~36.7 ms per 512-token
prefill chunk (128 chunks = 4.7 s of the 7.0 s e2e wall) while the dense
engine's sustained prefill chunk reads ~20 ms. Suspects:

  a) the per-layer FULL-context page gather to a dense [C, G, Dh] view
     before attention (write + read-back of ~16.8 MB x 16 layers per
     chunk that the dense path never pays);
  b) the K/V scatter into the pools not updating in-place despite
     donation (a copy of 2 x 75 MB x 16 layers would be ~16 ms);
  c) the attention core itself at paged layout.

Measures, each scan-free (sequential dispatches, one device_get):
  - dense prefill chunk at ctx bucket 8192 (the baseline)
  - paged prefill chunk at ctx_pages=32 (the 8k shape)
  - paged prefill chunk at ctx_pages=2 (attention+gather nearly removed)
  - scatter-only jit (16 layers of pool row-writes, donated)
  - gather-only jit (16 layers of full-ctx page gathers, summed)

    python tools/exp_paged_prefill.py
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def timeit(fn, reps=8):
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn()
    import jax

    jax.device_get(jax.tree.leaves(out)[0].ravel()[:1])
    return (time.perf_counter() - t0) / reps * 1e3


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.models.paged_decode import paged_prefill_chunk
    from uzu_tpu.models.paged_kv import init_pools

    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=8192,
                                prefill_buckets=(32, 512))
    cfg = lm.decoder_config
    rng = np.random.default_rng(0)
    num_pages, page = 300, 256
    maxp = 8192 // page

    pools = init_pools(cfg, num_pages, page, quantized=lm.kv_quant)
    table_row = np.full(maxp + 1, num_pages - 1, np.int32)
    table_row[:maxp] = np.arange(maxp, dtype=np.int32)
    table = jnp.asarray(table_row)
    tokens = jnp.asarray(rng.integers(0, cfg.vocab_size, 512), jnp.int32)

    results = {}

    # dense baseline: the engine's own prefill fn at the 8192 ctx bucket
    st = lm.new_state()
    dense_fn = lm._prefill_fn(512, 8192)
    state = st
    logits, state = dense_fn(lm.params, tokens, state, jnp.asarray(512, jnp.int32))
    jax.device_get(logits[:1])
    t0 = time.perf_counter()
    for _ in range(8):
        logits, state = dense_fn(lm.params, tokens, state,
                                 jnp.asarray(512, jnp.int32))
    jax.device_get(logits[:1])
    results["dense_chunk_c8192_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 2)

    # paged chunk at the 8k read width and at a tiny read width
    for ctx_pages, label in ((32, "paged_chunk_p32_ms"), (2, "paged_chunk_p2_ms")):
        fn = jax.jit(partial(paged_prefill_chunk, cfg), donate_argnums=(1,),
                     static_argnums=(6,))
        pl_ = init_pools(cfg, num_pages, page, quantized=lm.kv_quant)
        out = fn(lm.params, pl_, tokens, table, jnp.asarray(7168, jnp.int32),
                 jnp.asarray(512, jnp.int32), ctx_pages)
        jax.device_get(out[0][:1])
        pl_ = out[1]
        t0 = time.perf_counter()
        for _ in range(8):
            lg, pl_ = fn(lm.params, pl_, tokens, table,
                         jnp.asarray(7168, jnp.int32),
                         jnp.asarray(512, jnp.int32), ctx_pages)
        jax.device_get(lg[:1])
        results[label] = round((time.perf_counter() - t0) / 8 * 1e3, 2)

    # scatter-only: 512 rows into every layer's pools, donated
    g = next(lc.mixer_config for lc in cfg.transformer_config.layer_configs
             ).num_groups
    dh = next(lc.mixer_config for lc in cfg.transformer_config.layer_configs
              ).head_dim
    positions = 7168 + jnp.arange(512, dtype=jnp.int32)
    pidx = table[positions // page]
    off = positions % page

    @partial(jax.jit, donate_argnums=(0,))
    def scatter_only(pools, rows):
        out = []
        for pk in pools:
            k_pool, v_pool = pk
            k_pool = k_pool.at[:, pidx, off].set(jnp.swapaxes(rows, 0, 1))
            v_pool = v_pool.at[:, pidx, off].set(jnp.swapaxes(rows, 0, 1))
            out.append((k_pool, v_pool))
        return out

    rows = jnp.asarray(rng.standard_normal((512, g, dh)), jnp.bfloat16)
    pl_ = init_pools(cfg, num_pages, page, quantized=lm.kv_quant)
    pl_ = scatter_only(pl_, rows)
    t0 = time.perf_counter()
    for _ in range(8):
        pl_ = scatter_only(pl_, rows)
    jax.device_get(pl_[0][0].ravel()[:1])
    results["scatter_only_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 2)

    # gather-only: full-ctx dense views for every layer, reduced to a scalar
    @jax.jit
    def gather_only(pools):
        acc = jnp.float32(0)
        sel = table[:32]
        for pk in pools:
            k_pool, v_pool = pk
            kd = k_pool[:, sel].reshape(g, 32 * page, dh)
            vd = v_pool[:, sel].reshape(g, 32 * page, dh)
            acc += jnp.sum(kd.astype(jnp.float32)) + jnp.sum(vd.astype(jnp.float32))
        return acc

    pl_ = init_pools(cfg, num_pages, page, quantized=lm.kv_quant)
    jax.device_get(gather_only(pl_))
    t0 = time.perf_counter()
    for _ in range(8):
        out = gather_only(pl_)
    jax.device_get(out)
    results["gather_only_ms"] = round((time.perf_counter() - t0) / 8 * 1e3, 2)

    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()

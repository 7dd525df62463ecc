"""On-chip check of the paged-attention kernel variants vs the dequant
oracle: bf16 plain (flagship shape), bf16 window+sinks, int8, int8
window+sinks.

Usage: PYTHONPATH=/root/.axon_site:/root/repo JAX_PLATFORMS=axon \
       python tools/exp_paged_i8_check.py
"""

import numpy as np
import jax
import jax.numpy as jnp

from uzu_tpu.ops.pallas.paged_attention import (
    paged_attention_reference,
    paged_decode_attention,
)


def check(name, quantized, window, use_sinks):
    rng = np.random.default_rng(7)
    B, H, G, dh = 8, 16, 8, 128
    P, page, maxp = 64, 64, 16
    q = jnp.asarray(rng.standard_normal((B, H, dh)), jnp.float32)
    if quantized:
        k_pool = jnp.asarray(
            rng.integers(-127, 128, (G, P, page, dh), dtype=np.int64), jnp.int8)
        v_pool = jnp.asarray(
            rng.integers(-127, 128, (G, P, page, dh), dtype=np.int64), jnp.int8)
        k_s = jnp.asarray(rng.uniform(0.005, 0.03, (G, P, page)), jnp.float32)
        v_s = jnp.asarray(rng.uniform(0.005, 0.03, (G, P, page)), jnp.float32)
    else:
        k_pool = jnp.asarray(rng.standard_normal((G, P, page, dh)), jnp.bfloat16)
        v_pool = jnp.asarray(rng.standard_normal((G, P, page, dh)), jnp.bfloat16)
        k_s = v_s = None
    sinks = (jnp.asarray(rng.standard_normal(H), jnp.float32)
             if use_sinks else None)
    table = jnp.asarray(
        rng.integers(0, P, (B, maxp), dtype=np.int64), jnp.int32)
    lengths = jnp.asarray(rng.integers(5, maxp * page, B), jnp.int32)

    kw = dict(scale=dh ** -0.5, sliding_window_size=window, sinks=sinks,
              k_scales=k_s, v_scales=v_s)
    want = jax.device_get(paged_attention_reference(
        q, k_pool, v_pool, table, lengths, **kw)).astype(np.float32)
    got = jax.device_get(paged_decode_attention(
        q, k_pool, v_pool, table, lengths, **kw)).astype(np.float32)
    err = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
    print(f"{name}: max rel err {err:.2e}")
    assert err < 2e-2, (name, err)


def main():
    check("bf16 plain", False, None, False)
    check("bf16 win+sinks", False, 300, True)
    check("int8 plain", True, None, False)
    check("int8 win+sinks", True, 300, True)
    print("OK")


if __name__ == "__main__":
    main()

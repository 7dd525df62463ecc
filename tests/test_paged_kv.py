"""Paged KV cache groundwork: pool allocator + paged append/attend
equivalence with the dense slot-per-position cache."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from uzu_tpu.ops.attention import attention_reference
from uzu_tpu.ops.pallas.paged_attention import paged_decode_attention
from uzu_tpu.models.paged_kv import PagePool, PagePoolOverflow, append_token


def test_page_pool_alloc_share_release():
    pool = PagePool(num_pages=8, page_size=4)
    pages = pool.ensure(0, 10)  # 3 pages
    assert len(pages) == 3 and pool.free_pages == 5
    assert pool.ensure(0, 11) == pages  # still 3
    pool.ensure(1, 4)
    assert pool.free_pages == 4

    # prefix sharing bumps refcounts; release frees only unreferenced pages
    pool.share_prefix(0, 2, 2)
    assert pool.table(2, 4)[:2].tolist() == pages[:2]
    pool.release(0)
    assert pool.free_pages == 5  # page[2] freed; first two still shared
    pool.release(2)
    assert pool.free_pages == 7
    pool.release(1)
    assert pool.free_pages == 8

    with pytest.raises(PagePoolOverflow):
        pool.ensure(9, 8 * 4 + 1)


def test_paged_append_and_attend_matches_dense():
    """Tokens appended through page tables attend identically to the dense
    [C, G, Dh] cache layout."""
    rng = np.random.default_rng(6)
    G, dh, H = 2, 32, 8
    page, P, maxp = 8, 12, 4
    pool = PagePool(num_pages=P, page_size=page)
    k_pool = jnp.zeros((G, P, page, dh), jnp.float32)
    v_pool = jnp.zeros((G, P, page, dh), jnp.float32)

    lengths = [19, 7]
    dense = {}
    for slot, n in enumerate(lengths):
        ks = rng.standard_normal((n, G, dh)).astype(np.float32)
        vs = rng.standard_normal((n, G, dh)).astype(np.float32)
        dense[slot] = (ks, vs)
        for pos in range(n):
            pages = pool.ensure(slot, pos + 1)
            k_pool, v_pool = append_token(
                (k_pool, v_pool), jnp.asarray(ks[pos]), jnp.asarray(vs[pos]),
                pages[pos // page], pos % page,
            )

    q = jnp.asarray(rng.standard_normal((2, H, dh)), jnp.float32)
    table = jnp.asarray(np.stack([pool.table(s, maxp) for s in range(2)]))
    got = paged_decode_attention(
        q, k_pool, v_pool, table, jnp.asarray(lengths, jnp.int32),
        scale=dh ** -0.5, interpret=True,
    )

    for slot, n in enumerate(lengths):
        ks, vs = dense[slot]
        c = maxp * page
        k_dense = np.zeros((c, G, dh), np.float32)
        v_dense = np.zeros((c, G, dh), np.float32)
        k_dense[:n], v_dense[:n] = ks, vs
        want = attention_reference(
            q[slot : slot + 1], jnp.asarray(k_dense), jnp.asarray(v_dense),
            jnp.asarray([n - 1], jnp.int32),
            scale=dh ** -0.5, is_causal=True,
        )
        np.testing.assert_allclose(
            np.asarray(got[slot]), np.asarray(want[0]), rtol=2e-2, atol=2e-2
        )

"""Paged KV cache: a shared page pool + per-slot page tables.

The capacity design uzu's single-session engine never needed (SURVEY §0:
"no paged KV cache across requests"): B slots no longer preallocate
B x max_context KV — they draw fixed-size pages from a shared pool as they
grow, so total KV memory follows actual tokens, many more concurrent slots
fit, and prefix sharing (two slots pointing at the same physical pages) is
a page-table entry away. Reads go through the paged decode-attention
kernel (ops/pallas/paged_attention.py — gather-free); writes are plain XLA
scatters into the pool at (table[pos // page], pos % page).

Static shapes throughout: the pool is [G, P, page, Dh] per layer, the page
table [B, MAXP] i32 (0-filled; unused entries masked by lengths). The host
PagePool allocator owns the free list; page tables travel to the device as
small arrays per dispatch.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


class PagePoolOverflow(RuntimeError):
    pass


@dataclasses.dataclass
class PagePool:
    """Host-side page allocator (free list + per-slot logical page lists)."""

    num_pages: int
    page_size: int

    def __post_init__(self):
        self._free = list(range(self.num_pages - 1, -1, -1))
        self._slots: dict[int, list[int]] = {}
        self._refcount = np.zeros(self.num_pages, np.int32)

    @property
    def free_pages(self) -> int:
        return len(self._free)

    def ensure(self, slot: int, num_tokens: int) -> list[int]:
        """Grow slot's page list to cover num_tokens; returns the list."""
        pages = self._slots.setdefault(slot, [])
        needed = -(-num_tokens // self.page_size)
        while len(pages) < needed:
            if not self._free:
                raise PagePoolOverflow(
                    f"pool exhausted ({self.num_pages} pages of {self.page_size})"
                )
            p = self._free.pop()
            self._refcount[p] += 1
            pages.append(p)
        return pages

    def share_prefix(self, src_slot: int, dst_slot: int, num_pages: int) -> None:
        """Point dst's first pages at src's (copy-on-write is the caller's
        job — suitable for immutable shared prompt prefixes). Refcounts
        bump BEFORE the dst release so a self-share (src == dst) cannot
        momentarily drop a page to refcount 0 and leak it onto the free
        list while still owned."""
        src = self._slots.get(src_slot, [])[:num_pages]
        for p in src:
            self._refcount[p] += 1
        self.release(dst_slot)
        self._slots[dst_slot] = list(src)

    def release(self, slot: int) -> None:
        for p in self._slots.pop(slot, []):
            self._refcount[p] -= 1
            if self._refcount[p] == 0:
                self._free.append(p)

    def pages(self, slot: int) -> list[int]:
        """The slot's current logical->physical page list (possibly empty)."""
        return list(self._slots.get(slot, []))

    def table(self, slot: int, max_pages: int, fill: int = 0) -> np.ndarray:
        """[MAXP] i32 page table (`fill`-padded tail; mask via lengths)."""
        pages = self._slots.get(slot, [])
        out = np.full(max_pages, fill, np.int32)
        out[: len(pages)] = pages
        return out


def init_pools(decoder_config, num_pages: int, page_size: int,
               dtype=jnp.bfloat16, quantized: bool = False) -> list:
    """Per-layer page pools (None for non-attention / KV-shared layers):
    bf16 -> (k_pool, v_pool) [G, P, page, Dh]; quantized (INT8 KV, same
    per-(token, kv-head) absmax scheme as the dense ring/full caches) ->
    (k_q, k_s, v_q, v_s) with codes [G, P, page, Dh] i8 + scales
    [G, P, page] f32 — half the paged KV bytes, which is the pool's whole
    capacity purpose. Tuple arity is the dispatch tag."""
    from ..config.model import AttentionConfig

    pools = []
    for lc in decoder_config.transformer_config.layer_configs:
        m = lc.mixer_config
        if isinstance(m, AttentionConfig) and not m.is_kv_sharing \
                and lc.kv_source_layer_index is None:
            shape = (m.num_groups, num_pages, page_size, m.head_dim)
            if quantized:
                sshape = shape[:3]
                pools.append((
                    jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
                    jnp.zeros(shape, jnp.int8), jnp.ones(sshape, jnp.float32),
                ))
            else:
                pools.append((jnp.zeros(shape, dtype), jnp.zeros(shape, dtype)))
        else:
            pools.append(None)
    return pools


def append_token(pool_kv, k_new, v_new, physical_page, offset):
    """Write one token's K/V rows into the pool. k_new/v_new [G, Dh];
    physical_page/offset are traced scalars — ONE scatter per pool."""
    k_pool, v_pool = pool_kv
    k_pool = jax.lax.dynamic_update_slice(
        k_pool, k_new.astype(k_pool.dtype)[:, None, None, :],
        (0, physical_page, offset, 0),
    )
    v_pool = jax.lax.dynamic_update_slice(
        v_pool, v_new.astype(v_pool.dtype)[:, None, None, :],
        (0, physical_page, offset, 0),
    )
    return k_pool, v_pool

"""Device-side n-gram prompt-lookup proposer (vectorized, fixed-shape).

The host NgramSpeculator (engine/speculation.py:87) scans the token
history in Python between rounds — which forces one host roundtrip per
speculation round. This is the XLA form of the same rule, so prompt-lookup
drafts can ride the FUSED multi-round executables (engine/fused_spec.py,
batch engines' spec_rounds): all windows of the history are compared
against the current suffix n-gram in one vector op per n, the most recent
match wins, and its continuation is gathered as the draft — zero draft
model, zero extra weight streams, O(window * max_n) compares per round.

Semantics match NgramSpeculator over the trailing `window` tokens: try
the longest suffix n-gram first (n = max_n .. 1), take the MOST RECENT
earlier occurrence that has at least one continuation token, propose up
to k continuation tokens (clipped at the end of history).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ngram_propose(hist: jax.Array, hlen: jax.Array, k: int, max_n: int = 3):
    """Propose up to `k` continuation tokens from the history buffer.

    hist: [C] int32 token buffer; rows [0, hlen) are valid history in
    order (oldest first). hlen: traced scalar. Returns (draft [k] int32,
    draft_len scalar int32); rows beyond draft_len are garbage the caller
    must mask out of acceptance (they are safe to feed a causal verify).
    """
    c = hist.shape[0]
    idx = jnp.arange(c)
    hist_pad = jnp.concatenate([hist, jnp.zeros((k,), hist.dtype)])
    draft = jnp.zeros((k,), jnp.int32)
    dlen = jnp.zeros((), jnp.int32)
    found_any = jnp.zeros((), bool)
    for n in range(max_n, 0, -1):
        ok = (idx + n <= hlen - 1) & (hlen >= n + 1)
        for i in range(n):
            s_i = hist[jnp.maximum(hlen - n + i, 0)]
            # w[j] = hist[j + i]; the wrap rows are outside the ok bounds
            ok = ok & (jnp.roll(hist, -i) == s_i)
        best = jnp.max(jnp.where(ok, idx, -1))
        found = best >= 0
        start = jnp.maximum(best, 0) + n
        cont = jax.lax.dynamic_slice(hist_pad, (start,), (k,))
        c_len = jnp.clip(hlen - start, 0, k).astype(jnp.int32)
        use = found & ~found_any
        draft = jnp.where(use, cont.astype(jnp.int32), draft)
        dlen = jnp.where(use, c_len, dlen)
        found_any = found_any | found
    return draft, dlen

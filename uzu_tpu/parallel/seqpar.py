"""Sequence/context-parallel prefill: the prompt's token dimension sharded
over a mesh axis.

No reference counterpart — trymirai/uzu handles long context with ring KV
caches and chunking on one chip (SURVEY.md §5 "Long-context"); splitting one
long prefill across chips is the genuinely new TPU component. Two designs:

- sequence_parallel_prefill: shard_map over decoder_forward(seq_axis=...).
  Each device embeds + projects its token slice; K/V slices are all-gathered
  (the comms the replicated KV cache write needs anyway) and every device
  attends its local queries against the full context. Comms per layer =
  one [S, G, Dh] all-gather riding ICI; MLP/norm/readout work is 1/n per
  device. Supports everything the single-chip path supports except
  recurrent mixers.

- ring_attention: the memory-scalable primitive for a sequence-SHARDED KV
  cache — K/V blocks circulate the ring (ppermute) while each device folds
  them into a running online-softmax accumulator, so no device ever holds
  the full context. Used standalone (tested against attention_reference);
  wiring it under a sharded cache layout is the long-context decode
  milestone.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..models.decoder import decoder_forward

NEG_INF = -1e30


# --------------------------------------------------------------------------
# Ring attention primitive
# --------------------------------------------------------------------------


def ring_attention(
    q: jax.Array,  # [S_l, H, Dh] this device's query block
    k: jax.Array,  # [S_l, G, Dh] this device's key block
    v: jax.Array,  # [S_l, G, Dh]
    q_positions: jax.Array,  # [S_l] absolute positions of local queries
    kv_positions: jax.Array,  # [S_l] absolute positions of local keys
    *,
    axis_name: str,
    n_devices: int,
    scale: float,
    is_causal: bool = True,
    sliding_window_size: int | None = None,
    logit_soft_cap: float | None = None,
    sinks: jax.Array | None = None,  # [H]
) -> jax.Array:
    """Blockwise-parallel (ring) attention with online softmax; the KV block
    travels the ring while the accumulator stays put."""
    s, h, dh = q.shape
    g = k.shape[1]
    rep = h // g
    qf = q.astype(jnp.float32).reshape(s, g, rep, dh)
    qpos = q_positions.astype(jnp.int32)

    m_run = jnp.full((g, rep, s), NEG_INF, jnp.float32)
    l_run = jnp.zeros((g, rep, s), jnp.float32)
    acc = jnp.zeros((g, rep, s, dh), jnp.float32)
    blk = (k.astype(jnp.float32), v.astype(jnp.float32), kv_positions.astype(jnp.int32))
    perm = [(i, (i + 1) % n_devices) for i in range(n_devices)]

    for step in range(n_devices):
        k_blk, v_blk, p_blk = blk
        scores = jnp.einsum("sgrd,cgd->grsc", qf, k_blk) * scale
        if logit_soft_cap is not None:
            scores = logit_soft_cap * jnp.tanh(scores / logit_soft_cap)
        kpos = p_blk[None, :]
        valid = kpos <= qpos[:, None] if is_causal else jnp.ones_like(kpos <= qpos[:, None])
        if sliding_window_size is not None:
            valid = valid & (kpos > qpos[:, None] - sliding_window_size)
        scores = jnp.where(valid[None, None], scores, NEG_INF)

        m_blk = jnp.max(scores, axis=-1)
        m_new = jnp.maximum(m_run, m_blk)
        alpha = jnp.exp(m_run - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l_run = l_run * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[..., None] + jnp.einsum("grsc,cgd->grsd", p, v_blk)
        m_run = m_new
        if step < n_devices - 1:
            blk = jax.lax.ppermute(blk, axis_name, perm)

    if sinks is not None:
        sink = sinks.astype(jnp.float32).reshape(g, rep)[:, :, None]
        m_new = jnp.maximum(m_run, sink)
        l_run = l_run * jnp.exp(m_run - m_new) + jnp.exp(sink - m_new)
        acc = acc * jnp.exp(m_run - m_new)[..., None]

    out = acc / jnp.maximum(l_run[..., None], 1e-30)
    return out.transpose(2, 0, 1, 3).reshape(s, h, dh).astype(q.dtype)


# --------------------------------------------------------------------------
# Sequence-parallel prefill over the decoder
# --------------------------------------------------------------------------


def make_sp_mesh(n: int | None = None, devices=None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    if n is not None:
        devices = devices[:n]
    return Mesh(np.asarray(devices), ("sp",))


def sequence_parallel_prefill(cfg, params, state, tokens, mesh: Mesh, axis: str = "sp"):
    """Prefill `tokens` with the token dimension sharded over `mesh[axis]`.

    params/state enter and leave replicated over the axis (the KV cache is
    written identically on every device from the gathered K/V); tokens are
    end-padded to a multiple of the axis size — padded rows land at future
    cache slots the causal mask hides, exactly like bucketed prefill.
    Returns (last_real_row_logits [V], new_state).
    """
    n = mesh.shape[axis]
    tokens = np.asarray(tokens, np.int32)
    true_len = len(tokens)
    s_pad = -(-true_len // n) * n
    padded = np.zeros(s_pad, np.int32)
    padded[:true_len] = tokens
    s_local = s_pad // n

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(axis), P()),
        out_specs=(P(axis), P()),
        check_rep=False,
    )
    def run(p, st, toks_local, tl):
        my = jax.lax.axis_index(axis)
        positions = st["pos"] + my * s_local + jnp.arange(s_local, dtype=jnp.int32)
        row = jnp.clip(tl - 1 - my * s_local, 0, s_local - 1)
        logits, new_state = decoder_forward(
            cfg,
            p,
            toks_local,
            st,
            last_only=True,
            true_length=tl,
            positions=positions,
            seq_axis=axis,
            readout_row=row,
        )
        return logits, new_state

    logits_n, new_state = jax.jit(run)(
        params, state, jnp.asarray(padded), jnp.asarray(true_len, jnp.int32)
    )
    owner = (true_len - 1) // s_local
    return logits_n[owner], new_state

"""Expert parallelism (EP): MoE experts sharded across devices, tokens
dispatched to their experts' owners with all-to-all collectives.

No reference counterpart — trymirai/uzu's MoE bucketing is intra-GPU
(SURVEY.md §2.7: "MoE expert-parallelism is intra-GPU bucketing, not EP
across devices"); this is the from-scratch multi-chip design the TPU build
adds. The shape is the classic capacity-based dispatch:

  router (replicated weights, local tokens)
    -> per-assignment destination = expert_id // experts_per_device
    -> capacity-bucketed send buffer [n_devices, capacity, D]
    -> all_to_all over ICI (tokens travel to their experts)
    -> local experts compute (masked dense over the device's E/n experts)
    -> all_to_all back
    -> weighted combine at the source rows

Assignments beyond `capacity` per destination are dropped (standard MoE
capacity semantics — the router's weight for that expert is simply lost).
With capacity >= S*K every assignment fits and the result equals the
single-device `moe_forward` exactly; tests pin this.

Runs INSIDE shard_map: expert-dim leaves of `params` must be sharded over
`axis_name` (each device sees its local [E/n, ...] slice); the router and
shared-expert weights must be replicated; x is the device-local token slice.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..config.model import MixtureOfExpertsConfig
from ..models.moe import _expert_hidden, router_topk


def moe_forward_ep(
    cfg: MixtureOfExpertsConfig,
    params: dict,
    x: jax.Array,  # [S_local, D]
    *,
    axis_name: str,
    capacity: int,
) -> jax.Array:
    n = jax.lax.axis_size(axis_name)
    s, d = x.shape
    e_total = cfg.num_routed_experts
    assert e_total % n == 0, (e_total, n)
    e_local = e_total // n
    kk = cfg.num_active_routed_experts
    dff = cfg.expert_hidden_dim

    ids, probs = router_topk(cfg, params, x)  # [S, K]
    a = s * kk
    flat_ids = ids.reshape(a)
    flat_probs = probs.reshape(a).astype(jnp.float32)
    src_row = jnp.repeat(jnp.arange(s, dtype=jnp.int32), kk)
    dest = flat_ids // e_local  # owning device per assignment
    eid_local = flat_ids % e_local

    # position of each assignment within its destination bucket (stable,
    # assignment order) — the role of the reference's MoeCountsOffsetsFused +
    # MoeScatterBucketsMap kernels, done as a cumsum over a one-hot
    onehot_dest = jax.nn.one_hot(dest, n, dtype=jnp.int32)  # [A, n]
    before = jnp.cumsum(onehot_dest, axis=0) - onehot_dest
    pos_in_dest = jnp.take_along_axis(before, dest[:, None], axis=1)[:, 0]
    keep = pos_in_dest < capacity
    slot = jnp.where(keep, dest * capacity + pos_in_dest, n * capacity)

    send_x = (
        jnp.zeros((n * capacity, d), x.dtype)
        .at[slot]
        .set(x[src_row], mode="drop")
        .reshape(n, capacity, d)
    )
    send_eid = (
        jnp.full((n * capacity,), -1, jnp.int32)
        .at[slot]
        .set(eid_local, mode="drop")
        .reshape(n, capacity)
    )

    recv_x = jax.lax.all_to_all(send_x, axis_name, 0, 0)
    recv_eid = jax.lax.all_to_all(send_eid, axis_name, 0, 0)

    # local expert compute: masked dense over this device's E/n experts
    # (every local expert weight is read once — the bandwidth-right regime;
    # a ragged grouped matmul that skips unrouted rows is a later kernel)
    xr = recv_x.reshape(n * capacity, d).astype(jnp.float32)
    er = recv_eid.reshape(n * capacity)
    valid = er >= 0
    from ..quant.format import StackedQuantized, dequantize_stacked

    w13 = params["up"]["w"]  # [E_local, 2*dff, D]
    w2 = params["down"]["w"]  # [E_local, D, dff]
    if isinstance(w13, StackedQuantized):
        # EP compute is the masked-dense (all-local-experts) regime —
        # materialize the local stacks transiently like the prefill paths
        w13 = dequantize_stacked(w13)
        w2 = dequantize_stacked(w2)
    up = jnp.einsum("ad,ehd->aeh", xr, w13.astype(jnp.float32))
    if "b" in params["up"]:
        up = up + params["up"]["b"].astype(jnp.float32)[None]
    hidden = _expert_hidden(cfg, up, dff)
    out = jnp.einsum("aeh,edh->aed", hidden, w2.astype(jnp.float32))
    if "b" in params["down"]:
        out = out + params["down"]["b"].astype(jnp.float32)[None]
    out = out[..., :d]  # down weights may be lane-padded to a 128 multiple
    sel = jax.nn.one_hot(jnp.clip(er, 0, e_local - 1), e_local, dtype=jnp.float32)
    sel = sel * valid[:, None].astype(jnp.float32)
    y_assign = jnp.einsum("aed,ae->ad", out, sel)  # [n*capacity, D]

    back = jax.lax.all_to_all(
        y_assign.reshape(n, capacity, d).astype(jnp.float32), axis_name, 0, 0
    )
    flat_back = back.reshape(n * capacity, d)
    contrib = flat_back[jnp.clip(slot, 0, n * capacity - 1)]
    contrib = contrib * (keep[:, None] & True).astype(jnp.float32)
    y = (
        jnp.zeros((s, d), jnp.float32)
        .at[src_row]
        .add(contrib * flat_probs[:, None])
    )

    if "shared" in params:
        xf = x.astype(jnp.float32)
        fused = jnp.einsum("sd,hd->sh", xf, params["shared"]["up"]["w"].astype(jnp.float32))
        half = fused.shape[-1] // 2
        hidden = _expert_hidden(cfg, fused, half)
        y = y + jnp.einsum(
            "sh,dh->sd", hidden, params["shared"]["down"]["w"].astype(jnp.float32)
        )
    return y.astype(x.dtype)


def default_capacity(num_tokens: int, cfg: MixtureOfExpertsConfig, n_devices: int,
                     factor: float = 1.25) -> int:
    """Per-destination bucket size: balanced load is S*K/n, padded by
    `factor` for routing skew and rounded up to a multiple of 8 (sublane)."""
    base = (num_tokens * cfg.num_active_routed_experts + n_devices - 1) // n_devices
    cap = int(base * factor)
    return max(8, -(-cap // 8) * 8)

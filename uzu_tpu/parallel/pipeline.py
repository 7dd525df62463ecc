"""Pipeline parallelism: stage-partitioned decoder over a ``pp`` mesh axis.

The reference has no multi-device execution at all (SURVEY.md §2.7); this is
the from-scratch TPU design for the axis TP cannot serve: spreading a model
across hosts where the interconnect (DCN) is too slow for per-layer
all-reduces. Stages exchange ONE activation tensor per microbatch per step
(ppermute ring) instead of two all-reduces per layer, so PP is the idiomatic
cross-host split for 70B-class serving while TP stays intra-slice.

Design (GPipe-style, shard_map + collective permute):

- The L transformer layers split into P contiguous stages of L/P layers.
  Stage parameters and KV caches are STACKED along a leading stage axis
  ([P, L/P, ...]) and sharded ``P("pp")``, so each device materializes only
  its own stage — this is what makes a model that cannot fit one device
  runnable.
- The batch splits into M microbatches. A fori_loop runs M+P-1 steps; at
  step t, stage p works on microbatch t-p (masked out when out of range)
  and passes its activation to stage p+1 with ``jax.lax.ppermute``. Every
  stage computes every step, so steady-state utilization is M/(M+P-1) per
  device — the standard pipeline bubble.
- Embedding lookup and logits readout stay OUTSIDE the shard_map (they need
  the replicated embedding table); the pipelined region is exactly the
  layer stack. Stage outputs accumulate on the last stage and are
  replicated with a masked psum on exit.

Constraints (validated): every layer must have the same config and param
structure (uniform attention decoders — the Llama/Qwen3 shape PP targets),
no cross-layer KV sharing, no per-layer embeddings.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config.model import AttentionConfig, DecoderConfig
from .mesh import TP_AXIS

PP_AXIS = "pp"


def make_pp_mesh(
    pp: int | None = None,
    tp: int = 1,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """(pp, tp) mesh: pipeline stages × tensor shards within each stage.
    On real topologies, lay pp over DCN (hosts) and tp over ICI."""
    devices = list(devices if devices is not None else jax.devices())
    if pp is None:
        pp = len(devices) // tp
    if pp * tp != len(devices):
        raise ValueError(f"pp*tp = {pp}*{tp} != {len(devices)} devices")
    return Mesh(np.asarray(devices).reshape(pp, tp), (PP_AXIS, TP_AXIS))


def validate_pp(cfg: DecoderConfig, pp: int) -> None:
    """Stages must be structurally identical so their params/KV stack along
    the pp axis: layer i of every stage needs the same config — i.e. the
    model's layer pattern must repeat with a period dividing L/P. Covers
    uniform attention decoders AND periodic hybrids (Qwen3.5's GDN+attn
    blocks, LFM2's ShortConv+attn) when the stage size is a multiple of
    the period."""
    tcfg = cfg.transformer_config
    n = len(tcfg.layer_configs)
    if n % pp:
        raise ValueError(f"pp={pp} must divide num_layers={n}")
    lp = n // pp
    for i, lc in enumerate(tcfg.layer_configs):
        if lc != tcfg.layer_configs[i % lp]:
            raise ValueError(
                f"layer {i}: stages are not structurally identical (layer "
                f"pattern must repeat with a period dividing L/P={lp})"
            )
        if lc.kv_source_layer_index is not None:
            raise ValueError(f"layer {i}: KV sharing is unsupported under pp")
    if cfg.ple_model_config is not None:
        raise ValueError("pipeline does not support per-layer embeddings")


def _stack_stages(trees):
    """List of identical-structure pytrees (one per stage) -> one pytree of
    [P, ...]-stacked leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def stack_pipeline_params(cfg: DecoderConfig, params: dict, mesh: Mesh) -> dict:
    """Per slot-in-stage index i, stack layer (j*L/P + i) across stages j
    into [P, ...] leaves sharded over pp — a LIST of L/P stacked trees
    (hybrid patterns give different tree structures per slot, e.g. GDN vs
    attention). Per-layer Megatron TP specs (heads/hidden over tp) apply to
    the trailing dims when the mesh carries a tp axis. Non-layer params
    (embedding, output norm) are replicated."""
    from .sharding import _layer_specs, validate_tp

    pp = mesh.shape[PP_AXIS]
    tp = mesh.shape.get(TP_AXIS, 1)
    validate_pp(cfg, pp)
    if tp > 1:
        validate_tp(cfg, tp)
    lp = len(cfg.transformer_config.layer_configs) // pp
    layers = []
    for i in range(lp):
        stacked = _stack_stages([params["layers"][j * lp + i] for j in range(pp)])
        inner = _layer_specs(
            cfg.transformer_config.layer_configs[i], params["layers"][i], mesh
        )
        # prefix-spec tree: prepend the stage dim to each layer spec;
        # device_put broadcasts a spec leaf over QuantizedTensor/Hybrid
        # subtrees
        spec = jax.tree.map(
            lambda ns: NamedSharding(mesh, P(PP_AXIS, *ns.spec)), inner
        )
        layers.append(jax.device_put(stacked, spec))
    rep = NamedSharding(mesh, P())
    return {
        "layers": layers,
        "embedding": jax.device_put(params["embedding"], jax.tree.map(lambda _: rep, params["embedding"])),
        "output_norm": jax.device_put(params["output_norm"], jax.tree.map(lambda _: rep, params["output_norm"])),
    }


def _state_inner_spec(name: str, trail: int, is_attn: bool):
    """Trailing-dim tp placement for a stacked state leaf: attention caches
    shard the kv-head dim ([C, G, Dh] / [C, G] scales); recurrent states
    shard channels (conv [k-1, D]) or heads (ssm [H, dv, dk]). ALWAYS
    annotated, even at tp=1 — the sharding propagation inside the pipelined
    region needs cache and appended K/V types to agree."""
    if is_attn:
        if trail >= 2:
            return (None, TP_AXIS) + (None,) * (trail - 2)
        return (None,) * trail
    if name == "conv" and trail == 2:
        return (None, TP_AXIS)
    if name == "ssm" and trail == 3:
        return (TP_AXIS, None, None)
    return (None,) * trail


def stack_pipeline_states(cfg: DecoderConfig, states: dict, mesh: Mesh, microbatches: int) -> dict:
    """Batched states {'layers': [per-layer leaves [B, ...]], 'pos': [B]} ->
    {'kv': list of L/P trees with leaves [P, M, B/M, ...] sharded pp,
    'pos': [B] replicated}."""
    pp = mesh.shape[PP_AXIS]
    lcfgs = cfg.transformer_config.layer_configs
    lp = len(lcfgs) // pp
    b = states["pos"].shape[0]
    if b % microbatches:
        raise ValueError(f"batch {b} must divide into {microbatches} microbatches")
    mb = b // microbatches
    kv = []
    for i in range(lp):
        stacked = _stack_stages([states["layers"][j * lp + i] for j in range(pp)])
        stacked = jax.tree.map(
            lambda a: a.reshape(pp, microbatches, mb, *a.shape[2:]), stacked
        )
        is_attn = isinstance(lcfgs[i].mixer_config, AttentionConfig)
        spec = {
            k: NamedSharding(
                mesh,
                P(PP_AXIS, None, None, *_state_inner_spec(k, v.ndim - 3, is_attn)),
            )
            for k, v in stacked.items()
        }
        kv.append(jax.device_put(stacked, spec))
    rep = NamedSharding(mesh, P())
    return {
        "kv": kv,
        "pos": jax.device_put(states["pos"], rep),
    }


def unstack_pipeline_states(states: dict) -> dict:
    """Inverse of stack_pipeline_states (for parity checks)."""
    lp = len(states["kv"])
    pp = next(iter(jax.tree.leaves(states["kv"][0]))).shape[0]
    layers = [None] * (pp * lp)
    for i, tree in enumerate(states["kv"]):
        flat = jax.tree.map(
            lambda a: a.reshape(a.shape[0], a.shape[1] * a.shape[2], *a.shape[3:]),
            tree,
        )
        for j in range(pp):
            layers[j * lp + i] = jax.tree.map(lambda a: a[j], flat)
    return {"layers": layers, "pos": states["pos"]}


def pipeline_forward(
    cfg: DecoderConfig,
    pp_params: dict,
    tokens: jax.Array,  # [B, S] int32
    pp_states: dict,
    mesh: Mesh,
    *,
    microbatches: int,
    true_lengths: jax.Array | None = None,  # [B], default S
):
    """One pipelined forward (prefill chunk or decode step) over the whole
    batch; returns (last-row logits [B, V], new pp_states). Matches the
    vmapped single-device `decoder_forward(last_only=True)` step."""
    from ..models.decoder import embedding_lookup, embedding_readout, layer_forward
    from ..ops.norm import normalize

    tcfg = cfg.transformer_config
    pp = mesh.shape[PP_AXIS]
    lp = len(tcfg.layer_configs) // pp
    slot_cfgs = tcfg.layer_configs[:lp]  # identical across stages (validated)
    b, s = tokens.shape
    m = microbatches
    mb = b // m
    if true_lengths is None:
        true_lengths = jnp.full((b,), s, jnp.int32)

    ecfg = cfg.embedding_config
    table = pp_params["embedding"].get("tied", pp_params["embedding"].get("input"))
    x = embedding_lookup(table, tokens.reshape(b * s)).reshape(b, s, -1)
    if ecfg.input_scale is not None:
        x = (x.astype(jnp.float32) * ecfg.input_scale).astype(x.dtype)

    pos = pp_states["pos"]  # [B]
    positions = pos[:, None] + jnp.arange(s, dtype=jnp.int32)[None, :]  # [B, S]
    d = x.shape[-1]
    xs = x.reshape(m, mb, s, d)
    pos_m = positions.reshape(m, mb, s)
    tl_m = true_lengths.reshape(m, mb)

    def stage_apply(sp, kv_m, xm, posm, tlm):
        """Apply this stage's L/P layers to one microbatch ([mb, S, D]);
        sp / kv_m are LISTS of per-slot trees (hybrids mix mixer types)."""
        new_kv = []
        for i in range(lp):
            p_i, kv_i, lc = sp[i], kv_m[i], slot_cfgs[i]

            def one(xi, posi, kvi, tli):
                return layer_forward(lc, p_i, xi, posi, kvi, None, tli)

            xm, kv_new = jax.vmap(one)(xm, posm, kv_i, tlm)
            new_kv.append(kv_new)
        return xm, new_kv

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P(PP_AXIS), pp_params["layers"]),
            jax.tree.map(lambda _: P(PP_AXIS), pp_states["kv"]),
            P(),
            P(),
            P(),
        ),
        out_specs=(P(), jax.tree.map(lambda _: P(PP_AXIS), pp_states["kv"])),
        axis_names={PP_AXIS},  # pp is manual (the ppermute ring); tp stays
        # auto so GSPMD shards each stage's head/hidden math from the
        # operand shardings — PP over DCN composing with TP over ICI.
        # check_vma must stay True: the check_vma=False eager path rewraps
        # outputs over ALL mesh axes and trips on the auto tp axis
        check_vma=True,
    )
    def pp_run(stage_params, kv, xs, pos_m, tl_m):
        # local views: per-slot trees with leading stage dim 1
        stage_params = jax.tree.map(lambda a: a[0], stage_params)
        kv = jax.tree.map(lambda a: a[0], kv)
        p = jax.lax.axis_index(PP_AXIS)
        last = pp - 1
        perm = [(i, (i + 1) % pp) for i in range(pp)]
        # loop carries must be pp-varying from the start (the vma type
        # system unifies them with the ppermute/stage outputs)
        outs0 = jax.lax.pvary(jnp.zeros((m, mb, s, d), xs.dtype), PP_AXIS)
        x0 = jax.lax.pvary(jnp.zeros((mb, s, d), xs.dtype), PP_AXIS)

        def step(t, carry):
            x_cur, outs, kv = carry
            mi = t - p  # microbatch this stage works on (may be out of range)
            mc = jnp.clip(mi, 0, m - 1)
            active = (mi >= 0) & (mi < m)
            x_in = jnp.where(p == 0, jax.lax.dynamic_index_in_dim(xs, mc, keepdims=False), x_cur)
            kv_m = jax.tree.map(
                lambda a: jax.lax.dynamic_index_in_dim(a, mc, axis=0, keepdims=False), kv
            )
            posm = jax.lax.dynamic_index_in_dim(pos_m, mc, keepdims=False)
            tlm = jax.lax.dynamic_index_in_dim(tl_m, mc, keepdims=False)
            y, kv_new = stage_apply(stage_params, kv_m, x_in, posm, tlm)
            # masked state/result writes: inactive steps keep everything
            kv = jax.tree.map(
                lambda a, old, new: jax.lax.dynamic_update_index_in_dim(
                    a, jnp.where(active, new, old), mc, axis=0
                ),
                kv, kv_m, kv_new,
            )
            write = (p == last) & active
            prev = jax.lax.dynamic_index_in_dim(outs, mc, keepdims=False)
            outs = jax.lax.dynamic_update_index_in_dim(
                outs, jnp.where(write, y, prev), mc, axis=0
            )
            x_next = jax.lax.ppermute(y, PP_AXIS, perm)
            return x_next, outs, kv

        _, outs, kv = jax.lax.fori_loop(0, m + pp - 1, step, (x0, outs0, kv))
        # only the last stage wrote outs; psum replicates it across stages.
        # The reduce runs in f32: XLA CPU fatally rejects a bf16 psum in
        # partial-manual mode ("Invalid binary instruction opcode copy"),
        # and one [M, mb, S, D] upcast per forward is noise anyway.
        outs = jax.lax.psum(
            jnp.where(p == last, outs, jnp.zeros_like(outs)).astype(jnp.float32),
            PP_AXIS,
        ).astype(outs.dtype)
        kv = jax.tree.map(lambda a: a[None], kv)
        return outs, kv

    outs, new_kv = pp_run(pp_params["layers"], pp_states["kv"], xs, pos_m, tl_m)
    h = outs.reshape(b, s, d)

    def readout(hi, tl):
        hn = normalize(
            hi, tcfg.output_norm_config, pp_params["output_norm"]["scales"],
            pp_params["output_norm"].get("biases"),
        )
        row = jax.lax.dynamic_slice_in_dim(hn, tl - 1, 1, axis=0)
        out_table = pp_params["embedding"].get("tied", pp_params["embedding"].get("output"))
        return embedding_readout(out_table, row, ecfg.logit_soft_cap)[0]

    logits = jax.vmap(readout)(h, true_lengths)
    new_states = {"kv": new_kv, "pos": pos + true_lengths.astype(jnp.int32)}
    return logits, new_states

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
    tcfg = cfg.transformer_config
    n = len(tcfg.layer_configs)
    if n % pp:
        raise ValueError(f"pp={pp} must divide num_layers={n}")
    first = tcfg.layer_configs[0]
    for i, lc in enumerate(tcfg.layer_configs):
        if not isinstance(lc.mixer_config, AttentionConfig):
            raise ValueError(f"layer {i}: pipeline v1 supports attention mixers only")
        if lc != first:
            raise ValueError(f"layer {i}: pipeline stages need uniform layer configs")
        if lc.kv_source_layer_index is not None:
            raise ValueError(f"layer {i}: KV sharing crosses stage boundaries")
    if cfg.ple_model_config is not None:
        raise ValueError("pipeline v1 does not support per-layer embeddings")


def _stack_layers(trees):
    """List of identical-structure pytrees -> one pytree of stacked leaves."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *trees)


def stack_pipeline_params(cfg: DecoderConfig, params: dict, mesh: Mesh) -> dict:
    """Reshape the per-layer param list to [P, L/P, ...] leaves sharded over
    pp, with the per-layer Megatron TP specs (heads/hidden over tp) applied
    to the trailing dims when the mesh carries a tp axis. Non-layer params
    (embedding, output norm) are replicated."""
    from .sharding import _layer_specs, validate_tp

    pp = mesh.shape[PP_AXIS]
    tp = mesh.shape.get(TP_AXIS, 1)
    validate_pp(cfg, pp)
    if tp > 1:
        validate_tp(cfg, tp)
    stacked = _stack_layers(params["layers"])
    stacked = jax.tree.map(
        lambda a: a.reshape(pp, a.shape[0] // pp, *a.shape[1:]), stacked
    )
    inner = _layer_specs(
        cfg.transformer_config.layer_configs[0], params["layers"][0], mesh
    )
    # prefix-spec tree: prepend (pp, layer-in-stage) dims to each layer spec;
    # device_put broadcasts a spec leaf over QuantizedTensor/Hybrid subtrees
    spec = jax.tree.map(
        lambda ns: NamedSharding(mesh, P(PP_AXIS, None, *ns.spec)), inner
    )
    rep = NamedSharding(mesh, P())
    out = {
        "layers": jax.device_put(stacked, spec),
        "embedding": jax.device_put(params["embedding"], jax.tree.map(lambda _: rep, params["embedding"])),
        "output_norm": jax.device_put(params["output_norm"], jax.tree.map(lambda _: rep, params["output_norm"])),
    }
    return out


def stack_pipeline_states(cfg: DecoderConfig, states: dict, mesh: Mesh, microbatches: int) -> dict:
    """Batched states {'layers': [per-layer leaves [B, ...]], 'pos': [B]} ->
    {'kv': leaves [P, L/P, M, B/M, ...] sharded pp, 'pos': [B] replicated}."""
    pp = mesh.shape[PP_AXIS]
    b = states["pos"].shape[0]
    if b % microbatches:
        raise ValueError(f"batch {b} must divide into {microbatches} microbatches")
    mb = b // microbatches
    kv = _stack_layers(states["layers"])  # [L, B, ...]
    kv = jax.tree.map(
        lambda a: a.reshape(pp, a.shape[0] // pp, microbatches, mb, *a.shape[2:]), kv
    )
    def kv_spec(a):
        # trailing dims after [P, Lp, M, mb]: [C, G, Dh] / [C, G] scales get
        # the kv-head dim over tp (ALWAYS annotated, even at tp=1 — the
        # explicit-sharding propagation inside the pipelined region needs
        # cache and appended K/V types to agree); [C] ring pos replicated
        trail = a.ndim - 4
        if trail >= 2:
            inner = (None, TP_AXIS) + (None,) * (trail - 2)
        else:
            inner = (None,) * trail
        return NamedSharding(mesh, P(PP_AXIS, None, None, None, *inner))

    spec = jax.tree.map(kv_spec, kv)
    rep = NamedSharding(mesh, P())
    return {
        "kv": jax.device_put(kv, spec),
        "pos": jax.device_put(states["pos"], rep),
    }


def unstack_pipeline_states(states: dict) -> dict:
    """Inverse of stack_pipeline_states (for parity checks)."""
    kv = jax.tree.map(
        lambda a: a.reshape(a.shape[0] * a.shape[1], a.shape[2] * a.shape[3], *a.shape[4:]),
        states["kv"],
    )
    n_layers = next(iter(jax.tree.leaves(kv))).shape[0]
    layers = [jax.tree.map(lambda a: a[i], kv) for i in range(n_layers)]
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
    layer_cfg = tcfg.layer_configs[0]
    pp = mesh.shape[PP_AXIS]
    lp = len(tcfg.layer_configs) // pp
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
        """Apply this stage's L/P layers to one microbatch ([mb, S, D])."""
        for i in range(lp):
            p_i = jax.tree.map(lambda a: a[i], sp)
            kv_i = jax.tree.map(lambda a: a[i], kv_m)

            def one(xi, posi, kvi, tli):
                return layer_forward(layer_cfg, p_i, xi, posi, kvi, None, tli)

            xm, kv_new = jax.vmap(one)(xm, posm, kv_i, tlm)
            kv_m = jax.tree.map(
                lambda a, new: a.at[i].set(new), kv_m, kv_new
            )
        return xm, kv_m

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
        # local views: stage_params [1, L/P, ...], kv [1, L/P, M, mb, ...]
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
                lambda a: jax.lax.dynamic_index_in_dim(a, mc, axis=1, keepdims=False), kv
            )
            posm = jax.lax.dynamic_index_in_dim(pos_m, mc, keepdims=False)
            tlm = jax.lax.dynamic_index_in_dim(tl_m, mc, keepdims=False)
            y, kv_new = stage_apply(stage_params, kv_m, x_in, posm, tlm)
            # masked state/result writes: inactive steps keep everything
            kv = jax.tree.map(
                lambda a, old, new: jax.lax.dynamic_update_index_in_dim(
                    a, jnp.where(active, new, old), mc, axis=1
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

"""Mixture-of-experts block.

Reference semantics (crates/backend-uzu/src/encodable_block/mlp/moe/mod.rs +
backends/cpu/kernel/moe/{router_topk,experts_two_pass_decode,finalize}.rs and
the metal experts_two_pass_decode.metal):
- router: logits = x @ Wr^T + br, top-k (ties -> lower expert id);
  SoftmaxRouting renormalizes the k selected logits with softmax, otherwise
  raw logits are the combine weights;
- expert: w13 [E, 2*dff, D] rows are [up | gate]; up/gate biases in
  up_biases [E, 2*dff]; clipping applied after bias; hidden =
  act(gate) * up (gating_sel>1 path; act = SiLU or GELU);
- down: w2 [E, D, dff] + down_biases [E, D];
- finalize: y = sum_k prob_k * expert_out_k.

TPU design — two data paths mirroring the reference's decode/prefill split,
but chosen by arithmetic instead of kernel variants:
- few tokens (decode steps): gather the K active experts' weight slices and
  einsum — HBM reads only the active experts' weights (the property that
  makes MoE decode fast);
- many tokens (prefill): static loop over experts with a routed-probability
  mask — every expert weight is read once regardless of batch, which is the
  right bandwidth regime once most experts are hit. (A Pallas ragged grouped
  matmul is the later optimization.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import MixtureOfExpertsConfig, SoftmaxRouting
from ..ops.activation import apply_activation

# At/below this many tokens, gather active expert weights instead of looping
# over all experts (reads K instead of E expert blocks from HBM).
GATHER_PATH_MAX_TOKENS = 4

# At/above this many tokens the grouped (expert-sorted, tile-padded) Pallas
# matmul replaces the masked-dense loop: E/K_active x fewer MXU FLOPs (ref:
# experts_two_pass_prefill.metal:23 — the reference's prefill is also a
# routed-tile pipeline, never dense). Threshold measured on chip (r3
# exp_grouped_moe, gpt-oss dims d=dff=2880 E=32 K=4): below ~1k tokens
# BOTH paths are bound by streaming every hit expert's weights (grouped
# 0.84x at S=256, 0.92x at 512 — the gather/scatter isn't paid back);
# at S=1024 grouped is 1.8x and keeps improving (8.2 us/tok at 2048,
# where the dense [S, E, 2dff] f32 intermediate is also prohibitive).
GROUPED_PATH_MIN_TOKENS = 1024
_GROUPED_BM = 64


def router_topk(cfg: MixtureOfExpertsConfig, params, x: jax.Array):
    """x [S, D] -> (ids [S, K] int32, probs [S, K] f32)."""
    logits = jnp.einsum(
        "sd,ed->se", x.astype(jnp.float32), params["router"]["w"].astype(jnp.float32)
    )
    if "b" in params["router"]:
        logits = logits + params["router"]["b"].astype(jnp.float32)
    k = cfg.num_active_routed_experts
    vals, ids = jax.lax.top_k(logits, k)  # ties -> lower index (stable)
    if isinstance(cfg.routing_function, SoftmaxRouting):
        probs = jax.nn.softmax(vals, axis=-1)
    else:
        probs = vals
    return ids.astype(jnp.int32), probs


def _expert_hidden(cfg: MixtureOfExpertsConfig, up_out: jax.Array, dff: int):
    """up_out [..., 2*dff] (biases already added) -> hidden [..., dff]."""
    ecfg = cfg.expert_config
    up, gate = up_out[..., :dff], up_out[..., dff:]
    if ecfg.up_clipping is not None:
        lo, hi = ecfg.up_clipping
        up = jnp.clip(up, lo if lo is not None else -jnp.inf, hi if hi is not None else jnp.inf)
    if ecfg.gate_clipping is not None:
        lo, hi = ecfg.gate_clipping
        gate = jnp.clip(gate, lo if lo is not None else -jnp.inf, hi if hi is not None else jnp.inf)
    return apply_activation(ecfg.activation, gate) * up


def _grouped_supported(cfg: MixtureOfExpertsConfig, d: int, n_down: int) -> bool:
    from ..ops.pallas.grouped_matmul import supports

    dff = cfg.expert_hidden_dim
    return supports(2 * dff, d) and supports(n_down, dff)


def _grouped_forward(cfg: MixtureOfExpertsConfig, params, x, ids, probs,
                     *, interpret: bool = False) -> jax.Array:
    """Expert-sorted tile-padded prefill: both expert matmuls run as grouped
    Pallas kernels over only the routed tokens (plus tile padding)."""
    from ..ops.pallas.grouped_matmul import grouped_matmul, route_layout

    s, d = x.shape
    dff = cfg.expert_hidden_dim
    e = cfg.num_routed_experts
    k = cfg.num_active_routed_experts
    w13, w2 = params["up"]["w"], params["down"]["w"]
    up_b, down_b = params["up"].get("b"), params["down"].get("b")

    flat_e = ids.reshape(s * k)
    order, dst, tile_expert, used, row_expert = route_layout(
        flat_e, e, _GROUPED_BM)
    tp = row_expert.shape[0]

    # scatter token rows (replicated per active expert) into the padded
    # expert-sorted buffer; padding rows stay zero
    x_rows = x[order // k].astype(w13.dtype)
    x_pad = jnp.zeros((tp, d), w13.dtype).at[dst].set(x_rows)

    up_out = grouped_matmul(x_pad, w13, tile_expert, used,
                            bm=_GROUPED_BM, interpret=interpret)
    if up_b is not None:
        up_out = up_out + jnp.take(up_b, row_expert, axis=0).astype(jnp.float32)
    hidden = _expert_hidden(cfg, up_out, dff).astype(w2.dtype)
    out = grouped_matmul(hidden, w2, tile_expert, used,
                         bm=_GROUPED_BM, interpret=interpret)
    if down_b is not None:
        out = out + jnp.take(down_b, row_expert, axis=0).astype(jnp.float32)

    # gather real-token rows back, weight by routing prob, combine per token
    n_down = w2.shape[1]
    vals = out[dst] * probs.reshape(s * k)[order][:, None]
    return jnp.zeros((s, n_down), jnp.float32).at[order // k].add(vals)


def _grouped_quant_forward(cfg: MixtureOfExpertsConfig, params, x, ids,
                           probs, *, interpret: bool = False) -> jax.Array:
    """_grouped_forward over StackedQuantized expert weights: identical
    routed layout, in-kernel INT4 dequant (no dense stack materialized)."""
    from ..ops.pallas.grouped_matmul import grouped_matmul_quant, route_layout

    s, d = x.shape
    dff = cfg.expert_hidden_dim
    e = cfg.num_routed_experts
    k = cfg.num_active_routed_experts
    w13, w2 = params["up"]["w"], params["down"]["w"]
    up_b, down_b = params["up"].get("b"), params["down"].get("b")

    flat_e = ids.reshape(s * k)
    order, dst, tile_expert, used, row_expert = route_layout(
        flat_e, e, _GROUPED_BM)
    tp = row_expert.shape[0]

    x_rows = x[order // k].astype(jnp.float32)
    x_pad = jnp.zeros((tp, d), jnp.float32).at[dst].set(x_rows)

    up_out = grouped_matmul_quant(x_pad, w13, tile_expert, used,
                                  bm=_GROUPED_BM, interpret=interpret)
    if up_b is not None:
        up_out = up_out + jnp.take(up_b, row_expert, axis=0).astype(jnp.float32)
    hidden = _expert_hidden(cfg, up_out, dff).astype(jnp.float32)
    out = grouped_matmul_quant(hidden, w2, tile_expert, used,
                               bm=_GROUPED_BM, interpret=interpret)
    n_down = w2.shape[1]
    if down_b is not None:
        out = out + jnp.take(down_b, row_expert, axis=0
                             ).astype(jnp.float32)[:, :n_down]
    vals = out[dst] * probs.reshape(s * k)[order][:, None]
    return jnp.zeros((s, n_down), jnp.float32).at[order // k].add(vals)


def moe_forward(cfg: MixtureOfExpertsConfig, params, x: jax.Array) -> jax.Array:
    from ..quant.format import StackedQuantized, dequantize_stacked

    s, d = x.shape
    dff = cfg.expert_hidden_dim
    ids, probs = router_topk(cfg, params, x)
    xf = x.astype(jnp.float32)

    w13 = params["up"]["w"]
    w2 = params["down"]["w"]
    up_b = params["up"].get("b")
    down_b = params["down"].get("b")

    quantized = isinstance(w13, StackedQuantized)
    if quantized and s > GATHER_PATH_MAX_TOKENS:
        from ..ops.pallas.grouped_matmul import supports_quant
        from ..runtime import on_tpu, use_pallas

        if use_pallas() and supports_quant(w13) and supports_quant(w2):
            # grouped kernel with IN-KERNEL dequant: expert code blocks
            # stream straight from the stacked INT4 arrays. The XLA
            # alternative below materializes the FULL bf16 stacks per
            # chunk (E/K_active x more transient write+read bytes than
            # the routed weights — gptoss_small prefill measured 16.1k
            # -> 10.2k tok/s when experts went INT4 under it), so the
            # quantized grouped path engages at EVERY width above the
            # gather threshold, not just GROUPED_PATH_MIN_TOKENS.
            return _finish_moe(
                cfg, params, xf,
                _grouped_quant_forward(cfg, params, x, ids, probs,
                                       interpret=not on_tpu())[:, :d],
                x.dtype)
        # prefill widths are compute-bound — materialize the dense stacks
        # once per chunk (transient) and take the existing routed paths;
        # DECODE keeps the codes resident and reads only active experts
        w13 = dequantize_stacked(w13)
        w2 = dequantize_stacked(w2)
        # quantized stacks (and their biases) are already lane-padded at
        # load; dense fallback stacks may still need it
        dpad = (-w2.shape[1]) % 128
        if dpad:
            w2 = jnp.pad(w2, ((0, 0), (0, dpad), (0, 0)))
            if down_b is not None:
                down_b = jnp.pad(down_b, ((0, 0), (0, dpad)))
        # the grouped path reads params directly — hand it the dense views
        params = {**params, "up": {**params["up"], "w": w13},
                  "down": {**params["down"], "w": w2}}
        if down_b is not None:
            params["down"]["b"] = down_b
        quantized = False

    grouped = None
    if s >= GROUPED_PATH_MIN_TOKENS and _grouped_supported(cfg, d, w2.shape[1]):
        from ..runtime import use_pallas

        if use_pallas():
            grouped = _grouped_forward(cfg, params, x, ids, probs)

    if grouped is not None:
        y = grouped[:, :d]  # down weights may be lane-padded past d
    elif s <= GATHER_PATH_MAX_TOKENS:
        # gather path: scan over the S*K (token, expert) pairs with
        # dynamic_slice feeding the dot DIRECTLY. jnp.take materializes a
        # gathered [S, K, 2dff, D] copy in HBM first (read + write + read:
        # measured 76.5 GB/s effective on chip); the fused slice reads each
        # selected expert's weights once (521 GB/s, 6.8x —
        # tools/exp_moe_decode.py, CHIP_JOBS_r3.log moe_decode_paths).
        # Dots stay f32 so decode == teacher-forced prefill bit-exact.
        # Quantized expert stacks slice codes+scales the same way (4x
        # fewer bytes) and dequantize into the dot.
        from ..quant.format import dequantize

        n_down = d if quantized else w2.shape[1]
        flat_ids = ids.reshape(s * cfg.num_active_routed_experts)
        flat_probs = probs.reshape(s * cfg.num_active_routed_experts)
        tok = jnp.repeat(jnp.arange(s), cfg.num_active_routed_experts)

        if quantized:
            from ..ops.pallas.moe_gemv import moe_expert_gemv as _gemv
            from ..ops.pallas.moe_gemv import supported
            from ..runtime import on_tpu, use_pallas

            if use_pallas() and supported(w13) and supported(w2):
                # forced-pallas on CPU runs the kernel in interpreter mode
                # (same dispatch rule as ops/attention.py:87)
                moe_expert_gemv = functools.partial(
                    _gemv, interpret=not on_tpu())
                # one fused kernel per expert matmul: the P = S*K pair ids
                # ride scalar prefetch and index the stacked codes in
                # place — no per-expert dynamic-slice copies, no f32
                # dequant materialization, 2 launches/layer instead of
                # 2*S*K (ops/pallas/moe_gemv.py)
                x_pairs = xf[tok]
                up_out = moe_expert_gemv(w13, x_pairs, flat_ids)
                if up_b is not None:
                    up_out = up_out + jnp.take(
                        up_b, flat_ids, axis=0).astype(jnp.float32)
                hidden = _expert_hidden(cfg, up_out, dff)
                out = moe_expert_gemv(w2, hidden, flat_ids)[:, :n_down]
                if down_b is not None:
                    out = out + jnp.take(
                        down_b, flat_ids, axis=0).astype(jnp.float32)[:, :n_down]
                y = jnp.zeros((s, n_down), jnp.float32).at[tok].add(
                    flat_probs[:, None] * out)
                return _finish_moe(cfg, params, xf, y[:, :d], x.dtype)

        def one(acc, args):
            idx, p, t = args
            xr = jax.lax.dynamic_index_in_dim(xf, t, 0, keepdims=False)
            if quantized:
                w13_e = dequantize(w13.expert(idx), jnp.float32)
                w2_e = dequantize(w2.expert(idx), jnp.float32)
            else:
                w13_e = jax.lax.dynamic_index_in_dim(
                    w13, idx, 0, keepdims=False).astype(jnp.float32)
                w2_e = jax.lax.dynamic_index_in_dim(
                    w2, idx, 0, keepdims=False).astype(jnp.float32)
            up_out = xr @ w13_e.T
            if up_b is not None:
                up_out = up_out + jax.lax.dynamic_index_in_dim(
                    up_b, idx, 0, keepdims=False).astype(jnp.float32)
            hidden = _expert_hidden(cfg, up_out, dff)
            # quantized down stacks are lane-padded at load: slice back
            out = (w2_e @ hidden)[:n_down] if quantized else w2_e @ hidden
            if down_b is not None:
                db = jax.lax.dynamic_index_in_dim(
                    down_b, idx, 0, keepdims=False).astype(jnp.float32)
                out = out + (db[:n_down] if quantized else db)
            return acc.at[t].add(p * out), None

        y, _ = jax.lax.scan(
            one, jnp.zeros((s, n_down), jnp.float32),
            (flat_ids, flat_probs, tok))
        y = y[:, :d]
    else:
        # dense path: every expert computes over all tokens, masked combine
        # weight[s, e] = prob of expert e for token s (0 if not routed)
        e = cfg.num_routed_experts
        onehot = jax.nn.one_hot(ids, e, dtype=jnp.float32)  # [S, K, E]
        weight = jnp.einsum("ske,sk->se", onehot, probs)  # [S, E]
        up_out = jnp.einsum("sd,ehd->seh", xf, w13.astype(jnp.float32))
        if up_b is not None:
            up_out = up_out + up_b.astype(jnp.float32)[None]
        hidden = _expert_hidden(cfg, up_out, dff)
        out = jnp.einsum("seh,edh->sed", hidden, w2.astype(jnp.float32))
        if down_b is not None:
            out = out + down_b.astype(jnp.float32)[None]
        y = jnp.einsum("sed,se->sd", out, weight)[:, :d]

    return _finish_moe(cfg, params, xf, y, x.dtype)


def _finish_moe(cfg: MixtureOfExpertsConfig, params, xf, y, dtype):
    if "shared" in params:
        # shared experts run densely for every token (DeepSeek-style)
        fused = jnp.einsum("sd,hd->sh", xf, params["shared"]["up"]["w"].astype(jnp.float32))
        half = fused.shape[-1] // 2
        hidden = _expert_hidden(cfg, fused, half)
        y = y + jnp.einsum(
            "sh,dh->sd", hidden, params["shared"]["down"]["w"].astype(jnp.float32)
        )
    return y.astype(dtype)


def _load_expert_stack(experts, role: str, e: int, n: int, kdim: int):
    """One expert weight stack: dense [E, N, K] float, or — when the role
    carries a symmetric IntSpec in metadata — a StackedQuantized (the INT4
    analogue of gpt-oss's MXFP4 experts; decode reads only the K active
    experts' codes, 4x fewer bytes than bf16)."""
    from ..config.model import IntSpec
    from ..params.tree import ParameterError
    from ..quant.format import StackedQuantized
    from .loader import _weights_dtype

    sub = experts.subtree(f"{role}.weights")
    try:
        spec = experts.subtree(role).spec("weights")
    except ParameterError:
        spec = None
    if spec is None:
        dt = _weights_dtype(sub, "weights")
        return jnp.asarray(sub.leaf("weights", (e, n, kdim), dt)), dt
    if not (isinstance(spec, IntSpec) and spec.is_symmetric
            and spec.bits in (4, 8)):
        raise ParameterError(
            f"expert stacks support symmetric IntSpec only, got {spec}")
    pack = 8 // spec.bits
    kg = -(-kdim // spec.group_size)
    dt = _weights_dtype(sub, "scales")
    codes = sub.leaf("weights", (e, n, kdim // pack), np.uint8)
    scales = sub.leaf("scales", (e, n, kg), dt)
    return StackedQuantized(
        codes=jnp.asarray(codes), scales=jnp.asarray(scales),
        bits=spec.bits, group_size=spec.group_size,
        qbias_coeff=-float(1 << (spec.bits - 1)),
    ), dt


def load_moe(tree, cfg: MixtureOfExpertsConfig, model_dim: int) -> dict:
    """Tensor names per the reference (moe/mod.rs:119-160)."""
    from ..quant.format import StackedQuantized
    from .loader import load_linear

    e, dff = cfg.num_routed_experts, cfg.expert_hidden_dim
    out = {
        "router": load_linear(
            tree.subtree("router"), model_dim, e, cfg.router_has_biases
        )
    }
    experts = tree.subtree("experts")
    w13, dt = _load_expert_stack(experts, "up_projection", e, 2 * dff,
                                 model_dim)
    out["up"] = {"w": w13}
    # down-projection output dim is lane-padded to a 128 multiple so the
    # grouped prefill + gather GEMV kernels can tile models like gpt-oss
    # (d=2880 -> 2944); every forward path slices the result back to
    # model_dim. Quantized stacks pad codes AND scales rows (zero rows
    # dequantize to zero — sliced off before the combine).
    dpad = (-model_dim) % 128
    w2, _ = _load_expert_stack(experts, "down_projection", e, model_dim, dff)
    if dpad:
        if isinstance(w2, StackedQuantized):
            w2 = StackedQuantized(
                codes=jnp.pad(w2.codes, ((0, 0), (0, dpad), (0, 0))),
                scales=jnp.pad(w2.scales, ((0, 0), (0, dpad), (0, 0))),
                bits=w2.bits, group_size=w2.group_size,
                qbias_coeff=w2.qbias_coeff,
            )
        else:
            w2 = jnp.pad(w2, ((0, 0), (0, dpad), (0, 0)))
    out["down"] = {"w": w2}
    if cfg.expert_config.has_up_biases:
        out["up"]["b"] = jnp.asarray(
            experts.leaf("up_projection.biases", (e, 2 * dff), dt)
        )
    if cfg.expert_config.has_down_biases:
        b2 = jnp.asarray(experts.leaf("down_projection.biases", (e, model_dim), dt))
        if dpad:
            b2 = jnp.pad(b2, ((0, 0), (0, dpad)))
        out["down"]["b"] = b2
    if cfg.num_shared_experts:
        shared = tree.subtree("shared_experts")
        out["shared"] = {
            "up": load_linear(
                shared.subtree("up_projection"),
                model_dim,
                2 * dff * cfg.num_shared_experts,
                False,
            ),
            "down": load_linear(
                shared.subtree("down_projection"), dff * cfg.num_shared_experts, model_dim, False
            ),
        }
    return out

"""Recurrent token mixers: ShortConv (LFM2), Mamba2, Gated DeltaNet (Qwen3.5).

Semantics match the reference's CPU kernels exactly (the portable
source-of-truth implementations):
- ShortConv: crates/backend-uzu/src/backends/cpu/kernel/short_conv/
  short_conv.rs (pack/prefill/decode) + encodable_block/mixer/short_conv.rs
  — in_projection rows are [pre_gate | post_gate | x]; depthwise causal conv
  over x*pre_gate; output *post_gate; out_projection.
- Mamba2: backends/cpu/kernel/ssm/{split_inproj,conv1d,ssd_update}.rs +
  encodable_block/mixer/mamba2.rs — in_projection rows are
  [conv_in (x|B|C) | z | dt_raw]; depthwise conv + activation over conv_in;
  dt = softplus(dt_raw), decay = exp(-dt); S <- S*decay + B ⊗ x;
  y = C·S + D*x; y *= silu(z + gate_bias); out_projection.
- GDN: backends/cpu/kernel/gdn/{prefill_prep,conv_scan,update,norm_gate}.rs
  + encodable_block/mixer/delta_net.rs — in_proj rows are
  [q | k | v (conv'd + SiLU) | z | beta_raw | a_raw]; q,k L2-normalized
  (q scaled dk^-1/2); beta = sigmoid(beta_raw);
  decay = exp(-exp(a_log) * softplus(a_raw + dt_bias)); delta rule
  S <- decay*S + beta*(v - decay*S·k) ⊗ k; o = decay*S·q + delta*(k·q);
  per-head RMSNorm(o)*norm_w*silu(z); out_proj.

TPU design notes: prefill uses a lax.scan over time with f32 states
(XLA keeps the scan on-device; a chunked Pallas SSD kernel is a later
optimization); decode is the S=1 special case of the same code. States are
time-major [k-1, C] / [H, dv, dk] fixed-shape arrays donated through the
jitted step. End-padding is neutralized by forcing identity transitions
(decay=1, input=0) at rows >= true_length, and the conv state is sliced at
true_length so padded rows never enter it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config.model import (
    DeltaNetConfig,
    GELU,
    Mamba2Config,
    ShortConvConfig,
    SiLU,
)
from ..ops.linear import linear_apply


def _act(cfg, x):
    if isinstance(cfg, SiLU):
        return jax.nn.silu(x)
    if isinstance(cfg, GELU):
        return jax.nn.gelu(x, approximate=cfg.approximate)
    return x


def _softplus(x):
    return jnp.where(x > 20.0, x, jnp.log1p(jnp.exp(x)))


def _valid_mask(s: int, true_length) -> jax.Array:
    return (jnp.arange(s) < true_length)[:, None]


def _causal_depthwise_conv(padded: jax.Array, w: jax.Array, bias, s: int) -> jax.Array:
    """padded [k-1+S, C] -> out [S, C]; w [C, k]; per-channel causal FIR."""
    k = w.shape[1]
    out = jnp.zeros((s, padded.shape[1]), jnp.float32)
    for tap in range(k):
        out = out + padded[tap : tap + s].astype(jnp.float32) * w[:, tap].astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def _next_conv_state(padded: jax.Array, true_length, taps: int) -> jax.Array:
    """Last `taps` real rows of the packed [state; masked inputs] buffer."""
    return jax.lax.dynamic_slice_in_dim(padded, true_length, taps, axis=0)


# --------------------------------------------------------------------------
# ShortConv (LFM2)
# --------------------------------------------------------------------------


def _short_conv_forward(cfg: ShortConvConfig, params, x, state, true_length, defer=False):
    s, d = x.shape
    k = cfg.kernel_size
    proj = linear_apply(params["in"]["w"], x).astype(jnp.float32)  # [S, 3D]
    pre, post, xin = proj[:, :d], proj[:, d : 2 * d], proj[:, 2 * d :]
    xg = jnp.where(_valid_mask(s, true_length), xin * pre, 0.0)

    padded = jnp.concatenate([state["conv"].astype(jnp.float32), xg])  # [k-1+S, D]
    conv = _causal_depthwise_conv(padded, params["conv_w"], params.get("conv_b"), s)
    y = (conv * post).astype(x.dtype)
    if defer:
        new_state = {"padded": padded, "conv0": state["conv"]}
    else:
        new_state = {"conv": _next_conv_state(padded, true_length, k - 1).astype(state["conv"].dtype)}
    return linear_apply(params["out"]["w"], y), new_state


# --------------------------------------------------------------------------
# Chunk-parallel recurrence cores (prefill)
#
# Role of the reference's chunked GDN pipeline (DeltaNetPrefillChunkedCumsum/
# ChunkedGram/ChunkedADiagInv/ChunkedCausalInv/ChunkedOutputAndState,
# backends/metal/kernel/gdn/) and SSDPrefill64 (ssm/): a lax.scan over single
# tokens serializes the whole prefill on one vector unit; these cores do
# whole chunks as batched matrix work (MXU) with one state carry per chunk.
# Masked rows compose exactly like the scan path: beta=0 + log_decay=0 (GDN)
# / x=0 + log_decay=0 (SSD) are identity transitions.
# --------------------------------------------------------------------------

SSM_PREFILL_CHUNK = 64
# below this many rows the per-token scan wins (no padding, no [L, L] work)
SSM_CHUNKED_MIN_S = 32


def _pad_chunks(arrs, s, chunk):
    """Pad [S, ...] arrays to a chunk multiple and reshape to
    [n_chunks, H, L, ...] (heads-major for batched per-head matrices)."""
    pad = (-s) % chunk
    out = []
    for a in arrs:
        if pad:
            a = jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))
        a = a.reshape(-1, chunk, *a.shape[1:])  # [nc, L, H, ...]
        out.append(jnp.swapaxes(a, 1, 2))  # [nc, H, L, ...]
    return out


def _tri_solve(a_strict_lower, b):
    """x = (I + strict_lower(a))^{-1} b, batched over leading dims."""
    return jax.scipy.linalg.solve_triangular(
        a_strict_lower, b, lower=True, unit_diagonal=True
    )


def _delta_net_chunked(qs, ks, vs, beta, log_decay, ssm0, chunk):
    """Gated delta rule, chunk-parallel (WY representation).

    qs/ks [S, H, dk] (q pre-scaled, q/k L2-normalized), vs [S, H, dv],
    beta/log_decay [S, H]; padded/masked rows must carry beta=0 and
    log_decay=0. Returns (ssm [H, dv, dk], o [S, H, dv]).

    With S_i = a_i S_{i-1} (I - b_i k_i k_i^T) + b_i v_i k_i^T and
    gamma_i = prod_{j<=i} a_j, write S_i = gamma_i S_0 P_i + Z_i where
    P_i = I - sum_{j<=i} w_j k_j^T, Z_i = sum_{j<=i} (gamma_i/gamma_j)
    u_j k_j^T. The w/u rows solve unit-lower-triangular systems
        W = (I + B tril(K K^T, -1))^{-1} B K
        U = (I + B tril(K K^T (x) Gamma, -1))^{-1} B V
    (Gamma[i,j] = gamma_i/gamma_j <= 1, so everything stays bounded), and
    o_i = S_i q_i = gamma_i S_0 (q_i - sum_{j<=i} (k_j.q_i) w_j)
                  + sum_{j<=i} (gamma_i/gamma_j) (k_j.q_i) u_j.
    """
    s = qs.shape[0]
    q_c, k_c, v_c, b_c, lg_c = _pad_chunks([qs, ks, vs, beta, log_decay], s, chunk)
    low = jnp.tril(jnp.ones((chunk, chunk), bool))
    strict = jnp.tril(jnp.ones((chunk, chunk), bool), -1)

    def chunk_step(S0, inp):
        q, k, v, b, lg = inp  # [H, L, dk] / [H, L, dv] / [H, L]
        lgc = jnp.cumsum(lg, axis=1)  # [H, L]
        gam = jnp.exp(lgc)
        # mask the exponent BEFORE exp: above the diagonal lgc_i - lgc_j > 0
        # and overflows to inf for long chunks, and 0 * inf = NaN survives a
        # multiplicative mask; on/below the diagonal the ratio is <= 1
        diff = lgc[:, :, None] - lgc[:, None, :]
        ratio = jnp.exp(jnp.where(low, diff, 0.0))
        gram = jnp.einsum("hik,hjk->hij", k, k)
        a0 = jnp.where(strict, b[:, :, None] * gram, 0.0)
        at = jnp.where(strict, a0 * ratio, 0.0)
        w = _tri_solve(a0, b[..., None] * k)  # [H, L, dk]
        u = _tri_solve(at, b[..., None] * v)  # [H, L, dv]

        qk = jnp.where(low, jnp.einsum("hik,hjk->hij", q, k), 0.0)
        q_eff = q - jnp.einsum("hij,hjk->hik", qk, w)
        o = gam[..., None] * jnp.einsum("hlk,hvk->hlv", q_eff, S0)
        o = o + jnp.einsum("hij,hjv->hiv", qk * ratio * low, u)

        r_last = jnp.exp(lgc[:, -1:] - lgc)  # gamma_L / gamma_j
        wk = jnp.einsum("hld,hle->hde", w, k)  # sum_j w_j k_j^T [H, dk, dk]
        s_new = jnp.exp(lgc[:, -1])[:, None, None] * (
            S0 - jnp.einsum("hvk,hkd->hvd", S0, wk)
        ) + jnp.einsum("hlv,hld->hvd", u * r_last[..., None], k)
        return s_new, o

    ssm, o_c = jax.lax.scan(chunk_step, ssm0, (q_c, k_c, v_c, b_c, lg_c))
    o = jnp.swapaxes(o_c, 1, 2).reshape(-1, *o_c.shape[1:2], o_c.shape[-1])
    return ssm, o[:s]


def _mamba2_chunked(xs, bs, cs, log_decay, ssm0, chunk):
    """SSD recurrence S_t = a_t S + x_t (x) b_t, y_t = S_t c_t in
    chunk-parallel form: intra-chunk decay-ratio masked attention
    P[i,j] = (c_i.b_j) gamma_i/gamma_j (j <= i) plus the inter-chunk S_0
    readout. xs [S, H, dh], bs/cs [S, H, n], log_decay [S, H] (0 = masked).
    Returns (ssm [H, dh, n], y [S, H, dh])."""
    s = xs.shape[0]
    x_c, b_c, c_c, lg_c = _pad_chunks([xs, bs, cs, log_decay], s, chunk)
    low = jnp.tril(jnp.ones((chunk, chunk), bool))

    def chunk_step(S0, inp):
        x, bmat, c, lg = inp
        lgc = jnp.cumsum(lg, axis=1)
        gam = jnp.exp(lgc)
        # exponent masked before exp — see _delta_net_chunked
        diff = lgc[:, :, None] - lgc[:, None, :]
        ratio = jnp.exp(jnp.where(low, diff, 0.0))
        p = jnp.where(low, jnp.einsum("hin,hjn->hij", c, bmat) * ratio, 0.0)
        y = gam[..., None] * jnp.einsum("hin,hdn->hid", c, S0)
        y = y + jnp.einsum("hij,hjd->hid", p, x)
        r_last = jnp.exp(lgc[:, -1:] - lgc)
        s_new = jnp.exp(lgc[:, -1])[:, None, None] * S0 + jnp.einsum(
            "hld,hln->hdn", x * r_last[..., None], bmat
        )
        return s_new, y

    ssm, y_c = jax.lax.scan(chunk_step, ssm0, (x_c, b_c, c_c, lg_c))
    y = jnp.swapaxes(y_c, 1, 2).reshape(-1, y_c.shape[1], y_c.shape[-1])
    return ssm, y[:s]


# --------------------------------------------------------------------------
# Mamba2
# --------------------------------------------------------------------------


def _mamba2_forward(cfg: Mamba2Config, params, x, state, true_length, defer=False):
    s, d = x.shape
    h, g, dh, n, k = cfg.num_heads, cfg.num_groups, cfg.head_dim, cfg.state_dim, cfg.kernel_size
    inner = h * dh
    conv_dim = inner + 2 * g * n

    proj = linear_apply(params["in"]["w"], x, params["in"].get("b")).astype(jnp.float32)
    conv_in = proj[:, :conv_dim]
    z = proj[:, conv_dim : conv_dim + inner] + params["gate_bias"].astype(jnp.float32)
    dt_raw = proj[:, conv_dim + inner :]  # [S, H]

    valid = _valid_mask(s, true_length)
    conv_in = jnp.where(valid, conv_in, 0.0)
    padded = jnp.concatenate([state["conv"], conv_in])  # f32 [k-1+S, conv_dim]
    conv = _act(cfg.activation, _causal_depthwise_conv(padded, params["conv_w"], params.get("conv_b"), s))

    xs = conv[:, :inner].reshape(s, h, dh)
    bs = conv[:, inner : inner + g * n].reshape(s, g, n)
    cs = conv[:, inner + g * n :].reshape(s, g, n)

    log_decay = jnp.where(valid, -_softplus(dt_raw), 0.0)  # [S, H]
    xs = jnp.where(valid[:, :, None], xs, 0.0)
    rep = h // g
    bs_h = jnp.repeat(bs, rep, axis=1)  # [S, H, N]
    cs_h = jnp.repeat(cs, rep, axis=1)

    if s >= SSM_CHUNKED_MIN_S:
        ssm, ys = _mamba2_chunked(xs, bs_h, cs_h, log_decay, state["ssm"], SSM_PREFILL_CHUNK)
    else:
        decay = jnp.exp(log_decay)

        def step(ssm, inp):
            x_t, b_t, c_t, decay_t = inp
            ssm = ssm * decay_t[:, None, None] + x_t[:, :, None] * b_t[:, None, :]
            y_t = jnp.einsum("hdn,hn->hd", ssm, c_t)
            return ssm, y_t

        ssm, ys = jax.lax.scan(step, state["ssm"], (xs, bs_h, cs_h, decay))
    ys = ys + params["skip_weight"].astype(jnp.float32)[None, :, None] * xs
    ys = ys.reshape(s, inner) * jax.nn.silu(z)
    out = linear_apply(params["out"]["w"], ys.astype(x.dtype), params["out"].get("b"))
    if defer:
        new_state = {"padded": padded, "xs": xs, "bs": bs_h,
                     "log_decay": log_decay, "ssm0": state["ssm"]}
    else:
        new_state = {"conv": _next_conv_state(padded, true_length, k - 1), "ssm": ssm}
    return out, new_state


# --------------------------------------------------------------------------
# Gated DeltaNet (Qwen3.5 hybrid layers)
# --------------------------------------------------------------------------


def _delta_net_forward(cfg: DeltaNetConfig, params, x, state, true_length, defer=False):
    s, d = x.shape
    h, g = cfg.num_heads, cfg.num_groups
    dk, dv, k = cfg.head_dim, cfg.value_head_dim, cfg.kernel_size
    key_dim, value_dim = g * dk, h * dv
    conv_dim = 2 * key_dim + value_dim

    proj = linear_apply(params["in"]["w"], x).astype(jnp.float32)
    conv_in = proj[:, :conv_dim]
    z = proj[:, conv_dim : conv_dim + value_dim].reshape(s, h, dv)
    beta_raw = proj[:, conv_dim + value_dim : conv_dim + value_dim + h]
    a_raw = proj[:, conv_dim + value_dim + h :]

    valid = _valid_mask(s, true_length)
    conv_in = jnp.where(valid, conv_in, 0.0)
    padded = jnp.concatenate([state["conv"], conv_in])
    conv = jax.nn.silu(_causal_depthwise_conv(padded, params["conv_w"], params.get("conv_b"), s))

    rep = h // g
    qs = conv[:, :key_dim].reshape(s, g, dk)
    ks = conv[:, key_dim : 2 * key_dim].reshape(s, g, dk)
    vs = conv[:, 2 * key_dim :].reshape(s, h, dv)

    def l2norm(v):
        return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-6)

    qs = jnp.repeat(l2norm(qs) * (float(dk) ** -0.5), rep, axis=1)  # [S, H, dk]
    ks = jnp.repeat(l2norm(ks), rep, axis=1)

    beta = jax.nn.sigmoid(beta_raw)  # [S, H]
    log_decay = -jnp.exp(params["a_log"].astype(jnp.float32))[None, :] * _softplus(
        a_raw + params["dt_bias"].astype(jnp.float32)[None, :]
    )
    log_decay = jnp.where(valid, log_decay, 0.0)
    beta = jnp.where(valid, beta, 0.0)

    if s >= SSM_CHUNKED_MIN_S:
        ssm, os_ = _delta_net_chunked(
            qs, ks, vs, beta, log_decay, state["ssm"], SSM_PREFILL_CHUNK
        )
    else:
        decay = jnp.exp(log_decay)

        def step(ssm, inp):
            # ssm [H, dv, dk]
            q_t, k_t, v_t, beta_t, decay_t = inp
            sk = jnp.einsum("hvk,hk->hv", ssm, k_t)  # S·k
            sq = jnp.einsum("hvk,hk->hv", ssm, q_t)  # S·q
            retrieved = decay_t[:, None] * sk
            delta = beta_t[:, None] * (v_t - retrieved)  # [H, dv]
            kq = jnp.sum(k_t * q_t, axis=-1)  # [H]
            o_t = decay_t[:, None] * sq + delta * kq[:, None]
            ssm = decay_t[:, None, None] * ssm + delta[:, :, None] * k_t[:, None, :]
            return ssm, o_t

        ssm, os_ = jax.lax.scan(step, state["ssm"], (qs, ks, vs, beta, decay))

    # per-head RMSNorm + SiLU(z) gate (gdn/update.rs:129-143)
    inv_rms = jax.lax.rsqrt(jnp.mean(os_ * os_, axis=-1, keepdims=True) + cfg.norm_config.epsilon)
    gated = os_ * inv_rms * params["norm_scales"].astype(jnp.float32) * jax.nn.silu(z)
    out = linear_apply(params["out"]["w"], gated.reshape(s, value_dim).astype(x.dtype))
    if defer:
        new_state = {"padded": padded, "ks": ks, "vs": vs, "beta": beta,
                     "log_decay": log_decay, "ssm0": state["ssm"]}
    else:
        new_state = {"conv": _next_conv_state(padded, true_length, k - 1), "ssm": ssm}
    return out, new_state


# --------------------------------------------------------------------------
# Dispatch / state init / loading
# --------------------------------------------------------------------------


def ssm_forward(mixer_cfg, params, x, positions, state, true_length=None, defer=False):
    """defer=True (speculative verify): outputs are computed for ALL rows
    (true_length forced to S) and NO state is committed — instead an `aux`
    dict is returned holding the recurrence inputs, and `ssm_commit` later
    replays the state update for a traced prefix length. This is the
    chunk-replay verify for recurrent mixers (role of the reference's
    delta_net/tree_verify.rs + short_conv.rs trie kernels): the replay
    touches no weights, so acceptance-dependent rollback costs only the
    tiny per-token state recurrence, not a second weight stream."""
    if true_length is None or defer:
        true_length = x.shape[0]
    if isinstance(mixer_cfg, ShortConvConfig):
        return _short_conv_forward(mixer_cfg, params, x, state, true_length, defer)
    if isinstance(mixer_cfg, Mamba2Config):
        return _mamba2_forward(mixer_cfg, params, x, state, true_length, defer)
    if isinstance(mixer_cfg, DeltaNetConfig):
        return _delta_net_forward(mixer_cfg, params, x, state, true_length, defer)
    raise ValueError(f"unsupported mixer {type(mixer_cfg).__name__}")


def ssm_tree_forward(mixer_cfg, params, x, state, parents, conv_src):
    """Recurrent-mixer forward over a TOKEN TREE (the reference's
    delta_net/tree_verify.rs + ShortConvTrieKernel role, TPU-style).

    x [M, D] holds one row per tree node (parents[j] < j, -1 = root whose
    predecessor state is `state`); conv_src [M, K] i32 indexes each node's
    causal conv window into concat([state conv rows (k-1), node inputs]) —
    the host linearizes every ancestor walk, so the device does pure
    gathers. The recurrence runs as a sequential fori_loop over nodes with
    a [M+1] state buffer (node j reads its PARENT's state, not the
    previous row's): M <= 32 steps of vector work per layer.

    Returns (out [M, D], aux) where aux feeds ssm_tree_commit — no state
    is committed here (speculative nodes are hypotheses)."""
    if isinstance(mixer_cfg, ShortConvConfig):
        return _short_conv_tree(mixer_cfg, params, x, state, conv_src)
    if isinstance(mixer_cfg, Mamba2Config):
        return _mamba2_tree(mixer_cfg, params, x, state, parents, conv_src)
    if isinstance(mixer_cfg, DeltaNetConfig):
        return _delta_net_tree(mixer_cfg, params, x, state, parents, conv_src)
    raise ValueError(f"unsupported mixer {type(mixer_cfg).__name__}")


def _tree_conv(padded, conv_src, w, bias):
    """Gathered causal depthwise conv: out[j] = sum_t w[:, t] *
    padded[conv_src[j, t]]. padded [k-1+M, C] f32, conv_src [M, K].
    Tap accumulation order matches _causal_depthwise_conv exactly so tree
    verification stays bit-identical to the plain per-token path."""
    win = padded[conv_src]  # [M, K, C]
    k = w.shape[1]
    out = jnp.zeros((win.shape[0], win.shape[2]), jnp.float32)
    for tap in range(k):
        out = out + win[:, tap] * w[:, tap].astype(jnp.float32)
    if bias is not None:
        out = out + bias.astype(jnp.float32)
    return out


def _short_conv_tree(cfg, params, x, state, conv_src):
    m, d = x.shape
    proj = linear_apply(params["in"]["w"], x).astype(jnp.float32)
    pre, post, xin = proj[:, :d], proj[:, d : 2 * d], proj[:, 2 * d :]
    xg = xin * pre
    padded = jnp.concatenate([state["conv"].astype(jnp.float32), xg])
    conv = _tree_conv(padded, conv_src, params["conv_w"], params.get("conv_b"))
    y = (conv * post).astype(x.dtype)
    aux = {"padded": padded, "conv0": state["conv"]}
    return linear_apply(params["out"]["w"], y), aux


def _mamba2_tree(cfg, params, x, state, parents, conv_src):
    m, d = x.shape
    h, g, dh, n = cfg.num_heads, cfg.num_groups, cfg.head_dim, cfg.state_dim
    inner = h * dh
    conv_dim = inner + 2 * g * n

    proj = linear_apply(params["in"]["w"], x, params["in"].get("b")).astype(jnp.float32)
    conv_in = proj[:, :conv_dim]
    z = proj[:, conv_dim : conv_dim + inner] + params["gate_bias"].astype(jnp.float32)
    dt_raw = proj[:, conv_dim + inner :]

    padded = jnp.concatenate([state["conv"], conv_in])
    conv = _act(cfg.activation,
                _tree_conv(padded, conv_src, params["conv_w"], params.get("conv_b")))
    xs = conv[:, :inner].reshape(m, h, dh)
    rep = h // g
    bs = jnp.repeat(conv[:, inner : inner + g * n].reshape(m, g, n), rep, axis=1)
    cs = jnp.repeat(conv[:, inner + g * n :].reshape(m, g, n), rep, axis=1)
    log_decay = -_softplus(dt_raw)
    decay = jnp.exp(log_decay)

    states0 = jnp.zeros((m + 1,) + state["ssm"].shape, jnp.float32)
    states0 = states0.at[0].set(state["ssm"])
    outs0 = jnp.zeros((m, h, dh), jnp.float32)

    def body(j, carry):
        states, outs = carry
        s_par = states[parents[j] + 1]
        s_new = s_par * decay[j][:, None, None] + xs[j][:, :, None] * bs[j][:, None, :]
        y = jnp.einsum("hdn,hn->hd", s_new, cs[j])
        return states.at[j + 1].set(s_new), outs.at[j].set(y)

    states, ys = jax.lax.fori_loop(0, m, body, (states0, outs0))
    ys = ys + params["skip_weight"].astype(jnp.float32)[None, :, None] * xs
    ys = ys.reshape(m, inner) * jax.nn.silu(z)
    out = linear_apply(params["out"]["w"], ys.astype(x.dtype), params["out"].get("b"))
    aux = {"padded": padded, "xs": xs, "bs": bs, "log_decay": log_decay,
           "ssm0": state["ssm"]}
    return out, aux


def _delta_net_tree(cfg, params, x, state, parents, conv_src):
    m, d = x.shape
    h, g = cfg.num_heads, cfg.num_groups
    dk, dv = cfg.head_dim, cfg.value_head_dim
    key_dim, value_dim = g * dk, h * dv
    conv_dim = 2 * key_dim + value_dim

    proj = linear_apply(params["in"]["w"], x).astype(jnp.float32)
    conv_in = proj[:, :conv_dim]
    z = proj[:, conv_dim : conv_dim + value_dim].reshape(m, h, dv)
    beta_raw = proj[:, conv_dim + value_dim : conv_dim + value_dim + h]
    a_raw = proj[:, conv_dim + value_dim + h :]

    padded = jnp.concatenate([state["conv"], conv_in])
    conv = jax.nn.silu(
        _tree_conv(padded, conv_src, params["conv_w"], params.get("conv_b")))

    rep = h // g
    qs = conv[:, :key_dim].reshape(m, g, dk)
    ks = conv[:, key_dim : 2 * key_dim].reshape(m, g, dk)
    vs = conv[:, 2 * key_dim :].reshape(m, h, dv)

    def l2norm(v):
        return v * jax.lax.rsqrt(jnp.sum(v * v, axis=-1, keepdims=True) + 1e-6)

    qs = jnp.repeat(l2norm(qs) * (float(dk) ** -0.5), rep, axis=1)
    ks = jnp.repeat(l2norm(ks), rep, axis=1)
    beta = jax.nn.sigmoid(beta_raw)
    log_decay = -jnp.exp(params["a_log"].astype(jnp.float32))[None, :] * _softplus(
        a_raw + params["dt_bias"].astype(jnp.float32)[None, :]
    )
    decay = jnp.exp(log_decay)

    states0 = jnp.zeros((m + 1,) + state["ssm"].shape, jnp.float32)
    states0 = states0.at[0].set(state["ssm"])
    outs0 = jnp.zeros((m, h, dv), jnp.float32)

    def body(j, carry):
        states, outs = carry
        s_par = states[parents[j] + 1]
        sk = jnp.einsum("hvk,hk->hv", s_par, ks[j])
        sq = jnp.einsum("hvk,hk->hv", s_par, qs[j])
        delta = beta[j][:, None] * (vs[j] - decay[j][:, None] * sk)
        kq = jnp.sum(ks[j] * qs[j], axis=-1)
        o = decay[j][:, None] * sq + delta * kq[:, None]
        s_new = decay[j][:, None, None] * s_par + delta[:, :, None] * ks[j][:, None, :]
        return states.at[j + 1].set(s_new), outs.at[j].set(o)

    states, os_ = jax.lax.fori_loop(0, m, body, (states0, outs0))
    inv_rms = jax.lax.rsqrt(jnp.mean(os_ * os_, axis=-1, keepdims=True) + cfg.norm_config.epsilon)
    gated = os_ * inv_rms * params["norm_scales"].astype(jnp.float32) * jax.nn.silu(z)
    out = linear_apply(params["out"]["w"], gated.reshape(m, value_dim).astype(x.dtype))
    aux = {"padded": padded, "ks": ks, "vs": vs, "beta": beta,
           "log_decay": log_decay, "ssm0": state["ssm"]}
    return out, aux


def ssm_tree_commit(mixer_cfg, aux, path_idx, conv_commit_src):
    """Commit a tree verify to an accepted root-to-node path.

    path_idx [P] i32: accepted node indices in order, -1 padding (identity
    transitions); conv_commit_src [k-1] i32: the host-linearized indices of
    the committed conv window's rows into aux["padded"]. The state replay
    gathers the path rows and runs the SAME per-token recurrence the plain
    decode path uses — bit-identical continuation."""
    k = mixer_cfg.kernel_size
    conv = aux["padded"][conv_commit_src]
    live = (path_idx >= 0)[:, None]
    safe = jnp.maximum(path_idx, 0)
    if isinstance(mixer_cfg, ShortConvConfig):
        return {"conv": conv.astype(aux["conv0"].dtype)}

    log_decay = jnp.where(live, aux["log_decay"][safe], 0.0)
    decay = jnp.exp(log_decay)
    if isinstance(mixer_cfg, Mamba2Config):
        xs = jnp.where(live[:, :, None], aux["xs"][safe], 0.0)

        def step(ssm, inp):
            x_t, b_t, decay_t = inp
            return ssm * decay_t[:, None, None] + x_t[:, :, None] * b_t[:, None, :], None

        ssm, _ = jax.lax.scan(step, aux["ssm0"], (xs, aux["bs"][safe], decay))
        return {"conv": conv, "ssm": ssm}

    if isinstance(mixer_cfg, DeltaNetConfig):
        beta = jnp.where(live, aux["beta"][safe], 0.0)

        def step(ssm, inp):
            k_t, v_t, beta_t, decay_t = inp
            sk = jnp.einsum("hvk,hk->hv", ssm, k_t)
            delta = beta_t[:, None] * (v_t - decay_t[:, None] * sk)
            ssm = decay_t[:, None, None] * ssm + delta[:, :, None] * k_t[:, None, :]
            return ssm, None

        ssm, _ = jax.lax.scan(
            step, aux["ssm0"],
            (aux["ks"][safe], aux["vs"][safe], beta, decay))
        return {"conv": conv, "ssm": ssm}
    raise ValueError(f"unsupported mixer {type(mixer_cfg).__name__}")


def ssm_commit(mixer_cfg, aux, commit_length):
    """Commit a deferred `ssm_forward` to `commit_length` tokens (a traced
    scalar). Rows >= commit_length replay as identity transitions — exactly
    the masking the partial-chunk prefill path uses — so the committed state
    is bit-identical to a plain forward over the accepted prefix."""
    k = mixer_cfg.kernel_size
    conv = _next_conv_state(aux["padded"], commit_length, k - 1)
    if isinstance(mixer_cfg, ShortConvConfig):
        return {"conv": conv.astype(aux["conv0"].dtype)}

    s = aux["log_decay"].shape[0]
    live = (jnp.arange(s) < commit_length)[:, None]
    log_decay = jnp.where(live, aux["log_decay"], 0.0)
    decay = jnp.exp(log_decay)
    if isinstance(mixer_cfg, Mamba2Config):
        xs = jnp.where(live[:, :, None], aux["xs"], 0.0)

        def step(ssm, inp):
            x_t, b_t, decay_t = inp
            return ssm * decay_t[:, None, None] + x_t[:, :, None] * b_t[:, None, :], None

        ssm, _ = jax.lax.scan(step, aux["ssm0"], (xs, aux["bs"], decay))
        return {"conv": conv, "ssm": ssm}

    if isinstance(mixer_cfg, DeltaNetConfig):
        beta = jnp.where(live, aux["beta"], 0.0)

        def step(ssm, inp):
            k_t, v_t, beta_t, decay_t = inp
            sk = jnp.einsum("hvk,hk->hv", ssm, k_t)
            delta = beta_t[:, None] * (v_t - decay_t[:, None] * sk)
            ssm = decay_t[:, None, None] * ssm + delta[:, :, None] * k_t[:, None, :]
            return ssm, None

        ssm, _ = jax.lax.scan(step, aux["ssm0"], (aux["ks"], aux["vs"], beta, decay))
        return {"conv": conv, "ssm": ssm}
    raise ValueError(f"unsupported mixer {type(mixer_cfg).__name__}")


def make_ssm_state(mixer_cfg, model_dim: int, dtype=jnp.bfloat16) -> dict:
    k = mixer_cfg.kernel_size
    if isinstance(mixer_cfg, ShortConvConfig):
        return {"conv": jnp.zeros((k - 1, model_dim), dtype)}
    if isinstance(mixer_cfg, Mamba2Config):
        inner = mixer_cfg.num_heads * mixer_cfg.head_dim
        conv_dim = inner + 2 * mixer_cfg.num_groups * mixer_cfg.state_dim
        return {
            "conv": jnp.zeros((k - 1, conv_dim), jnp.float32),
            "ssm": jnp.zeros(
                (mixer_cfg.num_heads, mixer_cfg.head_dim, mixer_cfg.state_dim), jnp.float32
            ),
        }
    if isinstance(mixer_cfg, DeltaNetConfig):
        key_dim = mixer_cfg.num_groups * mixer_cfg.head_dim
        value_dim = mixer_cfg.num_heads * mixer_cfg.value_head_dim
        conv_dim = 2 * key_dim + value_dim
        return {
            "conv": jnp.zeros((k - 1, conv_dim), jnp.float32),
            "ssm": jnp.zeros(
                (mixer_cfg.num_heads, mixer_cfg.value_head_dim, mixer_cfg.head_dim), jnp.float32
            ),
        }
    raise ValueError(f"unsupported mixer {type(mixer_cfg).__name__}")


def load_ssm_mixer(tree, mixer_cfg, model_dim: int) -> dict:
    """Tensor names/shapes per the reference mixers (see module docstring)."""
    from .loader import load_linear

    if isinstance(mixer_cfg, ShortConvConfig):
        k = mixer_cfg.kernel_size
        out = {
            "in": load_linear(tree.subtree("in_projection"), model_dim, 3 * model_dim, False),
            "out": load_linear(tree.subtree("out_projection"), model_dim, model_dim, False),
            "conv_w": jnp.asarray(tree.leaf("conv.weights", (model_dim, k), np.float32)),
        }
        if mixer_cfg.conv_config.has_biases:
            out["conv_b"] = jnp.asarray(tree.leaf("conv.biases", (model_dim,), np.float32))
        return out

    if isinstance(mixer_cfg, Mamba2Config):
        h, g, dh, n, k = (
            mixer_cfg.num_heads,
            mixer_cfg.num_groups,
            mixer_cfg.head_dim,
            mixer_cfg.state_dim,
            mixer_cfg.kernel_size,
        )
        inner = h * dh
        conv_dim = inner + 2 * g * n
        out = {
            "in": load_linear(
                tree.subtree("in_projection"),
                model_dim,
                conv_dim + inner + h,
                mixer_cfg.has_in_biases,
            ),
            "out": load_linear(
                tree.subtree("out_projection"), inner, model_dim, mixer_cfg.has_out_biases
            ),
            "gate_bias": jnp.asarray(tree.leaf("gate_bias", (inner,), np.float32)),
            "conv_w": jnp.asarray(tree.leaf("conv.weights", (conv_dim, k), np.float32)),
            "skip_weight": jnp.asarray(tree.leaf("skip_connection_weight", (h,), np.float32)),
        }
        if mixer_cfg.conv_config.has_biases:
            out["conv_b"] = jnp.asarray(tree.leaf("conv.biases", (conv_dim,), np.float32))
        return out

    if isinstance(mixer_cfg, DeltaNetConfig):
        h, g = mixer_cfg.num_heads, mixer_cfg.num_groups
        dk, dv, k = mixer_cfg.head_dim, mixer_cfg.value_head_dim, mixer_cfg.kernel_size
        key_dim, value_dim = g * dk, h * dv
        conv_dim = 2 * key_dim + value_dim
        total = conv_dim + value_dim + 2 * h
        out = {
            "in": load_linear(tree.subtree("in_proj"), model_dim, total, False),
            "out": load_linear(tree.subtree("out_proj"), value_dim, model_dim, False),
            "conv_w": jnp.asarray(tree.leaf("conv.weights", (conv_dim, k), np.float32)),
            "a_log": jnp.asarray(tree.leaf("a_log", (h,), np.float32)),
            "dt_bias": jnp.asarray(tree.leaf("dt_bias", (h,), np.float32)),
            "norm_scales": jnp.asarray(tree.leaf("norm.scales", (dv,), np.float32)),
        }
        if mixer_cfg.conv_config.has_biases:
            out["conv_b"] = jnp.asarray(tree.leaf("conv.biases", (conv_dim,), np.float32))
        return out

    raise ValueError(f"unsupported mixer {type(mixer_cfg).__name__}")

"""Per-kernel micro baselines for the bench's ``micro`` section.

The reference tracks ~10 kernel groups with saved per-device baselines
(crates/backend-uzu/BENCHMARKS.md:30-44) so a regression in any one of them
is visible between rounds; this module adds the groups the bench's three
original micros (decode step / prefill chunk / up-GEMV) did not cover:
attention reads, paged attention, the MoE block (gather decode + routed
prefill), and the sampling pipeline.

House timing rules throughout: reps folded into ONE dispatch via lax.scan,
and every number DIFFERENTIAL between two scan lengths so the constant
launch + ~25 ms tunnel roundtrip cancels pair-wise (a lone device_get at
reps=64 masquerades as a 0.39 ms/call floor). Weights ride as jit ARGUMENTS
(closure-captured arrays embed in the remote compile payload).
"""

from __future__ import annotations

import time

import numpy as np


def _timeit(fn) -> float:
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def scan_diff_ms(fn, args, make_xs, k_small: int = 16, k_big: int = 80,
                 pairs: int = 5) -> float:
    """ms per fn(args, x) call: scan-folded, differential between two
    lengths. `make_xs(k)` builds the scanned inputs; `fn` returns a f32
    scalar (summed into the carry so XLA cannot elide any iteration)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(args, xs):
        def body(acc, x):
            return acc + fn(args, x), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs)
        return acc

    xs_s, xs_b = make_xs(k_small), make_xs(k_big)
    jax.device_get(run(args, xs_s))  # compile + warm both lengths
    jax.device_get(run(args, xs_b))
    diffs = [
        _timeit(lambda: jax.device_get(run(args, xs_b)))
        - _timeit(lambda: jax.device_get(run(args, xs_s)))
        for _ in range(pairs)
    ]
    return max(float(np.median(diffs)) / (k_big - k_small), 1e-9) * 1e3


def attention_micro(lm, ctx: int = 512) -> float:
    """Single-stream decode attention read (einsum core) at context `ctx`
    on the flagship's head geometry — the KV byte stream the fused step
    hides under weight prefetch (DESIGN.md: the einsum path IS production
    at decode widths)."""
    import jax.numpy as jnp

    from ..config.model import AttentionConfig
    from ..ops.attention import attention_reference

    mc = next(lc.mixer_config
              for lc in lm.decoder_config.transformer_config.layer_configs
              if isinstance(lc.mixer_config, AttentionConfig))
    h, g, dh = mc.num_heads, mc.num_groups, mc.head_dim
    rng = np.random.default_rng(0)
    k_cache = jnp.asarray(rng.standard_normal((ctx, g, dh)), jnp.bfloat16)
    v_cache = jnp.asarray(rng.standard_normal((ctx, g, dh)), jnp.bfloat16)
    pos = jnp.asarray([ctx - 1], jnp.int32)

    def one(args, q):
        kc, vc = args
        out = attention_reference(q, kc, vc, pos, scale=dh ** -0.5)
        return jnp.sum(out.astype(jnp.float32))

    def make_xs(k):
        qs = rng.standard_normal((k, 1, h, dh))
        return jnp.asarray(qs, jnp.bfloat16)

    # a single C=512 read measures sub-us on chip (the scan keeps the 1 MB
    # KV resident, so the marginal read is near-free): a 64-rep
    # differential sat under the pair noise floor and clamped to 0.0 — no
    # regression signal (VERDICT r4 weak#6). 1024 reps still flipped sign
    # in some windows (true diff ~0.6 ms vs ~1 ms pair noise); 4096 reps
    # put it at ~2-3 ms, reliably above the floor. Scan length is a loop
    # bound — compile cost is unchanged.
    return scan_diff_ms(one, (k_cache, v_cache), make_xs,
                        k_small=64, k_big=4160, pairs=7)


def paged_attention_micro(lm, *, bsz: int = 8, pages: int = 128,
                          page: int = 64, ctx: int = 512) -> float:
    """Paged decode attention at B=`bsz`, C=`ctx` (the serving default's
    geometry): Pallas kernel on TPU, XLA reference elsewhere."""
    import jax.numpy as jnp

    from ..config.model import AttentionConfig
    from ..ops.pallas.paged_attention import (
        paged_attention_reference,
        paged_decode_attention,
    )
    from ..runtime import on_tpu, use_pallas

    mc = next(lc.mixer_config
              for lc in lm.decoder_config.transformer_config.layer_configs
              if isinstance(lc.mixer_config, AttentionConfig))
    h, g, dh = mc.num_heads, mc.num_groups, mc.head_dim
    rng = np.random.default_rng(1)
    k_pool = jnp.asarray(rng.standard_normal((g, pages, page, dh)), jnp.bfloat16)
    v_pool = jnp.asarray(rng.standard_normal((g, pages, page, dh)), jnp.bfloat16)
    per = ctx // page
    table = jnp.asarray(
        (np.arange(bsz * per) % pages).reshape(bsz, per), jnp.int32)
    lengths = jnp.full((bsz,), ctx, jnp.int32)
    kern = (paged_decode_attention if on_tpu() and use_pallas()
            else paged_attention_reference)

    def one(args, q):
        kp, vp, tb, ln = args
        out = kern(q, kp, vp, tb, ln, scale=dh ** -0.5)
        return jnp.sum(out.astype(jnp.float32))

    def make_xs(k):
        return jnp.asarray(
            rng.standard_normal((k, bsz, h, dh)), jnp.bfloat16)

    return scan_diff_ms(one, (k_pool, v_pool, table, lengths), make_xs)


def _moe_probe_setup(d=1024, dff=1408, e=16, k_active=4, vocabless_seed=2):
    from ..config.model import (
        DenseMLPConfig,
        LinearConfig,
        MixtureOfExpertsConfig,
        SiLU,
        SoftmaxRouting,
    )

    cfg = MixtureOfExpertsConfig(
        expert_config=DenseMLPConfig(
            linear_config=LinearConfig(), activation=SiLU(alpha=1.0),
            has_up_biases=False, has_down_biases=False,
            gate_clipping=None, up_clipping=None),
        router_config=LinearConfig(),
        routing_function=SoftmaxRouting(),
        num_routed_experts=e, num_active_routed_experts=k_active,
        router_has_biases=False, num_shared_experts=0,
        expert_hidden_dim=dff, gate_config=None)
    import jax.numpy as jnp

    rng = np.random.default_rng(vocabless_seed)
    scale = 0.02
    params = {
        "router": {"w": jnp.asarray(
            rng.standard_normal((e, d)) * scale, jnp.float32)},
        "up": {"w": jnp.asarray(
            rng.standard_normal((e, 2 * dff, d)) * scale, jnp.bfloat16)},
        "down": {"w": jnp.asarray(
            rng.standard_normal((e, d, dff)) * scale, jnp.bfloat16)},
    }
    return cfg, params, d


def moe_micro(s: int) -> float:
    """MoE block at S=`s` tokens (S=1 exercises the gather-decode path,
    S>=GROUPED_PATH_MIN_TOKENS the grouped/masked prefill path) on a
    gpt-oss-small-shaped block (D=1024, dff=1408, E=16, K=4; ~140 MB of
    expert weights — the stream that dominates MoE serving)."""
    import jax.numpy as jnp

    from ..models.moe import moe_forward

    cfg, params, d = _moe_probe_setup()
    rng = np.random.default_rng(3)

    def one(args, x):
        return jnp.sum(moe_forward(cfg, args, x).astype(jnp.float32))

    def make_xs(k):
        return jnp.asarray(
            rng.standard_normal((k, s, d)), jnp.bfloat16)

    # prefill probes move k x s x D inputs; keep the folded count lower
    kk = (16, 80) if s == 1 else (4, 20)
    return scan_diff_ms(one, params, make_xs, k_small=kk[0], k_big=kk[1])


def sampling_micro(vocab: int = 128256) -> float:
    """Full sampling pipeline (temperature + top-k + top-p) on a [V]
    logits row — the per-step host of RadixTopK / unified sampling."""
    import jax
    import jax.numpy as jnp

    from ..engine.sampling import SamplingParams, sample

    params = SamplingParams(temperature=0.8, top_k=40, top_p=0.95)
    rng = np.random.default_rng(4)
    logits = jnp.asarray(rng.standard_normal(vocab) * 3, jnp.float32)

    def one(args, key):
        return sample(args, params, key=key).astype(jnp.float32)

    def make_xs(k):
        return jax.random.split(jax.random.PRNGKey(7), k)

    return scan_diff_ms(one, logits, make_xs)


def kernel_micros(lm) -> dict:
    """All per-kernel baselines, as a flat {name: ms} dict for
    RESULTS["micro"]. Each probe is individually exception-guarded — a
    failing kernel records -1 rather than killing the bench."""
    out = {}

    def guard(name, fn):
        try:
            out[name] = round(fn(), 4)
        except Exception:  # noqa: BLE001
            out[name] = -1.0
    guard("attention_c512_ms", lambda: attention_micro(lm))
    guard("paged_attn_b8_c512_ms", lambda: paged_attention_micro(lm))
    guard("moe_decode_ms", lambda: moe_micro(1))
    guard("moe_prefill256_ms", lambda: moe_micro(256))
    guard("sample_topk_ms", lambda: sampling_micro())
    return out


if __name__ == "__main__":
    import json
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    from uzu_tpu import LanguageModel

    lm = LanguageModel.from_dir(
        sys.argv[1] if len(sys.argv) > 1 else ".bench_cache/llama1b_int4",
        max_context=1024, prefill_buckets=(32,))
    print(json.dumps(kernel_micros(lm), indent=1))

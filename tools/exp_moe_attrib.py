"""On-chip MoE decode-step floor ATTRIBUTION (VERDICT r3 #3).

r3 established: gptoss_small decode runs at ~2.6 ms/step while its active
bytes (~265 MB) justify ~1.2 ms at the practical stream — a fixed
non-expert floor dominates as active bytes shrink. The r3 moe_floor probe
fit floor=0.20ms + 0.32ms/expert on the XLA path; the KERNEL path's floor
composition was never attributed. This probe does that by ablation: each
variant monkeypatches ONE component of the production decode step to an
identity/constant BEFORE the jit trace, so the fused scan compiles without
it, and the full-step minus variant-step difference is that component's
in-context cost (fusion effects included, unlike isolated micro-probes).

Variants (patched symbol -> what the delta measures):
  moe_identity      models.moe.moe_forward -> x        router + experts + combine
  router_fixed      models.moe.router_topk -> const    router GEMV + top-k + probs
  attn_identity     models.decoder.attention_forward   QKV/out GEMVs + KV + attention
  readout_zero      models.decoder.embedding_readout   readout GEMV (bf16 67 MB here)
  sample_const      engine.engine.sample -> const 7    sampling (softmax/top-k/penalty glue)

Timing: differential fused decode chunks (16 vs 48 steps, one device_get
each; launch + tunnel roundtrip cancel pair-wise), median of 5 diffs —
the same discipline as tools/exp_moe_floor.py.

    python tools/exp_moe_attrib.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _timeit(fn):
    t0 = time.perf_counter()
    fn()
    return time.perf_counter() - t0


def step_ms(lm) -> float:
    import jax
    import jax.numpy as jnp

    from uzu_tpu.engine.sampling import SamplingParams

    state = lm.new_state()
    _, state = lm.prefill(state, (np.arange(48) * 13) % 128)
    k_s, k_b = 16, 48
    dec_s = lm._decode_fn(SamplingParams(), k_s, ())
    dec_b = lm._decode_fn(SamplingParams(), k_b, ())
    keys_s = jax.random.split(jax.random.PRNGKey(0), k_s)
    keys_b = jax.random.split(jax.random.PRNGKey(1), k_b)

    def run(dec, keys):
        nonlocal state
        state, emitted, _ = dec(lm.params, state, jnp.asarray(7, jnp.int32),
                                jnp.asarray(False), keys.shape[0], keys)
        jax.device_get(emitted[0])

    run(dec_s, keys_s)
    run(dec_b, keys_b)
    diffs = [
        _timeit(lambda: run(dec_b, keys_b)) - _timeit(lambda: run(dec_s, keys_s))
        for _ in range(5)
    ]
    return float(np.median(diffs)) / (k_b - k_s) * 1e3


def _patches(variant: str, cfg):
    """Return [(module, attr, replacement)] for the variant."""
    import jax.numpy as jnp

    import uzu_tpu.engine.engine as eng
    import uzu_tpu.models.decoder as dec
    import uzu_tpu.models.moe as moe

    if variant == "full":
        return []
    if variant == "moe_identity":
        return [(moe, "moe_forward", lambda c, p, x: x)]
    if variant == "router_fixed":
        def fixed(c, p, x):
            # constant routing: the router GEMV, softmax and top-k leave
            # the graph entirely; expert gathers still run (with ids the
            # compiler may treat as constants — the scalar-prefetch kernel
            # path is unchanged either way)
            s = x.shape[0]
            k = c.num_active_routed_experts
            ids = jnp.broadcast_to(jnp.arange(k, dtype=jnp.int32)[None], (s, k))
            return ids, jnp.full((s, k), 1.0 / k, jnp.float32)

        return [(moe, "router_topk", fixed)]
    if variant == "attn_identity":
        def ident_attn(mixer_cfg, layer_cfg, params, h, positions, kv, owns,
                       true_length=None, tree=None, seq_axis=None,
                       ctx_limit=None):
            return h, kv

        return [(dec, "attention_forward", ident_attn)]
    if variant == "readout_zero":
        def zero_readout(table, x, soft_cap=None):
            # consume x (cheap) so the backbone stays live; only the [V]
            # readout GEMV is removed
            return (jnp.zeros((x.shape[0], cfg.vocab_size), jnp.float32)
                    + jnp.sum(x.astype(jnp.float32)) * 0)

        return [(dec, "embedding_readout", zero_readout)]
    if variant == "sample_const":
        def const_sample(logits, sampling, key=None, ring=None, counts=None,
                         **kw):
            # keep the logits LIVE (sum is ~free): a plain constant severs
            # the dataflow and XLA dead-code-eliminates the readout AND
            # every upstream op not reached by a state carry — the later
            # waterfall arms then measure DCE boundaries, not components
            # (observed: the post-attention arm read 0.0074 ms while 175
            # MB of MLP weights should still stream)
            return (jnp.sum(logits) * 0).astype(jnp.int32) + 7

        return [(eng, "sample", const_sample)]
    raise ValueError(variant)


def main() -> None:
    from uzu_tpu import LanguageModel
    from uzu_tpu.tools.benchmoe import model_dir

    if os.environ.get("UZU_ATTRIB_TINY"):
        # CPU sanity of the patch plumbing (every variant must trace+run)
        import tempfile

        from uzu_tpu.config.model import IntSpec, Layout
        from uzu_tpu.tools.synth import gptoss_config, synthesize

        mdir = os.path.join(tempfile.gettempdir(), "attrib_tiny")
        if not os.path.exists(os.path.join(mdir, "model.safetensors")):
            spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                           layout=Layout.OUTPUT_INPUT)
            synthesize(
                gptoss_config(num_layers=2, model_dim=256, num_heads=4,
                              num_groups=2, head_dim=64, vocab_size=512,
                              num_experts=4, num_active=2,
                              expert_hidden_dim=256, sliding_window=64,
                              max_seq=256),
                mdir, seed=5, fill="fast", expert_spec=spec)
    else:
        mdir = model_dir(REPO)
    def measure(patch_names):
        lm = LanguageModel.from_dir(mdir, max_context=512,
                                    prefill_buckets=(64,))
        cfg = lm.decoder_config
        saved = []
        try:
            for name in patch_names:
                for mod, attr, repl in _patches(name, cfg):
                    saved.append((mod, attr, getattr(mod, attr)))
                    setattr(mod, attr, repl)
            return step_ms(lm)
        finally:
            # reversed: if two variants ever patch the same attribute the
            # forward order would re-install the newer patch after orig
            for mod, attr, orig in reversed(saved):
                setattr(mod, attr, orig)

    # v3 (VERDICT r4 weak#7): WATERFALL — patches applied CUMULATIVELY in
    # a fixed order, so each delta is that component's cost given the
    # previously-removed set and the deltas SUM EXACTLY to full minus the
    # fully-ablated arm (the old independent ablations overlapped:
    # components totalled 0.72 ms on a 0.571 ms step). router_fixed comes
    # before moe_identity (the latter subsumes the former); the final
    # residual is the genuinely unattributed glue (embedding lookup,
    # norms, scan/transition overhead).
    order = ["sample_const", "readout_zero", "router_fixed",
             "moe_identity", "attn_identity"]
    full = measure([])
    print(json.dumps({"variant": "full", "step_ms": round(full, 4)}),
          flush=True)
    waterfall = {}
    prev = full
    acc = []
    for name in order:
        acc.append(name)
        ms = measure(list(acc))
        waterfall[name] = round(prev - ms, 4)
        print(json.dumps({"variant": f"upto_{name}", "step_ms": round(ms, 4),
                          "delta_ms": waterfall[name]}), flush=True)
        prev = ms
    print(json.dumps({
        "full_ms": round(full, 4),
        "waterfall_ms": waterfall,
        "residual_glue_ms": round(prev, 4),
        "sum_check": round(sum(waterfall.values()) + prev - full, 6),
    }), flush=True)


if __name__ == "__main__":
    main()

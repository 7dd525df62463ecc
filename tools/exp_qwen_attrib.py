"""Qwen0.8B-class hybrid decode-step attribution (waterfall, sum-exact).

qwen08 decodes at 302-311 tok/s (3.2 ms/step) vs ~1.77 ms of pure
weight+state streaming at the in-window rate — vs_practical 0.53-0.54.
This waterfall (cumulative ablation, same method as exp_moe_attrib v3)
splits the step into: sampling, readout GEMV, GDN mixers (ssm_forward ->
passthrough), attention layers, MLPs, residual glue — so the 46% gap is
attributed to recurrent-step math vs streaming vs glue.

    python tools/exp_qwen_attrib.py
"""

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
    _, state = lm.prefill(state, (np.arange(48) * 13) % 1024)
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
    import jax.numpy as jnp

    import uzu_tpu.engine.engine as eng
    import uzu_tpu.models.decoder as dec
    import uzu_tpu.models.ssm as ssm

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
    if variant == "readout_zero":
        def zero_readout(table, x, soft_cap=None):
            # consume x (cheap) so the backbone stays live; only the [V]
            # readout GEMV is removed
            return (jnp.zeros((x.shape[0], cfg.vocab_size), jnp.float32)
                    + jnp.sum(x.astype(jnp.float32)) * 0)

        return [(dec, "embedding_readout", zero_readout)]
    if variant == "gdn_identity":
        def ident_ssm(mixer_cfg, params, x, positions, state,
                      true_length=None, defer=False):
            return x, state

        # decoder.layer_forward imports ssm_forward lazily from models.ssm
        return [(ssm, "ssm_forward", ident_ssm)]
    if variant == "attn_identity":
        def ident_attn(mixer_cfg, layer_cfg, params, h, positions, kv, owns,
                       true_length=None, tree=None, seq_axis=None,
                       ctx_limit=None):
            return h, kv

        return [(dec, "attention_forward", ident_attn)]
    if variant == "mlp_identity":
        return [(dec, "mlp_forward", lambda c, p, x: x)]
    raise ValueError(variant)


def main() -> None:
    from uzu_tpu import LanguageModel
    from uzu_tpu.tools.bench_qwen08 import model_dir

    mdir = model_dir(REPO)

    def measure(patch_names):
        lm = LanguageModel.from_dir(mdir, max_context=1024,
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
            for mod, attr, orig in reversed(saved):
                setattr(mod, attr, orig)

    order = ["sample_const", "readout_zero", "gdn_identity",
             "attn_identity", "mlp_identity"]
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
        print(json.dumps({"variant": f"upto_{name}",
                          "step_ms": round(ms, 4),
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

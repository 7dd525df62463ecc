"""MoE flagship bench (gpt-oss-class composed model, VERDICT r2 #4).

The reference ships gpt-oss-20b as a flagship (workspace/data/
registry.json:84); its serving economics are MoE-specific: decode reads
only the K active experts' weights per layer (the gather path), prefill
routes tile-grouped expert matmuls. This entry measures both on a
gpt-oss-small-shaped synth model (sinks + alternating windows + biased
MoE, D=1024, E=16, K=4, dff=1408, 8 layers, INT4 weights + INT4 expert
stacks — the MXFP4-expert analogue) cached under
.bench_cache/gptoss_small_int4.

SoL accounting uses ACTIVE bytes per decode step: attention + router +
K/E of the expert stream + readout — the number a dense-model formula
would overstate by E/K.

    python -m uzu_tpu.tools.benchmoe
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

DIMS = dict(
    num_layers=8, model_dim=1024, num_heads=16, num_groups=8, head_dim=64,
    vocab_size=32768, num_experts=16, num_active=4, expert_hidden_dim=1408,
    sliding_window=128, max_seq=4096,
)


def model_dir(repo: str) -> str:
    from uzu_tpu.config.model import IntSpec, Layout
    from uzu_tpu.tools.synth import gptoss_config, synthesize

    # INT4 EXPERT stacks + bf16 attention/readout — the split real gpt-oss
    # ships (MXFP4 experts, bf16 everything else). The expert decode stream
    # drops 4x (measured 3.7x faster: 0.0247 vs 0.0913 ms per MoE step,
    # CHIP_JOBS_r3.log moe_q_decode); quantizing the small D=1024
    # attention/readout linears too measured SLOWER end-to-end (348.7 vs
    # 405.9 tok/s, bench_moe 2026-08-19) — per-launch kernel overheads beat
    # the byte saving at these shapes.
    out = os.path.join(repo, ".bench_cache", "gptoss_small_eq4")
    if not os.path.exists(os.path.join(out, "model.safetensors")):
        spec = IntSpec(bits=4, group_size=32, is_symmetric=True,
                       layout=Layout.OUTPUT_INPUT)
        synthesize(gptoss_config(**DIMS), out, seed=5, fill="fast",
                   expert_spec=spec)
    return out


def active_bytes_per_step(lm, ctx: int) -> int:
    """Weight + KV bytes a decode step actually touches: full attention/
    norm/router weights, K/E of the expert weights, embedding readout,
    and the KV reads at context `ctx` (window-clamped per layer)."""
    import jax

    from uzu_tpu.config.model import (
        AttentionConfig,
        MixtureOfExpertsConfig,
    )

    total = 0
    lcs = lm.decoder_config.transformer_config.layer_configs
    for lc, layer in zip(lcs, lm.params["layers"]):
        mlp = layer.get("mlp", {})
        for name, sub in layer.items():
            leaves = jax.tree.leaves(sub)
            nb = sum(x.nbytes for x in leaves)
            if name == "mlp" and isinstance(lc.mlp_config, MixtureOfExpertsConfig):
                cfg = lc.mlp_config
                expert_nb = sum(
                    x.nbytes for key in ("up", "down")
                    for x in jax.tree.leaves(mlp.get(key, {})))
                rest = nb - expert_nb
                nb = rest + expert_nb * cfg.num_active_routed_experts \
                    // cfg.num_routed_experts
            total += nb
        mc = lc.mixer_config
        if isinstance(mc, AttentionConfig):
            c = ctx if mc.sliding_window_size is None else min(
                ctx, mc.sliding_window_size)
            total += 2 * c * mc.num_groups * mc.head_dim * 2
    total += sum(x.nbytes for x in jax.tree.leaves(lm.params["embedding"]))
    return total


def bench_moe(repo: str, stage=None, *, gen_len: int = 320) -> dict:
    # gen_len 96 -> 320 (r4): with the fast post-revert step (~0.6-1.2 ms)
    # the 8/16/32-step ramp chunks each stall on the ~25 ms tunnel
    # roundtrip, and a 96-token gen never amortizes them — the measured
    # 568 tok/s was ramp, not step. 320 tokens spend >75% of steps in
    # 64-step chunks whose compute hides the fetch.
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.sampling import SamplingParams

    stage = stage or (lambda s: None)
    out: dict = {}
    stage("moe: synth/load")
    mdir = model_dir(repo)
    t0 = time.perf_counter()
    lm = LanguageModel.from_dir(mdir, max_context=4096,
                                prefill_buckets=(32, 512))
    out["load_s"] = round(time.perf_counter() - t0, 2)

    rng = np.random.default_rng(0)
    prompt = rng.integers(0, lm.decoder_config.vocab_size, 128)
    sampling = SamplingParams()

    stage("moe: warmup (compiles)")
    list(lm.generate(prompt, gen_len, sampling=sampling, stop_token_ids=[]))
    from bench import probe_interleaved_decode  # repo-root module

    active = active_bytes_per_step(lm, 128 + gen_len // 2)
    stage("moe: decode x2 (probe-interleaved)")
    out.update(probe_interleaved_decode(lm, prompt, gen_len, sampling,
                                        active, record_ttft=True))

    stage("moe: prefill")
    # 7 chunks amortize the per-sync tunnel roundtrip (see bench.py
    # stage_prefill: 2 chunks were >60% roundtrip overhead)
    n_sust = 3584
    long_prompt = rng.integers(0, lm.decoder_config.vocab_size, n_sust)
    import jax

    rate = 0.0
    for _ in range(2):
        st = lm.new_state()
        t0 = time.perf_counter()
        logits, st = lm.prefill(st, long_prompt)
        jax.device_get(logits[:1])
        rate = n_sust / (time.perf_counter() - t0)
    out["prefill_tok_s"] = round(rate, 2)

    out["active_bytes"] = active  # sol/vs_* come from the shared helper
    return out


def main() -> None:
    import sys

    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo)

    def stage(s):
        print(f"[benchmoe] {s}", file=sys.stderr, flush=True)

    res = bench_moe(repo, stage)
    print(json.dumps({"metric": "gptoss_small_decode_tok_s", **res}))


if __name__ == "__main__":
    main()

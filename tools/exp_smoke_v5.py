"""On-chip smoke v5: cross-executable divergence ENVELOPE (VERDICT r4 #7).

v4 calibrated the decode-vs-replay bound post-hoc from ONE prompt x 24
steps (observed 0.043, tol 0.1 = 2.4x the worst case). v5 measures the
envelope over 8 prompts x 64 steps each: per-prompt maxima 0.054-0.070,
overall 0.0698 (v5e, 2026-08-20 — VERDICT r4 #7's suggested 0.06 sits
BELOW the real envelope; one prompt under-sampled it). The bound is set
just above the measurement (0.08 = 1.15x the observed max over 512
steps), so a real cross-variant regression (order 0.5+) cannot hide and
ordinary contract rounding cannot flake. B (variant flip) and C (matched
precision) stay at their v4 bounds (bit-exact / 2.5e-3 measured).

Background (from v4): smoke_v3 weakened the serving invariants to "shared prefix across executable
variants" after observing that a different executable VARIANT (e.g. logprobs
on, or a sampled neighbor flipping the verify to the dynamic-sampling
program) can move logits by low bits and flip argmax on random-weight
near-ties. That explanation was plausible but unquantified — nothing
distinguished benign rounding from a real cross-variant bug. This probe
measures the deltas themselves, on the flagship model, on the real chip:

  A. decode-executable vs teacher-forced replay (two genuinely different
     programs: the fused decode scan vs the full-logits prefill-style
     forward): max |Δ logprob| of the chosen token and of the top-5
     alternatives at every generated position.
  B. executable-variant forced logits: the SAME forced token path stepped
     through two jit programs — one computing only logits+argmax, one also
     fusing the dynamic-sampling machinery (the production variant flip) —
     max RMS-normalized logit delta per step.

  C. matched-precision replay: the same forced path through the
     single-step M=1 decode program (f32 GEMVs — the fused scan's own
     precision contract) vs the fused scan's logprobs.

PASS = A <= 0.1 (contract-calibrated: the replay program quantizes M>=32
dot operands to bf16 by design while decode GEMVs are f32 — measured
0.043 logprob on chip; the assert only catches real cross-program bugs,
order 0.5+), B <= 2e-3 (measured BIT-EXACT on chip post dot-precision
fix), and C <= 2.5e-3 (envs UZU_SMOKE_TOL_REPLAY / UZU_SMOKE_TOL_VAR /
UZU_SMOKE_TOL_MATCHED). A pass gives the strong on-chip statement: within
one precision contract programs agree to low bits, the variant flip is
exact, and the only cross-program gap is the documented bf16 prefill
contract.

Reference parity: stream.rs accept path (speculation exact by construction);
here exactness is per-executable and the CROSS-executable gap is bounded.

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/exp_smoke_v5.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# A compares the fused decode scan (f32 GEMVs) against the prefill-style
# replay whose M>=32 dots are bf16 BY DESIGN (ops contract, see
# chip_conformance tolerances) — its bound reflects that precision
# contract, not variant drift (measured 0.043 logprob on chip, 2026-08-20:
# bf16 eps 7.8e-3 x logit scale O(5) is exactly this order). It still
# asserts, at a contract-calibrated tolerance, so a REAL cross-program bug
# (order 0.5+) cannot hide behind the contract. C is the normative
# matched-precision statement: the same forced token path through the
# single-step M=1 decode program (f32 GEMVs, the same contract as the
# fused scan) must agree tightly. B holds the program family fixed and
# flips only the fused sampling machinery: the actual variant-flip bound
# (measured BIT-EXACT on chip after the HIGHEST-precision dot fix).
TOL_REPLAY = float(os.environ.get("UZU_SMOKE_TOL_REPLAY", "0.08"))
N_PROMPTS = int(os.environ.get("UZU_SMOKE_PROMPTS", "8"))
TOL_VAR = float(os.environ.get("UZU_SMOKE_TOL_VAR", "2e-3"))
TOL_MATCHED = float(os.environ.get("UZU_SMOKE_TOL_MATCHED", "2.5e-3"))


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.sampling import sample_dynamic
    from uzu_tpu.models.decoder import decoder_forward
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    if os.environ.get("UZU_SMOKE_TINY"):  # CPU logic check
        jax.config.update("jax_platforms", "cpu")
        model_dir, _ = bench.flagship_dir(False)
    else:
        model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32, 512))
    cfg = lm.decoder_config
    rng = np.random.default_rng(0)
    gen = int(os.environ.get("UZU_SMOKE_GEN", "64"))

    chunk = 128

    @jax.jit
    def chunk_logp(params, state, chunk_tokens, n_real):
        logits, state = decoder_forward(
            cfg, params, chunk_tokens, state, last_only=False,
            true_length=n_real)
        return jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1), state

    def replay_delta(prompt):
        """(d_chosen, d_top, toks) for one prompt: the fused decode scan's
        logprobs vs the teacher-forced full-logits replay."""
        stream = lm.generate_resumable(None, prompt, gen, stop_token_ids=[],
                                       logprobs=5)
        toks = list(stream)
        dec_lp = stream.logprob_content  # [(lp, [(id, lp) x5])] per token
        assert len(toks) == gen and len(dec_lp) == gen
        seq = np.concatenate([prompt, np.asarray(toks, np.int64)])
        # teacher-forced log-softmax rows for positions that PRODUCED the
        # generated tokens: position i's logits predict token i+1
        state = lm.new_state()
        rows = {}  # position -> logp row (np)
        first_gen_pos = len(prompt) - 1  # produced toks[0]
        i = 0
        while i < len(seq):
            take = min(chunk, len(seq) - i)
            padded = np.zeros(chunk, np.int32)
            padded[:take] = seq[i:i + take]
            logp, state = chunk_logp(lm.params, state, jnp.asarray(padded),
                                     jnp.asarray(take, jnp.int32))
            logp = np.asarray(logp)
            for p in range(i, i + take):
                if p >= first_gen_pos and p < len(seq) - 1:
                    rows[p] = logp[p - i]
            i += take
        d_chosen, d_top = 0.0, 0.0
        for s in range(gen):
            row = rows[first_gen_pos + s]
            lp, top = dec_lp[s]
            d_chosen = max(d_chosen, abs(lp - float(row[toks[s]])))
            for tid, tlp in top:
                d_top = max(d_top, abs(tlp - float(row[tid])))
        return d_chosen, d_top, toks, dec_lp

    # -- A: decode executable vs teacher-forced replay, ENVELOPE over
    # N_PROMPTS independent prompts x `gen` steps each
    d_chosen = d_top = 0.0
    per_prompt = []
    toks = None
    prompt = None
    for pi in range(N_PROMPTS):
        p = rng.integers(0, cfg.vocab_size, 48 + 7 * pi)
        dc, dt, tk, dlp = replay_delta(p)
        per_prompt.append(round(max(dc, dt), 6))
        d_chosen, d_top = max(d_chosen, dc), max(d_top, dt)
        toks, prompt, dec_lp = tk, p, dlp  # B/C reuse the last stream
    print(json.dumps({"check": "decode_vs_replay_envelope",
                      "prompts": N_PROMPTS, "steps_each": gen,
                      "per_prompt_max": per_prompt,
                      "max_d_chosen_lp": round(d_chosen, 6),
                      "max_d_top5_lp": round(d_top, 6),
                      "tol": TOL_REPLAY,
                      "pass": bool(max(d_chosen, d_top) <= TOL_REPLAY)}), flush=True)

    # -- B: executable-variant forced logits --------------------------------
    # Same forced path, two programs: plain vs dynamic-sampling-fused.
    forced = jnp.asarray(toks[:24], jnp.int32)

    def make_step(with_dynamic: bool):
        def run(params, state, tokens, key):
            def body(carry, tok):
                st, k = carry
                logits, st = decoder_forward(
                    cfg, params, tok.reshape(1), st, last_only=True,
                    true_length=jnp.asarray(1, jnp.int32), ctx_limit=1024)
                row = logits[0].astype(jnp.float32)
                if with_dynamic:
                    k, sub = jax.random.split(k)
                    # the dynamic-sampling computation the variant flip
                    # fuses into the step; its token is a REAL program
                    # output (else XLA dead-code-eliminates it and both
                    # programs compile identical) — the path stays forced,
                    # only the program changes
                    samp = sample_dynamic(row, jnp.asarray(0.7, jnp.float32),
                                          jnp.asarray(40, jnp.int32),
                                          jnp.asarray(0.95, jnp.float32),
                                          jnp.asarray(0.0, jnp.float32), sub)
                else:
                    samp = jnp.argmax(row).astype(jnp.int32)
                return (st, k), (row, samp)

            (_, _), out = jax.lax.scan(body, (state, key), tokens)
            return out

        return jax.jit(run)

    key = jax.random.PRNGKey(7)
    logits_a = logits_b = None
    for name, fn in (("plain", make_step(False)),
                     ("dynamic", make_step(True))):
        st = lm.new_state()
        _, st = lm.prefill(st, prompt)
        rows_out, _samp = jax.device_get(fn(lm.params, st, forced, key))
        out = np.asarray(rows_out)
        if name == "plain":
            logits_a = out
        else:
            logits_b = out
    rms = np.sqrt(np.mean(np.asarray(logits_a, np.float64) ** 2, axis=-1))
    per_step = np.max(np.abs(logits_a - logits_b), axis=-1) / np.maximum(rms, 1e-9)
    d_var = float(np.max(per_step))
    print(json.dumps({"check": "variant_forced_logits",
                      "max_nerr": round(d_var, 6), "tol": TOL_VAR,
                      "steps": int(forced.shape[0]),
                      "pass": bool(d_var <= TOL_VAR)}), flush=True)

    # -- C: matched-precision replay ----------------------------------------
    # logits_a IS the teacher-forced token-by-token M=1 decode program (f32
    # GEMV contract, same as the fused scan). Row j (after feeding toks[j])
    # predicts toks[j+1] — compare against the fused scan's logprobs at the
    # step that sampled toks[j+1].
    logp_a = np.asarray(
        jax.device_get(jax.nn.log_softmax(jnp.asarray(logits_a), axis=-1)))
    d_m_chosen, d_m_top = 0.0, 0.0
    for j in range(logp_a.shape[0] - 1):
        lp, top = dec_lp[j + 1]
        d_m_chosen = max(d_m_chosen, abs(lp - float(logp_a[j, toks[j + 1]])))
        for tid, tlp in top:
            d_m_top = max(d_m_top, abs(tlp - float(logp_a[j, tid])))
    d_matched = max(d_m_chosen, d_m_top)
    print(json.dumps({"check": "matched_precision_replay",
                      "max_d_chosen_lp": round(d_m_chosen, 6),
                      "max_d_top5_lp": round(d_m_top, 6),
                      "tol": TOL_MATCHED,
                      "pass": bool(d_matched <= TOL_MATCHED)}), flush=True)

    ok = (max(d_chosen, d_top) <= TOL_REPLAY and d_var <= TOL_VAR
          and d_matched <= TOL_MATCHED)
    print(json.dumps({"smoke_v5": "PASS" if ok else "FAIL"}), flush=True)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()

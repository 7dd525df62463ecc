"""On-chip diagnosis: WHERE and WHY does speculative greedy diverge from
plain greedy on the real TPU (serving_smoke r3 failure; all CPU tests pin
bit-exactness).

Two hypotheses:
  (a) tie-break numerics — the verify computes the same row in a different
      executable shape (M=m+1 vs the decode scan's M=1); if the quant
      matmul / attention reductions are not M-invariant on MXU, low-bit
      differences flip argmax on near-ties. Expect: tiny logit deltas,
      top-2 gap ~ delta at the divergence point.
  (b) a real on-chip bug (wrong row, wrong state) — expect: large logit
      deltas or systematic early divergence.

Prints the first divergence index, the two tokens, and the decode-vs-
verify logit comparison (max |delta|, top-2 gap) at that point.
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    import bench
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.engine.speculation import (
        NgramSpeculator,
        SpeculativeDecoder,
    )
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    model_dir, _ = bench.flagship_dir(True)
    lm = LanguageModel.from_dir(model_dir, max_context=1024,
                                prefill_buckets=(32, 512))
    rng = np.random.default_rng(0)
    prompt = list(rng.integers(0, lm.decoder_config.vocab_size, 48))

    plain = lm.generate_list(np.asarray(prompt), 24, stop_token_ids=[])
    dec = SpeculativeDecoder(lm, NgramSpeculator(max_ngram=3, k=4))
    spec = list(dec.generate(np.asarray(prompt), 24, stop_token_ids=[]))
    div = next((i for i, (a, b) in enumerate(zip(plain, spec)) if a != b),
               None)
    print(json.dumps({"plain": plain[:12], "spec": spec[:12],
                      "first_divergence": div}), flush=True)
    if div is None:
        print(json.dumps({"verdict": "no divergence single-stream"}))
    else:
        # teacher-force the shared prefix, then compare the next-token
        # logits from (a) a 1-token prefill step and (b) the verify
        # executable's row 0 (same state, different executable shape)
        hist = prompt + plain[:div]
        state = lm.new_state()
        logits_a, state = lm.prefill(state, np.asarray(hist, np.int32))
        la = np.asarray(jax.device_get(logits_a), np.float32)

        from functools import partial

        from uzu_tpu.models.decoder import decoder_forward

        cfg = lm.decoder_config
        m = 4

        @partial(jax.jit, static_argnames=())
        def verify_row0(params, state, tokens):
            logits, _ = decoder_forward(cfg, params, tokens, state,
                                        last_only=False, defer_ssm=True)
            return logits

        state2 = lm.new_state()
        _, state2 = lm.prefill(state2, np.asarray(hist[:-1], np.int32))
        tokens = jnp.asarray([hist[-1]] + [0] * m, jnp.int32)
        lv = np.asarray(jax.device_get(
            verify_row0(lm.params, state2, tokens)))[0].astype(np.float32)

        top2a = np.sort(la)[-2:]
        ia, iv = int(np.argmax(la)), int(np.argmax(lv))
        print(json.dumps({
            "argmax_prefill": ia, "argmax_verify_row0": iv,
            "plain_tok": plain[div], "spec_tok": spec[div],
            "max_abs_delta": float(np.max(np.abs(la - lv))),
            "top2_gap_prefill": float(top2a[1] - top2a[0]),
            "delta_at_top2": [float(la[ia] - lv[ia]),
                              float(la[iv] - lv[iv])],
        }), flush=True)


if __name__ == "__main__":
    main()

"""On-chip fingerprint of the small-shape _quant_matmul_p miscompute.

exp_qmm_bisect ruled OUT the scale path (raw block read exact; lane-padding
scales to 32/64/128 leaves the error bit-identical at 1.16389). The wrong
output is deterministic — so compare it against candidate wrong-oracles to
fingerprint WHERE the computation diverges:

  right      x_even@w_lo.T + x_odd@w_hi.T (the correct semantics)
  halves     x[:, :k2] with lo, x[:, k2:] with hi (strided slice lowered
             as contiguous halves)
  swapped    x_even with hi, x_odd with lo (nibble order flipped)
  lo_only    2 * x_even@w_lo.T (odd dot dropped/duplicated)
  nogroup    scales applied with the WRONG group mapping (j // g not gsub)

Also sweeps block_k / block_n to see if the error moves with tiling, and
isolated paths (unit scales / constant codes).

    python tools/exp_qmm_bisect2.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    n, kdim, g, m = 256, 512, 32, 1
    kg = kdim // g
    k2 = kdim // 2
    codes = rng.integers(0, 16, (n, kdim), dtype=np.uint8)
    scales = rng.random((n, kg)).astype(np.float32) * 0.02 + 0.01
    x = rng.standard_normal((m, kdim)).astype(np.float32)
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)

    lo = (packed & 0xF).astype(np.float32)          # [n, k2]
    hi = (packed >> 4).astype(np.float32)
    srep = np.repeat(scales, g // 2, axis=-1)       # [n, k2] per-byte scale
    w_lo = (lo - 8.0) * srep
    w_hi = (hi - 8.0) * srep
    x_even = x[:, 0::2]
    x_odd = x[:, 1::2]

    oracles = {
        "right": x_even @ w_lo.T + x_odd @ w_hi.T,
        "halves": x[:, :k2] @ w_lo.T + x[:, k2:] @ w_hi.T,
        "swapped": x_even @ w_hi.T + x_odd @ w_lo.T,
        "lo_only_x2": 2.0 * (x_even @ w_lo.T),
        "hi_only_x2": 2.0 * (x_odd @ w_hi.T),
        "even_sum": (x_even + x_odd) @ w_lo.T,
    }

    def run(**kw):
        got = _quant_matmul_p(
            jnp.asarray(kw.pop("x", x)), jnp.asarray(packed),
            jnp.asarray(kw.pop("scales", scales)), None, bits=4, group_size=g,
            qbias_coeff=-8.0, **kw)
        return np.asarray(got)[:m]

    got = run()
    rep = {}
    for name, want in oracles.items():
        rep[name] = round(float(np.max(np.abs(got - want) / (np.abs(want) + 1e-3))), 5)
    print(json.dumps({"oracle_errs": rep}), flush=True)

    # raw values for offline analysis
    print(json.dumps({"got_head": [round(float(v), 5) for v in got[0, :8]],
                      "want_head": [round(float(v), 5) for v in oracles["right"][0, :8]]}),
          flush=True)

    # tiling sweep: does the error move with block shape?
    for bn, bk in ((128, 256), (256, 128), (128, 128), (256, 64)):
        try:
            got2 = run(block_n=bn, block_k=bk)
            e = float(np.max(np.abs(got2 - oracles["right"]) / (np.abs(oracles["right"]) + 1e-3)))
            print(json.dumps({f"tile_{bn}x{bk}": round(e, 5)}), flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({f"tile_{bn}x{bk}": f"ERR {type(exc).__name__}"}), flush=True)

    # isolate codes path: unit scales, qbias 0 -> out = x_even@lo.T + x_odd@hi.T
    ones = np.ones_like(scales)
    got3 = _quant_matmul_p(jnp.asarray(x), jnp.asarray(packed), jnp.asarray(ones),
                           None, bits=4, group_size=g, qbias_coeff=0.0)
    got3 = np.asarray(got3)[:m]
    want3 = x_even @ lo.T + x_odd @ hi.T
    print(json.dumps({"unit_scales_err": round(float(np.max(np.abs(got3 - want3) / (np.abs(want3) + 1e-3))), 5)}),
          flush=True)

    # isolate scales path: constant codes (9 in both nibbles)
    cpk = np.full_like(packed, 0x99)
    got4 = _quant_matmul_p(jnp.asarray(x), jnp.asarray(cpk), jnp.asarray(scales),
                           None, bits=4, group_size=g, qbias_coeff=-8.0)
    got4 = np.asarray(got4)[:m]
    want4 = (x_even + x_odd) @ srep.T  # (9-8)=1 per position
    print(json.dumps({"const_codes_err": round(float(np.max(np.abs(got4 - want4) / (np.abs(want4) + 1e-3))), 5)}),
          flush=True)


if __name__ == "__main__":
    main()

"""On-chip: attribute the moe_gemv real-Mosaic numeric failure.

The r3c smoke measured max_rel_err ~10 on chip while interpret mode is
exact — symptomatic of the kernel reading the WRONG expert plane (scalar
-prefetch index map) rather than wrong arithmetic. For each pair p,
compare the kernel row against the oracle under EVERY candidate expert:
the argmin column says which plane the kernel actually read.

    python tools/exp_moe_gemv_debug.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.moe_gemv import moe_expert_gemv
    from uzu_tpu.quant.format import (
        StackedQuantized, dequantize_stacked, pack_codes)
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    e, n, kdim, g = 8, 256, 512, 32
    codes = rng.integers(0, 16, (e, n, kdim), dtype=np.uint8)
    scales = rng.random((e, n, kdim // g)).astype(np.float32) * 0.02 + 0.01
    sq = StackedQuantized(codes=jnp.asarray(pack_codes(codes, 4)),
                          scales=jnp.asarray(scales), bits=4, group_size=g,
                          qbias_coeff=-8.0)
    dense = np.asarray(dequantize_stacked(sq, jnp.float32))

    ids = np.array([3, 1, 6, 3], np.int32)
    x = rng.standard_normal((len(ids), kdim)).astype(np.float32)
    got = np.asarray(moe_expert_gemv(sq, jnp.asarray(x), jnp.asarray(ids)))

    for p in range(len(ids)):
        errs = [float(np.max(np.abs(got[p] - x[p] @ dense[j].T)
                             / (np.abs(x[p] @ dense[j].T) + 1e-3)))
                for j in range(e)]
        print(json.dumps({
            "pair": p, "want_expert": int(ids[p]),
            "best_expert": int(np.argmin(errs)),
            "best_err": round(min(errs), 6),
            "want_err": round(errs[ids[p]], 6),
        }), flush=True)

    # second angle: single pair, N small enough for one tile — isolates
    # the n-grid from the p-grid
    got1 = np.asarray(moe_expert_gemv(sq, jnp.asarray(x[:1]),
                                      jnp.asarray(ids[:1])))
    errs1 = [float(np.max(np.abs(got1[0] - x[0] @ dense[j].T)
                          / (np.abs(x[0] @ dense[j].T) + 1e-3)))
             for j in range(e)]
    print(json.dumps({"single_pair_best": int(np.argmin(errs1)),
                      "want": int(ids[0]),
                      "errs": [round(v, 4) for v in errs1]}), flush=True)


if __name__ == "__main__":
    main()

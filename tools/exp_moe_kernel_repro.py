"""On-chip: reproduce the exp_moe_q_decode 'kernel' variant failure.

r3b logged `ValueError: ... last two dimensions of your block shape are
divisible by 8 and 128 ...` (truncated) for the Pallas quant-matmul expert
path at gpt-oss-small dims. Compile each of the two expert matmul shapes
separately with full traceback so the failing operand is attributable.

    python tools/exp_moe_kernel_repro.py
"""

import os
import sys
import traceback

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p, _tile_policy
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    g = 32
    rng = np.random.default_rng(0)
    for name, n, kdim in (("w13", 2816, 1024), ("w2", 1024, 1408)):
        kp = kdim // 2
        codes = jnp.asarray(rng.integers(0, 255, (n, kp), dtype=np.uint8))
        scales = jnp.asarray((rng.random((n, kdim // g)) * 0.01)
                             .astype(np.float32))
        x = jnp.asarray(rng.standard_normal((1, kdim)), jnp.bfloat16)
        print(f"{name}: N={n} K={kdim} tiles="
              f"{_tile_policy(n, kp, g // 2, 8, bits=4, kdim=kdim, symmetric=True)}",
              flush=True)
        try:
            y = _quant_matmul_p(x, codes, scales, None, bits=4, group_size=g,
                                qbias_coeff=-8.0)
            jax.device_get(y)
            print(f"{name}: OK {y.shape}", flush=True)
        except Exception:
            traceback.print_exc()
            print(f"{name}: FAILED", flush=True)


if __name__ == "__main__":
    main()

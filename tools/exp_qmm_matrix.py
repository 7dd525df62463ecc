"""On-chip: quant_matmul correctness matrix — which configs mis-execute?

moe_gemv_debug2 proved the PRODUCTION _quant_matmul_p returns wrong
values on real Mosaic at (N=256, K=512, g=32 -> kg=16 scale groups)
while the flagship's shapes (kg 64-128) are bit-exact in serving smokes,
and the grouped kernel at kg=32 measured correct. Sweep the small-kg
corner: kg x scales-dtype x M(-> dot dtype) x N-tiles, each cell
value-checked against the host dequant oracle.

    python tools/exp_qmm_matrix.py
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

    def cell(n, kdim, g, sdt, m):
        codes = rng.integers(0, 16, (n, kdim), dtype=np.uint8)
        scales = rng.random((n, kdim // g)).astype(np.float32) * 0.02 + 0.01
        x = rng.standard_normal((m, kdim)).astype(np.float32)
        # host oracle
        lo, hi = codes[:, 0::2], codes[:, 1::2]
        inter = np.stack([lo, hi], axis=-1).reshape(n, kdim)
        w = (inter.astype(np.float32) - 8.0) * np.repeat(scales, g, axis=-1)
        want = x @ w.T
        packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)
        got = np.asarray(_quant_matmul_p(
            jnp.asarray(x), jnp.asarray(packed),
            jnp.asarray(scales, dtype=sdt), None, bits=4, group_size=g,
            qbias_coeff=-8.0))[:m]
        err = float(np.max(np.abs(got - want) / (np.abs(want) + 1e-3)))
        return round(err, 5)

    cases = [
        # (label, n, kdim, g, scales dtype, m)
        ("kg16_f32_m1", 256, 512, 32, "float32", 1),
        ("kg16_bf16_m1", 256, 512, 32, "bfloat16", 1),
        ("kg32_f32_m1", 256, 1024, 32, "float32", 1),
        ("kg32_bf16_m1", 256, 1024, 32, "bfloat16", 1),
        ("kg44_f32_m1", 256, 1408, 32, "float32", 1),
        ("kg64_f32_m1", 256, 2048, 32, "float32", 1),
        ("kg64_bf16_m1", 256, 2048, 32, "bfloat16", 1),
        ("kg16_f32_m64", 256, 512, 32, "float32", 64),   # bf16 dot path
        ("kg32_f32_m64", 256, 1024, 32, "float32", 64),
        ("kg16_f32_m1_n1k", 1024, 512, 32, "float32", 1),  # multi N tile
        ("kg8_f32_m1", 256, 512, 64, "float32", 1),      # g=64 -> kg=8
    ]
    dts = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}
    for label, n, kdim, g, sdt, m in cases:
        try:
            print(json.dumps({label: cell(n, kdim, g, dts[sdt], m)}),
                  flush=True)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({label: f"ERR {type(exc).__name__}"}), flush=True)


if __name__ == "__main__":
    main()

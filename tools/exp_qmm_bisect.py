"""On-chip bisect of the small-kg _quant_matmul_p miscompute (r3 qmm_matrix).

Hypotheses at (N=256, K=512, g=32 -> kg=16, f32 scales, M=1), where the
production kernel read ~1.16 max-rel-err on real Mosaic:

  A. the UNCHUNKED scale block [tn, kg] with a small lane dim (kg=16)
     reads garbled on real Mosaic (2D analogue of the documented 3D
     small-lane garble), or
  B. the expansion dot scales[tn, kg] @ e[kg, kc] with contraction dim
     kg < 128 miscompiles on the MXU.

Both are fixed by LANE-PADDING scales to kg_pad = 128: padded scale rows
multiply expansion-matrix rows that never match (cols//gsub < kg_real),
so they contribute exactly 0 — the production kernel needs no code change
to accept padded scales (kg is derived from scales.shape[1]).

Tests:
  prod          production call, expect err ~1.16 (reproduces qmm_matrix)
  blockread     standalone kernel copying the [tn, kg] scale block into a
                [tn, 128] output — isolates the raw block READ
  pad128/64/32  production call with scales zero-padded to that many groups
  m64 / bf16    the other failing cells re-run with pad128

    python tools/exp_qmm_bisect.py
"""

import functools
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    n, kdim, g, m = 256, 512, 32, 1
    kg = kdim // g
    codes = rng.integers(0, 16, (n, kdim), dtype=np.uint8)
    scales = rng.random((n, kg)).astype(np.float32) * 0.02 + 0.01
    x = rng.standard_normal((m, kdim)).astype(np.float32)
    lo, hi = codes[:, 0::2], codes[:, 1::2]
    inter = np.stack([lo, hi], axis=-1).reshape(n, kdim)
    w = (inter.astype(np.float32) - 8.0) * np.repeat(scales, g, axis=-1)
    want = x @ w.T
    packed = (codes[:, 0::2] | (codes[:, 1::2] << 4)).astype(np.uint8)

    def err_of(got):
        got = np.asarray(got)[:m]
        return round(float(np.max(np.abs(got - want) / (np.abs(want) + 1e-3))), 5)

    def run(scales_np, sdt=jnp.float32, xm=None):
        xin = x if xm is None else xm
        got = _quant_matmul_p(
            jnp.asarray(xin), jnp.asarray(packed),
            jnp.asarray(scales_np, dtype=sdt), None, bits=4, group_size=g,
            qbias_coeff=-8.0)
        wantm = (xin @ w.T)
        gotm = np.asarray(got)[: xin.shape[0]]
        return round(float(np.max(np.abs(gotm - wantm) / (np.abs(wantm) + 1e-3))), 5)

    # 1. reproduce production
    print(json.dumps({"prod_kg16": run(scales)}), flush=True)

    # 2. raw block read: copy [256, 16] block into [256, 128] output
    def copy_kernel(s_ref, o_ref):
        o_ref[:] = jnp.pad(s_ref[:], ((0, 0), (0, 128 - s_ref.shape[1])))

    got = pl.pallas_call(
        copy_kernel,
        in_specs=[pl.BlockSpec((256, kg), lambda: (0, 0))],
        out_specs=pl.BlockSpec((256, 128), lambda: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
    )(jnp.asarray(scales))
    got = np.asarray(got)
    read_err = float(np.max(np.abs(got[:, :kg] - scales)))
    print(json.dumps({"blockread_kg16_err": round(read_err, 6)}), flush=True)

    # 3. lane-padded scales through the PRODUCTION kernel
    for pad_to in (128, 64, 32):
        sp = np.zeros((n, pad_to), np.float32)
        sp[:, :kg] = scales
        print(json.dumps({f"prod_pad{pad_to}": run(sp)}), flush=True)

    # 4. the other failing cells with pad128
    sp = np.zeros((n, 128), np.float32)
    sp[:, :kg] = scales
    x64 = rng.standard_normal((64, kdim)).astype(np.float32)
    print(json.dumps({"pad128_m64": run(sp, xm=x64)}), flush=True)
    print(json.dumps({"pad128_bf16": run(sp, sdt=jnp.bfloat16)}), flush=True)


if __name__ == "__main__":
    main()

"""On-chip: localize the moe_gemv numeric failure (v2).

Three block layouts produced IDENTICAL wrong values (CHIP_JOBS_r3.log
moe_gemv_smoke/2/3) — so the bug is in shared math, not block reads.
Suspect: the f32-scales expansion path (the flagship runs bf16 scales;
the f32 path was never value-checked on real Mosaic). Probes:

  ids        : which expert plane each output is closest to
  ones_scales: scales == 1 (isolates the codes+dot path)
  unit_codes : codes == mid+1 (dequant == scales; isolates scales path)
  qmm_direct : _quant_matmul_p on one expert plane, VALUE-checked
  bf16_scales: same stack with bf16 scales (the proven flagship layout)

    python tools/exp_moe_gemv_debug.py
"""

import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _stack(codes, scales, g):
    import jax.numpy as jnp

    from uzu_tpu.quant.format import StackedQuantized, pack_codes

    return StackedQuantized(codes=jnp.asarray(pack_codes(codes, 4)),
                            scales=jnp.asarray(scales), bits=4, group_size=g,
                            qbias_coeff=-8.0)


def _err(got, want):
    return float(np.max(np.abs(got - want) / (np.abs(want) + 1e-3)))


def main():
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.moe_gemv import moe_expert_gemv
    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p
    from uzu_tpu.quant.format import dequantize_stacked
    from uzu_tpu.runtime import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)
    e, n, kdim, g = 8, 256, 512, 32
    codes = rng.integers(0, 16, (e, n, kdim), dtype=np.uint8)
    scales = rng.random((e, n, kdim // g)).astype(np.float32) * 0.02 + 0.01
    ids = np.array([3, 1, 6, 3], np.int32)
    x = rng.standard_normal((len(ids), kdim)).astype(np.float32)

    def run(sq):
        return np.asarray(moe_expert_gemv(sq, jnp.asarray(x),
                                          jnp.asarray(ids)))

    def oracle(sq):
        dense = np.asarray(dequantize_stacked(sq, jnp.float32))
        return np.stack([x[i] @ dense[ids[i]].T for i in range(len(ids))])

    # FIRST: is the oracle itself sound on this device? dequantize_stacked
    # runs jnp ops on the axon chip; identical "errors" across three
    # different kernel layouts fit a wrong ORACLE as well as a wrong
    # kernel. Compare device dequant against pure-host numpy dequant.
    sq = _stack(codes, scales, g)
    dev = np.asarray(dequantize_stacked(sq, jnp.float32))
    lo, hi = codes[..., 0::2], codes[..., 1::2]
    inter = np.stack([lo, hi], axis=-1).reshape(e, n, kdim)
    host = (inter.astype(np.float32) - 8.0) * np.repeat(scales, g, axis=-1)
    print(json.dumps({"device_dequant_err": round(_err(dev, host), 6)}),
          flush=True)
    # and the host-oracle comparison of the kernel itself
    got = run(sq)
    want_host = np.stack([x[i] @ host[ids[i]].T for i in range(len(ids))])
    print(json.dumps({"kernel_vs_host_err": round(_err(got, want_host), 6)}),
          flush=True)

    print(json.dumps({"baseline_err": round(_err(run(sq), oracle(sq)), 6)}),
          flush=True)

    ones = _stack(codes, np.ones_like(scales), g)
    print(json.dumps({"ones_scales_err": round(_err(run(ones), oracle(ones)), 6)}),
          flush=True)

    unit = _stack(np.full_like(codes, 9), scales, g)
    print(json.dumps({"unit_codes_err": round(_err(run(unit), oracle(unit)), 6)}),
          flush=True)

    sq16 = _stack(codes, scales, g)
    sq16 = type(sq16)(codes=sq16.codes,
                      scales=sq16.scales.astype(jnp.bfloat16),
                      bits=4, group_size=g, qbias_coeff=-8.0)
    dense16 = np.asarray(dequantize_stacked(sq16, jnp.float32))
    want16 = np.stack([x[i] @ dense16[ids[i]].T for i in range(len(ids))])
    print(json.dumps({"bf16_scales_err": round(_err(run(sq16), want16), 6)}),
          flush=True)

    # direct quant_matmul on expert plane 3, VALUE-checked (repro only
    # checked it compiles)
    got_q = np.asarray(_quant_matmul_p(
        jnp.asarray(x[:1]), sq.codes[3], sq.scales[3], None, bits=4,
        group_size=g, qbias_coeff=-8.0))
    dense = np.asarray(dequantize_stacked(sq, jnp.float32))
    print(json.dumps({"qmm_direct_err":
                      round(_err(got_q[0], x[0] @ dense[3].T), 6)}),
          flush=True)


if __name__ == "__main__":
    main()

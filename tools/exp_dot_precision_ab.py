"""On-chip A/B/C of the decode accumulation-dot contract (UZU_TPU_DECODE_DOT).

The r4a HIGHEST switch (true f32 via 6 bf16 MXU passes) fixed nothing real
— the r3 errors were bf16 operand rounding, within the same contract the
prefill path and the reference's half-precision Metal dots already run —
and cost the flagship up-GEMV 2.5x (0.171 ms / 110 GB/s vs 0.066 / 275 in
r3, CHIP_JOBS_r4 bench_full). This probe measures all three contracts in
fresh subprocesses (the env is read at trace time):

  per arm: flagship up-GEMV ms + effective GB/s (bench.quant_matmul_probe,
  differential scan timing), MoE gather GEMV ms (same discipline on the
  gpt-oss expert stack), and the conformance nerr of both kernels vs the
  f64 host oracle.

    python tools/exp_dot_precision_ab.py
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ARM = r"""
import json, os, sys, time
sys.path.insert(0, %(repo)r)
import numpy as np

def _timeit(fn):
    t0 = time.perf_counter(); fn(); return time.perf_counter() - t0

import bench
from uzu_tpu import LanguageModel

mode = os.environ["UZU_TPU_DECODE_DOT"]
out = {"mode": mode}

model_dir, _ = bench.flagship_dir(True)
lm = LanguageModel.from_dir(model_dir, max_context=1024, prefill_buckets=(32, 512))
ms, gbs = bench.quant_matmul_probe(lm)
out["up_gemv_ms"] = round(ms, 4)
out["up_gemv_gbs"] = round(gbs, 1)

# MoE gather GEMV: gpt-oss w13 shape, differential scan timing + oracle err
import jax, jax.numpy as jnp
from uzu_tpu.quant.format import StackedQuantized, quantize_reference
from uzu_tpu.ops.pallas.moe_gemv import moe_expert_gemv

rng = np.random.default_rng(11)
e_all, n, k, g = 8, 2816, 1024, 32
codes_l, scales_l, wq_l = [], [], []
for _ in range(e_all):
    w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
    pack = quantize_reference(w, 4, g, "scale_symmetric")
    codes_l.append(pack["weights"])
    scales_l.append(np.asarray(pack["scales"]))
    lo = (pack["weights"] & 0xF).astype(np.int32)
    hi = (pack["weights"] >> 4).astype(np.int32)
    cod = np.stack([lo, hi], axis=-1).reshape(n, k)
    srep = np.repeat(np.asarray(pack["scales"], np.float64), g, axis=-1)
    wq_l.append((cod - 8) * srep)
sq = StackedQuantized(codes=jnp.asarray(np.stack(codes_l)),
                      scales=jnp.asarray(np.stack(scales_l), dtype=jnp.bfloat16),
                      bits=4, group_size=g, qbias_coeff=-8.0)
p = 8
ids = rng.integers(0, e_all, p).astype(np.int32)
x = rng.standard_normal((p, k)).astype(np.float32)
want = np.stack([np.asarray(x[i], np.float64) @ wq_l[ids[i]].T for i in range(p)])
got = np.asarray(moe_expert_gemv(sq, jnp.asarray(x), jnp.asarray(ids)))
rms = float(np.sqrt(np.mean(want * want))) or 1e-9
out["moe_gemv_nerr"] = round(float(np.max(np.abs(got - want))) / rms, 6)

def run(k_steps):
    def body(acc, xv):
        return acc + moe_expert_gemv(sq, xv, jnp.asarray(ids)), None
    acc, _ = jax.lax.scan(body, jnp.zeros((p, n), jnp.float32),
                          jnp.broadcast_to(jnp.asarray(x), (k_steps, p, k))
                          * (1 + jnp.arange(k_steps, dtype=jnp.float32)[:, None, None] * 1e-3))
    return acc

f = jax.jit(run, static_argnums=0)
jax.device_get(f(8)); jax.device_get(f(40))
diffs = [_timeit(lambda: jax.device_get(f(40))) - _timeit(lambda: jax.device_get(f(8)))
         for _ in range(5)]
out["moe_gemv_ms"] = round(float(np.median(diffs)) / 32 * 1e3, 4)
print(json.dumps(out), flush=True)
"""


def main() -> None:
    # HIGH is not in the sweep: Mosaic's lowering rejects it outright
    # ("Unsupported dot precision: HIGH", CHIP_JOBS_r4)
    for mode in ("default", "highest"):
        env = dict(os.environ)
        env["UZU_TPU_DECODE_DOT"] = mode
        env["PYTHONPATH"] = f"{REPO}:/root/.axon_site"
        r = subprocess.run([sys.executable, "-c", ARM % {"repo": REPO}],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        print(line[-1] if line else json.dumps(
            {"mode": mode, "error": r.stdout[-400:] + r.stderr[-400:]}),
            flush=True)


if __name__ == "__main__":
    main()

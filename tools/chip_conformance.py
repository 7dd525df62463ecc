"""Standing ON-CHIP value-conformance suite for every production Pallas
kernel (VERDICT r3 #1c).

The CPU test lane runs kernels in interpreter mode, and real Mosaic is NOT
interpreter mode: it has its own lowering (r4 root cause: DEFAULT-precision
dots run one bf16 MXU pass even on f32 operands; r3: small-lane 3D blocks
read garbled). This suite is the analogue of the reference's macOS
self-hosted kernel lane (.github/workflows/tests.yml:66-80 runs the kernel
suite on real Metal): it executes every production kernel ON THE CHIP over
the served shape matrix and value-checks against float64 host oracles
built from the PRODUCTION quantize path (quant/format.quantize_reference).

Tolerances encode each kernel's documented precision contract
(ops/pallas/precision.py). The PRODUCTION decode contract is the
single-pass bf16-operand dot (the reference's own half-precision
simdgroup-matmul contract; true-f32 HIGHEST dots measured 2.5x slower
on chip and do NOT hide under the weight DMA), so decode cells check at
the bf16 tolerance unless UZU_TPU_DECODE_DOT=highest is set for a
true-f32 diagnostic run:
  decode cells (GEMVs, MoE gather): nerr <= 2.5e-2 at the production
             contract; <= 1e-3 under UZU_TPU_DECODE_DOT=highest
  bf16 cells (prefill dots, attention): nerr <= 2.5e-2 (operands are
             rounded to bf16 by design)

where nerr = max|got - want| / rms(want): normalized by the output's RMS,
NOT pointwise relative error — the r3 qmm_matrix probe's pointwise metric
read 0.22-16 on near-zero outputs and mislabeled uniform rounding as a
shape-dependent garble.

Run as the FIRST chip job of a round:

    PYTHONPATH=/root/.axon_site JAX_PLATFORMS=axon python tools/chip_conformance.py
    python tools/chip_conformance.py --quick     # subset (~8 cells)

Exits non-zero if any cell exceeds tolerance. Prints one JSON line per
cell and a final summary line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BF16_TOL = 2.5e-2
# decode cells: tolerance follows the active accumulation-dot contract
F32_TOL = (1e-3 if os.environ.get("UZU_TPU_DECODE_DOT", "default") == "highest"
           else BF16_TOL)


def _nerr(got: np.ndarray, want: np.ndarray) -> float:
    want = np.asarray(want, np.float64)
    got = np.asarray(got, np.float64)
    rms = float(np.sqrt(np.mean(want * want))) or 1e-9
    return float(np.max(np.abs(got - want))) / rms


def _host_dequant(pack: dict, n: int, k: int, bits: int, g: int) -> np.ndarray:
    """f64 host dequant of quantize_reference output (the production
    on-disk layout; scales/biases are bf16-stored like real checkpoints)."""
    packed = pack["weights"]
    if bits == 4:
        lo = (packed & 0xF).astype(np.int32)
        hi = (packed >> 4).astype(np.int32)
        codes = np.stack([lo, hi], axis=-1).reshape(n, k)
    else:
        codes = packed.astype(np.int32)
    scales = np.asarray(pack["scales"], np.float64)
    srep = np.repeat(scales, g, axis=-1)
    if "biases" in pack:
        return codes * srep + np.repeat(np.asarray(pack["biases"], np.float64), g, axis=-1)
    return (codes - float(1 << (bits - 1))) * srep


def _cells_quant_matmul(quick: bool):
    """(name, n, k, g, bits, m, method) over the served shape matrix."""
    cells = [
        # r3 qmm_matrix "miscompute region" (small N / small kg)
        ("qmm_i4_n256_k512_m1", 256, 512, 32, 4, 1, "scale_symmetric"),
        ("qmm_i4_n1024_k1408_m1", 1024, 1408, 32, 4, 1, "scale_symmetric"),
        # flagship 1B decode GEMVs (llama1b_int4: D=2048, ff=8192)
        ("qmm_i4_1b_upgate_m1", 16384, 2048, 32, 4, 1, "scale_symmetric"),
        ("qmm_i4_1b_down_m1", 2048, 8192, 32, 4, 1, "scale_symmetric"),
        # prefill path (bf16 dot contract)
        ("qmm_i4_1b_upgate_m128", 16384, 2048, 32, 4, 128, "scale_symmetric"),
        # asymmetric (qbias tensor) + int8
        ("qmm_i4_asym_m1", 2048, 2048, 32, 4, 1, "scale_bias"),
        ("qmm_i8_m1", 2048, 2048, 64, 8, 1, "scale_symmetric"),
    ]
    if not quick:
        cells += [
            ("qmm_i4_n256_k2048_m1", 256, 2048, 32, 4, 1, "scale_symmetric"),
            ("qmm_i4_n256_g64_m1", 256, 512, 64, 4, 1, "scale_symmetric"),
            ("qmm_i4_n256_m64", 256, 512, 32, 4, 64, "scale_symmetric"),
            # 8B shapes (llama8b: D=4096, ff=14336; down is the VMEM-budget
            # case whose full-K tile rejects)
            ("qmm_i4_8b_down_m1", 4096, 14336, 32, 4, 1, "scale_symmetric"),
            ("qmm_i4_8b_upgate_m1", 28672, 4096, 32, 4, 1, "scale_symmetric"),
            # 1B readout (the flagship's largest single GEMV)
            ("qmm_i4_1b_readout_m1", 32768, 2048, 32, 4, 1, "scale_symmetric"),
            ("qmm_i4_1b_down_m128", 2048, 8192, 32, 4, 128, "scale_symmetric"),
            ("qmm_i8_m128", 2048, 2048, 64, 8, 128, "scale_symmetric"),
            # tiny-real model shapes (K/2 not divisible by 128 — the whole-K
            # block fallback; the old kc=64 pick rejected on real Mosaic)
            ("qmm_i4_tiny_qkv_m1", 640, 384, 32, 4, 1, "scale_symmetric"),
            ("qmm_i4_tiny_qkv_m256", 640, 384, 32, 4, 256, "scale_symmetric"),
            ("qmm_i4_tiny_down_m64", 384, 1536, 32, 4, 64, "scale_symmetric"),
        ]
    return cells


def run_quant_matmul(results, quick: bool):
    import jax.numpy as jnp

    from uzu_tpu.quant.format import QuantizedTensor, from_disk_tensors, quantize_reference
    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p

    rng = np.random.default_rng(7)
    for name, n, k, g, bits, m, method in _cells_quant_matmul(quick):
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
        pack = quantize_reference(w, bits, g, method)
        qt = from_disk_tensors(
            method, pack["weights"], pack["scales"], bits, g,
            zero_points=pack.get("zero_points"), biases=pack.get("biases"))
        x = rng.standard_normal((m, k)).astype(np.float32)
        want = np.asarray(x, np.float64) @ _host_dequant(pack, n, k, bits, g).T
        tol = BF16_TOL if m >= 32 else F32_TOL
        try:
            got = _quant_matmul_p(
                jnp.asarray(x), qt.codes, qt.scales, qt.qbias,
                bits=bits, group_size=g, qbias_coeff=qt.qbias_coeff)
            got = np.asarray(got)[:m]
            results.append((name, _nerr(got, want), tol))
        except Exception as exc:  # noqa: BLE001
            results.append((f"{name}_{type(exc).__name__}", float("inf"), tol))


def run_quant_matmul_f32scale(results, quick: bool):
    """f32-STORED-scale cells (VERDICT r4 #4): checkpoints may store f32
    scales (the loader keeps on-disk dtype, models/loader.py:117), and the
    exp_qmm_matrix postfix probe measured rel-err 7.83/4.35 at kg16/kg32
    f32 m64 BEFORE the r4 precision commits — this region was never
    re-proven. exp_dtype=f32 escalates the expansion dot to HIGHEST
    (precision.py); these cells prove (or indict) that path at prefill M.
    kgN names K/group at g=32."""
    import jax.numpy as jnp

    from uzu_tpu.quant.format import from_disk_tensors, quantize_reference
    from uzu_tpu.ops.pallas.quant_matmul import _quant_matmul_p

    rng = np.random.default_rng(23)
    cells = [
        ("qmm_i4_f32s_kg16_m64", 256, 512, 32, 4, 64),
        ("qmm_i4_f32s_kg32_m64", 256, 1024, 32, 4, 64),
    ]
    if not quick:
        cells += [
            ("qmm_i4_f32s_kg64_m64", 256, 2048, 32, 4, 64),
            ("qmm_i4_f32s_kg16_m128", 256, 512, 32, 4, 128),
            ("qmm_i4_f32s_1b_upgate_m128", 16384, 2048, 32, 4, 128),
            ("qmm_i4_f32s_kg64_m1", 256, 2048, 32, 4, 1),
            ("qmm_i8_f32s_kg32_m64", 256, 2048, 64, 8, 64),
        ]
    for name, n, k, g, bits, m in cells:
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
        pack = quantize_reference(w, bits, g, "scale_symmetric",
                                  dtype=np.float32)
        qt = from_disk_tensors(
            "scale_symmetric", pack["weights"], pack["scales"], bits, g,
            dtype=jnp.float32)
        x = rng.standard_normal((m, k)).astype(np.float32)
        want = np.asarray(x, np.float64) @ _host_dequant(pack, n, k, bits, g).T
        tol = BF16_TOL if m >= 32 else F32_TOL
        try:
            got = _quant_matmul_p(
                jnp.asarray(x), qt.codes, qt.scales, qt.qbias,
                bits=bits, group_size=g, qbias_coeff=qt.qbias_coeff)
            got = np.asarray(got)[:m]
            results.append((name, _nerr(got, want), tol))
        except Exception as exc:  # noqa: BLE001
            results.append((f"{name}_{type(exc).__name__}", float("inf"), tol))


def run_quant_matmul_split(results, quick: bool):
    """Split-N wrapper route (r5): N not tile-divisible runs the kernel on
    the 128-multiple prefix + XLA fallback tail (ops/linear.quant_matmul).
    Value-checked at the qwen08 GDN in_proj shape."""
    import jax.numpy as jnp

    from uzu_tpu.ops.linear import quant_matmul
    from uzu_tpu.quant.format import from_disk_tensors, quantize_reference

    rng = np.random.default_rng(29)
    cells = [("qmm_split_n3088_m1", 3088, 1280, 32, 4, 1),
             ("qmm_split_n272_m8", 272, 512, 32, 4, 8)]
    if quick:
        cells = cells[:1]
    for name, n, k, g, bits, m in cells:
        w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
        pack = quantize_reference(w, bits, g, "scale_symmetric")
        qt = from_disk_tensors("scale_symmetric", pack["weights"],
                               pack["scales"], bits, g)
        x = rng.standard_normal((m, k)).astype(np.float32)
        want = np.asarray(x, np.float64) @ _host_dequant(pack, n, k, bits, g).T
        tol = BF16_TOL if m >= 32 else F32_TOL
        try:
            got = np.asarray(quant_matmul(qt, jnp.asarray(x)))
            results.append((name, _nerr(got, want), tol))
        except Exception as exc:  # noqa: BLE001
            results.append((f"{name}_{type(exc).__name__}", float("inf"), tol))


def run_moe_gemv(results, quick: bool):
    import jax.numpy as jnp

    from uzu_tpu.quant.format import StackedQuantized, quantize_reference
    from uzu_tpu.ops.pallas.moe_gemv import moe_expert_gemv, supported

    rng = np.random.default_rng(11)
    # gpt-oss-small bench shapes: D=1024, dff=1408, E=16 (w13 [E,2816,1024]
    # kg=32; w2 [E,1024,1408] kg=44) — exactly the region r3 shipped
    # without a value check
    cases = [("moe_gemv_i4_w13", 8, 2816, 1024, 32, 4),
             ("moe_gemv_i4_w2", 8, 1024, 1408, 32, 4)]
    if not quick:
        cases += [("moe_gemv_i8_w13", 8, 2816, 1024, 64, 8)]
    for name, e_all, n, k, g, bits in cases:
        codes_l, scales_l, wq_l = [], [], []
        for _ in range(e_all):
            w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
            pack = quantize_reference(w, bits, g, "scale_symmetric")
            codes_l.append(pack["weights"])
            scales_l.append(np.asarray(pack["scales"]))
            wq_l.append(_host_dequant(pack, n, k, bits, g))
        sq = StackedQuantized(
            codes=jnp.asarray(np.stack(codes_l)),
            scales=jnp.asarray(np.stack(scales_l), dtype=jnp.bfloat16),
            bits=bits, group_size=g, qbias_coeff=-float(1 << (bits - 1)))
        if not supported(sq):
            results.append((name, float("nan"), 0.0))
            continue
        p = 8
        ids = rng.integers(0, e_all, p).astype(np.int32)
        x = rng.standard_normal((p, k)).astype(np.float32)
        want = np.stack([np.asarray(x[i], np.float64) @ wq_l[ids[i]].T
                         for i in range(p)])
        got = np.asarray(moe_expert_gemv(sq, jnp.asarray(x), jnp.asarray(ids)))
        results.append((name, _nerr(got, want), F32_TOL))


def run_grouped(results, quick: bool):
    import jax.numpy as jnp

    from uzu_tpu.quant.format import StackedQuantized, quantize_reference
    from uzu_tpu.ops.pallas import grouped_matmul as gm

    rng = np.random.default_rng(13)
    e_all, n, k, g = 4, 1024, 1408, 32
    bm = 64
    # dense grouped (bf16 stacks, prefill)
    wd = (rng.standard_normal((e_all, n, k)) * 0.02).astype(np.float32)
    tokens = 192
    x = rng.standard_normal((tokens, k)).astype(np.float32)
    texp = np.repeat(np.arange(e_all, dtype=np.int32), tokens // bm // e_all + 1)[: tokens // bm]
    used = np.array([tokens // bm], np.int32)
    got = np.asarray(gm.grouped_matmul(
        jnp.asarray(x, dtype=jnp.bfloat16), jnp.asarray(wd, dtype=jnp.bfloat16),
        jnp.asarray(texp), jnp.asarray(used), bm=bm))
    want = np.stack([
        np.asarray(x[i], np.float64) @ np.asarray(
            wd[texp[i // bm]], np.float64).T for i in range(tokens)])
    results.append(("grouped_dense_bf16", _nerr(got, want), BF16_TOL))

    if quick:
        return
    # quantized grouped (INT4 expert stacks, MoE prefill)
    if hasattr(gm, "grouped_matmul_quant"):
        codes_l, scales_l, wq_l = [], [], []
        for _ in range(e_all):
            w = rng.standard_normal((n, k)).astype(np.float32) * 0.02
            pack = quantize_reference(w, 4, g, "scale_symmetric")
            codes_l.append(pack["weights"])
            scales_l.append(np.asarray(pack["scales"]))
            wq_l.append(_host_dequant(pack, n, k, 4, g))
        sq = StackedQuantized(
            codes=jnp.asarray(np.stack(codes_l)),
            scales=jnp.asarray(np.stack(scales_l), dtype=jnp.bfloat16),
            bits=4, group_size=g, qbias_coeff=-8.0)
        got = np.asarray(gm.grouped_matmul_quant(
            jnp.asarray(x), sq, jnp.asarray(texp), jnp.asarray(used), bm=bm))
        want = np.stack([
            np.asarray(x[i], np.float64) @ wq_l[texp[i // bm]].T
            for i in range(tokens)])
        results.append(("grouped_quant_i4", _nerr(got, want), BF16_TOL))


def _softmax_attn_oracle(q, k, v, lengths, *, scale, soft_cap=None,
                         window=None, sinks=None):
    """f64 host paged/flash decode-attention oracle. q [B,H,Dh];
    k/v [B, C, G, Dh] gathered per slot; lengths [B]."""
    b, h, dh = q.shape
    g = k.shape[2]
    rep = h // g
    out = np.zeros((b, h, dh))
    for bi in range(b):
        ln = int(lengths[bi])
        for hi in range(h):
            gi = hi // rep
            kk = np.asarray(k[bi, :ln, gi], np.float64)
            vv = np.asarray(v[bi, :ln, gi], np.float64)
            s = (np.asarray(q[bi, hi], np.float64) @ kk.T) * scale
            if soft_cap:
                s = soft_cap * np.tanh(s / soft_cap)
            lo = 0 if window is None else max(0, ln - window)
            s[:lo] = -np.inf
            mx = s.max()
            if sinks is not None:
                mx = max(mx, float(sinks[hi]))
            e = np.exp(s - mx)
            denom = e.sum()
            if sinks is not None:
                denom = denom + np.exp(float(sinks[hi]) - mx)
            out[bi, hi] = (e / denom) @ vv
    return out


def run_paged_attention(results, quick: bool):
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.paged_attention import paged_decode_attention

    rng = np.random.default_rng(17)
    b, h, g, dh, page, p_total, maxp = 4, 8, 4, 128, 16, 48, 8
    q = (rng.standard_normal((b, h, dh)) * 0.5).astype(np.float32)
    pool_k = (rng.standard_normal((g, p_total, page, dh)) * 0.5)
    pool_v = (rng.standard_normal((g, p_total, page, dh)) * 0.5)
    table = rng.permutation(p_total)[: b * maxp].reshape(b, maxp).astype(np.int32)
    lengths = np.array([3, 37, 128, 90], np.int32)
    scale = 1.0 / np.sqrt(dh)

    variants = [("paged_attn_bf16", dict())]
    if not quick:
        variants += [
            ("paged_attn_window", dict(sliding_window_size=32)),
            ("paged_attn_softcap", dict(logit_soft_cap=30.0)),
            ("paged_attn_sinks", dict(sinks=np.linspace(-1, 1, h).astype(np.float32))),
        ]
    kq = jnp.asarray(pool_k, dtype=jnp.bfloat16)
    vq = jnp.asarray(pool_v, dtype=jnp.bfloat16)
    # host-side gather: slot rows in page-table order
    k_g = np.zeros((b, maxp * page, g, dh))
    v_g = np.zeros((b, maxp * page, g, dh))
    k_b = np.asarray(kq, np.float64)
    v_b = np.asarray(vq, np.float64)
    for bi in range(b):
        for pi in range(maxp):
            pg = table[bi, pi]
            k_g[bi, pi * page:(pi + 1) * page] = k_b[:, pg].transpose(1, 0, 2)
            v_g[bi, pi * page:(pi + 1) * page] = v_b[:, pg].transpose(1, 0, 2)
    qb = np.asarray(jnp.asarray(q, dtype=jnp.bfloat16), np.float64)
    for name, kw in variants:
        got = np.asarray(paged_decode_attention(
            jnp.asarray(q, dtype=jnp.bfloat16), kq, vq, jnp.asarray(table),
            jnp.asarray(lengths), scale=float(scale),
            logit_soft_cap=kw.get("logit_soft_cap"),
            sliding_window_size=kw.get("sliding_window_size"),
            sinks=None if kw.get("sinks") is None else jnp.asarray(kw["sinks"]),
        ), np.float64)
        want = _softmax_attn_oracle(
            qb, k_g, v_g, lengths, scale=float(scale),
            soft_cap=kw.get("logit_soft_cap"),
            window=kw.get("sliding_window_size"), sinks=kw.get("sinks"))
        results.append((name, _nerr(got, want), BF16_TOL))


def run_flash_attention(results, quick: bool):
    """flash_attention is interpreter-dispatch-only in production (the XLA
    einsum path measured faster in context) but stays a supported option:
    keep one on-chip value cell so re-enabling it never ships blind."""
    if quick:
        return
    import jax.numpy as jnp

    from uzu_tpu.ops.pallas.flash_attention import flash_attention, supported

    rng = np.random.default_rng(19)
    s, c, g, rep, dh = 128, 256, 2, 2, 64
    h = g * rep
    q = (rng.standard_normal((s, h, dh)) * 0.5).astype(np.float32)
    k = (rng.standard_normal((c, g, dh)) * 0.5).astype(np.float32)
    v = (rng.standard_normal((c, g, dh)) * 0.5).astype(np.float32)
    pos0 = c - s  # suffix of the cache
    scale = 1.0 / np.sqrt(dh)
    if not supported(s, h, g, dh, c, is_causal=True, suffix_mask=None,
                     kv_valid_length=None):
        return
    import jax.numpy as _jnp
    q_pos = _jnp.arange(pos0, pos0 + s, dtype=_jnp.int32)
    got = np.asarray(flash_attention(
        jnp.asarray(q, dtype=jnp.bfloat16), jnp.asarray(k, dtype=jnp.bfloat16),
        jnp.asarray(v, dtype=jnp.bfloat16), q_pos, scale=float(scale)),
        np.float64)
    qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float64)
    kb = np.asarray(jnp.asarray(k, jnp.bfloat16), np.float64)
    vb = np.asarray(jnp.asarray(v, jnp.bfloat16), np.float64)
    want = np.zeros_like(got, np.float64)
    for si in range(s):
        ln = pos0 + si + 1
        for hi in range(h):
            gi = hi // rep
            sc = (qb[si, hi] @ kb[:ln, gi].T) * scale
            e = np.exp(sc - sc.max())
            want[si, hi] = (e / e.sum()) @ vb[:ln, gi]
    results.append(("flash_attn_causal", _nerr(got, want), BF16_TOL))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--only", default=None,
                    help="comma-separated suite names (qmm,moe,grouped,paged,flash)")
    args = ap.parse_args()

    from uzu_tpu.runtime import enable_compilation_cache
    enable_compilation_cache()

    suites = {
        "qmm": run_quant_matmul,
        "qmm_f32s": run_quant_matmul_f32scale,
        "qmm_split": run_quant_matmul_split,
        "moe": run_moe_gemv,
        "grouped": run_grouped,
        "paged": run_paged_attention,
        "flash": run_flash_attention,
    }
    names = args.only.split(",") if args.only else list(suites)
    results: list[tuple[str, float, float]] = []
    emitted = 0
    t0 = time.time()
    for sn in names:
        try:
            suites[sn](results, args.quick)
        except Exception as exc:  # noqa: BLE001
            results.append((f"{sn}_suite_error_{type(exc).__name__}",
                            float("inf"), 0.0))
        # emit incrementally so a later hang still leaves evidence
        while emitted < len(results):
            name, nerr, tol = results[emitted]
            ok = nerr == nerr and nerr <= tol
            print(json.dumps({"cell": name, "nerr": round(nerr, 6),
                              "tol": tol, "pass": bool(ok)}), flush=True)
            emitted += 1
    failed = [n for n, e, t in results if not (e == e and e <= t)]
    print(json.dumps({"conformance": "PASS" if not failed else "FAIL",
                      "cells": len(results), "failed": failed,
                      "elapsed_s": round(time.time() - t0, 1)}), flush=True)
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

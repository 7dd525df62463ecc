"""Tile autotuner for the fused dequant matmul.

Role parity with the reference's fleet-tuned GEMV tile tables
(crates/backend-uzu/src/backends/metal/kernel/matmul/gemv/policy.rs: tile
grids keyed on (quant, N, K, device tier), measured across the device
fleet). Here: measure every (block_n, block_k) candidate for a shape set on
the CURRENT device, write a JSON table keyed by device kind, and let
`_tile_policy` consult it before its heuristics.

Timing method honors this environment's rules (CLAUDE.md): reps fold into
ONE dispatch (lax.scan) and sync once — per-dispatch launch overhead
amortizes, so decode-size (M=8) configs rank above the noise floor that
the earlier dispatch-per-rep loop buried them under. `validate_e2e` (cli
autotune --validate-e2e) is the promotion gate: it A/Bs the measured
table against the heuristics on the FULL fused decode loop, warming each
model while its policy env is in force (the table is read lazily at first
trace — an earlier version flipped the env before anything compiled and
measured table-vs-table noise).

Tables live in tile_tables/<device_key>.json next to this file or at
UZU_TPU_TILE_TABLE. NO table ships by default: the r3 on-chip
validate-e2e verdict (CHIP_JOBS_r3.log, fixed warm-order) was heuristic
4.958 vs table 4.979 ms/tok — the gemv-bucket micro rankings sit under
the launch-noise floor and did not transfer, so the measured table was
deleted rather than shipped unproven (the harness + promotion gate stay
for devices where a table DOES win).
"""

from __future__ import annotations

import json
import os
from functools import lru_cache

TABLE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "tile_tables")

# M buckets share an entry: decode-sized (HBM-bound), mid, large-M prefill
M_BUCKETS = ((32, "gemv"), (256, "mid"), (10**9, "gemm"))

CANDIDATES = (
    (512, 512), (512, 256), (256, 512), (256, 256), (128, 512), (512, 128),
    # deep-K chunks: one/two K grid steps for d=2048-class shapes (scales
    # read once) and chunked scale blocks on K>=4096 shapes (kgc >= 128);
    # _valid skips them where K doesn't divide
    (512, 1024), (256, 1024), (512, 2048), (256, 2048),
)


def m_bucket(m_pad: int) -> str:
    for bound, name in M_BUCKETS:
        if m_pad < bound:
            return name
    return "gemm"


def _device_key() -> str:
    import jax

    try:
        kind = str(jax.devices()[0].device_kind).lower()
    except Exception:
        return "cpu"
    return kind.replace(" ", "_")


@lru_cache(maxsize=None)
def _load_table() -> dict:
    path = os.environ.get("UZU_TPU_TILE_TABLE")
    if not path:
        path = os.path.join(TABLE_DIR, f"{_device_key()}.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return {}


def lookup(bits: int, n: int, kdim: int, m_pad: int, symmetric: bool = False):
    """(block_n, block_k) from the measured table, or None.

    Entries are preferred by operand layout (":sym" = symmetric no-qbias
    kernels, ":asym" = stored-qbias stream — one more resident operand and
    ~10% more HBM bytes can move the winner), falling back to un-suffixed
    legacy entries measured before the layout split."""
    table = _load_table()
    base = f"{bits}:{n}:{kdim}:{m_bucket(m_pad)}"
    entry = table.get(f"{base}:{'sym' if symmetric else 'asym'}") or table.get(base)
    return tuple(entry) if entry else None


# --------------------------------------------------------------------------
# Measurement
# --------------------------------------------------------------------------


def _time_config(x, qt, bn, bk, reps: int) -> float:
    """Time one tile config with `reps` kernel calls folded into ONE
    dispatch (lax.scan with per-iteration inputs — no CSE, no hoist): the
    per-executable launch + tunnel roundtrip amortizes over reps, so even
    decode-size (M=8) GEMV configs rank ABOVE the noise floor that a
    dispatch-per-rep loop buried them under. Small-M runs scale reps up so
    the in-dispatch compute dominates the constant overhead."""
    import time

    import jax
    import jax.numpy as jnp

    from ...runtime import on_tpu
    from .quant_matmul import _quant_matmul_p

    interp = not on_tpu()
    m = x.shape[0]
    if m <= 16 and not interp:
        reps = max(reps, 256)
    scales_i = (1.0 + 1e-3 * jnp.arange(reps, dtype=jnp.float32)).astype(x.dtype)
    xs = x[None] * scales_i[:, None, None]  # [reps, M, K] distinct inputs

    def scan_run(codes, scales, qbias, xs_):
        def body(acc, xv):
            y = _quant_matmul_p(
                xv, codes, scales, qbias, bits=qt.bits,
                group_size=qt.group_size, block_n=bn, block_k=bk,
                interpret=interp, qbias_coeff=qt.qbias_coeff,
            )
            return acc + jnp.sum(y.astype(jnp.float32)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0), xs_)
        return acc

    f = jax.jit(scan_run)
    jax.device_get(f(qt.codes, qt.scales, qt.qbias, xs))  # compile + settle
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        jax.device_get(f(qt.codes, qt.scales, qt.qbias, xs))
        dt = (time.perf_counter() - t0) / reps
        best = dt if best is None else min(best, dt)
    return best


def _valid(bits, n, kdim, g, bn, bk) -> bool:
    kp = kdim // 2 if bits == 4 else kdim
    gsub = g // 2 if bits == 4 else g
    return n % bn == 0 and kp % bk == 0 and bk % gsub == 0


def autotune_shapes(shapes, *, bits=4, group_size=32, m_list=(8, 512),
                    reps=32, seed=0, verbose=True) -> dict:
    """Measure `shapes` = [(n, k), ...] across CANDIDATES and M buckets on
    the current device; returns {key: [bn, bk]} for the winners."""
    import jax.numpy as jnp
    import numpy as np

    from ...quant.format import QuantizedTensor

    rng = np.random.default_rng(seed)
    table = {}
    for n, kdim in shapes:
        kp = kdim // 2 if bits == 4 else kdim
        # symmetric + bf16 scales: the flagship's layout (no qbias stream,
        # single-pass bf16 expansion dot) — what the table will serve.
        qt = QuantizedTensor(
            codes=jnp.asarray(rng.integers(0, 255, (n, kp), dtype=np.uint8)),
            scales=jnp.asarray((rng.random((n, kdim // group_size)) * 0.01)
                               .astype(np.float32), dtype=jnp.bfloat16),
            qbias=None,
            bits=bits, group_size=group_size,
            qbias_coeff=-float(1 << (bits - 1)),
        )
        for m in m_list:
            x = jnp.asarray(rng.standard_normal((m, kdim)), jnp.bfloat16)
            best = None
            for bn, bk in CANDIDATES:
                if not _valid(bits, n, kdim, group_size, bn, bk):
                    continue
                dt = _time_config(x, qt, bn, bk, reps)
                if verbose:
                    print(f"  N={n} K={kdim} M={m} bn={bn} bk={bk}: {dt*1e3:.3f} ms")
                if best is None or dt < best[0]:
                    best = (dt, bn, bk)
            if best is not None:
                key = f"{bits}:{n}:{kdim}:{m_bucket(max(8, -(-m // 8) * 8))}:sym"
                table[key] = [best[1], best[2]]
                if verbose:
                    print(f"{key} -> {table[key]} ({best[0]*1e3:.3f} ms)")
    return table


def model_linear_shapes(decoder_config) -> list:
    """The distinct quantized-linear (N, K) shapes of a model (qkv/out/
    up/down per layer + readout)."""
    from ...config.model import AttentionConfig, DenseMLPConfig

    shapes = set()
    cfg = decoder_config
    tcfg = cfg.transformer_config
    d = tcfg.model_dim
    for lc in tcfg.layer_configs:
        m = lc.mixer_config
        if isinstance(m, AttentionConfig):
            q_dim = m.num_heads * m.head_dim
            kv = m.num_groups * m.head_dim
            shapes.add((q_dim + 2 * kv, d))
            shapes.add((d, q_dim))
        if isinstance(lc.mlp_config, DenseMLPConfig):
            hid = lc.hidden_dim or tcfg.hidden_dim
            shapes.add((2 * hid, d))
            shapes.add((d, hid))
    shapes.add((cfg.vocab_size, d))
    return sorted(shapes)


def validate_e2e(model_dir: str, *, max_context: int = 1024, steps: int = 96,
                 rounds: int = 5, warm: int = 24, verbose: bool = True) -> dict:
    """A/B the MEASURED tile table against the built-in heuristics on the
    full fused decode loop (the validation step CLAUDE.md demands before
    shipping gemv-bucket entries: microbench rankings at decode sizes sit
    under the launch-noise floor, so only the end-to-end step can promote
    them). Interleaved rounds, median of per-round diffs — the house A/B
    method for a time-shared chip. Returns ms/token for both policies and
    the winner; does NOT modify the table."""
    import time

    import numpy as np

    prompt = (np.arange(48, dtype=np.int32) * 13) % 128
    prior = os.environ.get("UZU_TPU_TILE_TABLE")

    def build_and_warm(table_off: bool):
        # UZU_TPU_TILE_TABLE is read LAZILY at first trace through
        # _load_table, so the policy env must stay in force through this
        # model's warm pass (which compiles every executable the timed
        # loop reuses) — switching the env before warming would compile
        # BOTH models under the same policy and reduce the A/B to
        # run-ordering noise
        from ...engine.engine import LanguageModel

        if table_off:
            os.environ["UZU_TPU_TILE_TABLE"] = os.devnull
        elif prior is not None:
            os.environ["UZU_TPU_TILE_TABLE"] = prior
        else:
            os.environ.pop("UZU_TPU_TILE_TABLE", None)
        _load_table.cache_clear()
        lm = LanguageModel.from_dir(model_dir, max_context=max_context,
                                    prefill_buckets=(64,))
        # warm with the EXACT timed shape: a different step count would
        # compile different fused-chunk executables inside the timed region
        lm.generate_list(prompt, steps, stop_token_ids=[])
        return lm

    lms = {"heuristic": build_and_warm(True), "table": build_and_warm(False)}
    times: dict = {"heuristic": [], "table": []}
    del warm
    for _ in range(rounds):
        for name, lm in lms.items():
            t0 = time.perf_counter()
            lm.generate_list(prompt, steps, stop_token_ids=[])
            times[name].append((time.perf_counter() - t0) / steps * 1e3)
    if prior is not None:
        os.environ["UZU_TPU_TILE_TABLE"] = prior
    else:
        os.environ.pop("UZU_TPU_TILE_TABLE", None)
    _load_table.cache_clear()
    diffs = [h - t for h, t in zip(times["heuristic"], times["table"])]
    out = {
        "heuristic_ms": float(np.median(times["heuristic"])),
        "table_ms": float(np.median(times["table"])),
        "median_diff_ms": float(np.median(diffs)),
        "winner": "table" if float(np.median(diffs)) > 0 else "heuristic",
    }
    if verbose:
        print(f"heuristic: {out['heuristic_ms']:.3f} ms/tok  "
              f"table: {out['table_ms']:.3f} ms/tok  "
              f"diff: {out['median_diff_ms']:+.3f} -> {out['winner']}")
    return out


def save_table(table: dict, path: str | None = None) -> str:
    if path is None:
        os.makedirs(TABLE_DIR, exist_ok=True)
        path = os.path.join(TABLE_DIR, f"{_device_key()}.json")
    existing = {}
    try:
        with open(path) as f:
            existing = json.load(f)
    except (OSError, json.JSONDecodeError):
        pass
    existing.update(table)
    with open(path, "w") as f:
        json.dump(existing, f, indent=1, sort_keys=True)
    _load_table.cache_clear()
    return path

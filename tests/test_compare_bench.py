"""Cross-round bench comparison tool (tools/compare_bench.py).

Role parity: /root/reference/tools/model_compare/main.py:14-60 (load
recorded profiles, build comparison rows, surface the worst movers)."""

import json

from uzu_tpu.tools.compare_bench import (
    build_comparison,
    format_table,
    load_record,
    main,
)

R1 = {"metric": "decode_tok_s", "value": 200.0, "batch4_tok_s": 520.0,
      "ttft_s": 0.04, "practical_bw_gbs": 220.0, "weight_bytes": 695,
      "micro": {"decode_step_ms": 5.0, "quant_matmul_up_ms": 0.066}}


def test_load_driver_wrapper_and_raw(tmp_path):
    raw = tmp_path / "raw.json"
    raw.write_text(json.dumps(R1))
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"n": 1, "rc": 0, "parsed": R1}))
    log = tmp_path / "log.txt"
    log.write_text("WARNING: stuff\n" + json.dumps(R1) + "\n")
    a, b, c = load_record(str(raw)), load_record(str(wrapped)), load_record(str(log))
    assert a == b == c
    assert a["micro.decode_step_ms"] == 5.0
    assert a["value"] == 200.0


def test_window_noise_not_flagged_when_bw_normalized():
    # Raw decode drops 15% but the window's achievable stream dropped the
    # same 15% -> bw-normalized delta ~0 -> no regression.
    a = dict(R1)
    b = dict(R1, value=170.0, practical_bw_gbs=187.0)
    rows = {r.name: r for r in build_comparison(_f(a), _f(b), threshold=0.1)}
    row = rows["value"]
    assert row.delta < -0.1
    assert abs(row.norm_delta) < 0.02
    assert not row.regression


def test_latency_window_noise_not_flagged():
    # Pure window noise: latency up 17.6% (1/0.85) while the achievable
    # stream dropped 15% — latency*bw is the window-invariant quantity, so
    # the normalized delta must be ~0 and NOT flag. (Dividing latency by bw
    # would have produced a false ~-38% regression.)
    b = dict(R1, practical_bw_gbs=187.0,
             micro={"decode_step_ms": 5.0 * 220.0 / 187.0,
                    "quant_matmul_up_ms": 0.066 * 220.0 / 187.0})
    rows = {r.name: r for r in build_comparison(_f(R1), _f(b), threshold=0.1)}
    for name in ("micro.decode_step_ms", "micro.quant_matmul_up_ms"):
        row = rows[name]
        assert row.delta < -0.1  # raw latency did go up
        assert abs(row.norm_delta) < 0.02
        assert not row.regression


def test_latency_true_regression_not_masked_by_fast_window():
    # Latency got genuinely 40% worse AND the window got 15% faster: raw
    # latency looks only mildly worse but latency*bw exposes the regression.
    b = dict(R1, practical_bw_gbs=253.0,
             micro={"decode_step_ms": 7.0, "quant_matmul_up_ms": 0.066})
    rows = {r.name: r for r in build_comparison(_f(R1), _f(b), threshold=0.3)}
    row = rows["micro.decode_step_ms"]
    assert row.norm_delta < -0.3
    assert row.regression


def test_load_skips_trailing_non_bench_json(tmp_path):
    log = tmp_path / "log.txt"
    log.write_text(json.dumps(R1) + "\n"
                   + json.dumps({"stage": "done", "elapsed": 12.0}) + "\n")
    rec = load_record(str(log))
    assert rec["value"] == 200.0


def test_true_regression_flagged_and_latency_direction():
    b = dict(R1, micro={"decode_step_ms": 8.0, "quant_matmul_up_ms": 0.066})
    rows = {r.name: r for r in build_comparison(_f(R1), _f(b), threshold=0.2)}
    step = rows["micro.decode_step_ms"]
    assert step.delta < -0.2  # latency UP = delta negative (worse)
    assert step.regression
    # improvement direction: fewer weight bytes = positive delta
    c = dict(R1, weight_bytes=600)
    rows = {r.name: r for r in build_comparison(_f(R1), _f(c))}
    assert rows["weight_bytes"].delta > 0


def test_cli_exit_codes(tmp_path, capsys):
    pa = tmp_path / "a.json"
    pb = tmp_path / "b.json"
    pa.write_text(json.dumps(R1))
    pb.write_text(json.dumps(dict(R1, value=210.0)))
    assert main([str(pa), str(pb)]) == 0
    pb.write_text(json.dumps(dict(R1, value=100.0)))
    assert main([str(pa), str(pb)]) == 1
    out = capsys.readouterr().out
    assert "REGRESSION" in out and "value" in out


def test_format_table_renders_all_rows():
    b = dict(R1, value=210.0)
    rows = build_comparison(_f(R1), _f(b))
    txt = format_table(rows, "r1", "r2")
    assert txt.count("\n") == len(rows)


def _f(d):
    from uzu_tpu.tools.compare_bench import _flatten
    return _flatten(d)

"""CLI tests (role parity with crates/cli: bench task -> BenchResult JSON,
synth, classify, ppl)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from uzu_tpu.cli import main
from uzu_tpu.tools.synth import synth_chat_model


@pytest.fixture(scope="module")
def chat_dir(tmp_path_factory):
    return synth_chat_model(
        str(tmp_path_factory.mktemp("cli_model")),
        num_layers=2, model_dim=64, hidden_dim=160,
        num_heads=4, num_groups=2, head_dim=16,
    )


def test_bench_emits_benchresult(chat_dir, tmp_path, capsys):
    task = {
        "identifier": "t", "repo_id": "local", "number_of_runs": 2,
        "tokens_limit": 8, "greedy": True,
        "messages": [{"role": "user", "content": "hello"}],
    }
    task_path = str(tmp_path / "task.json")
    out_path = str(tmp_path / "out.json")
    with open(task_path, "w") as f:
        json.dump(task, f)
    rc = main(["bench", chat_dir, task_path, out_path, "--max-context", "128"])
    assert rc == 0
    with open(out_path) as f:
        result = json.load(f)
    for key in ("task", "device", "engine_version", "tokens_count_output",
                "time_to_first_token", "prompt_tokens_per_second",
                "generate_tokens_per_second", "text"):
        assert key in result
    assert result["tokens_count_output"] > 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "decode_tok_s" in summary


def test_synth_command(tmp_path):
    out = str(tmp_path / "m")
    assert main(["synth", "llama", out]) == 0
    import os

    assert os.path.exists(out + "/model.safetensors")


def test_ppl_command(chat_dir, tmp_path, capsys):
    text = tmp_path / "corpus.txt"
    text.write_text("the quick brown fox jumps over the lazy dog " * 5)
    rc = main(["ppl", chat_dir, str(text), "--max-context", "128"])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["ppl"] > 0 and out["count"] > 10


def test_cli_storage_list_and_delete(tmp_path, capsys):
    """storage subcommand (reference cli storage parity)."""
    import json as _json

    from uzu_tpu.cli import main
    from uzu_tpu.tools.synth import llama_config, synthesize

    cfg = llama_config(num_layers=1, model_dim=32, hidden_dim=64, num_heads=2,
                       num_groups=1, head_dim=16, vocab_size=64)
    synthesize(cfg, str(tmp_path / "m1"), seed=1)
    synthesize(cfg, str(tmp_path / "m2"), seed=2)

    assert main(["storage", str(tmp_path)]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert {r["id"] for r in rows} == {"m1", "m2"}
    assert all(r["size_bytes"] > 0 for r in rows)

    assert main(["storage", str(tmp_path), "--delete", "m1"]) == 0
    capsys.readouterr()
    assert main(["storage", str(tmp_path)]) == 0
    rows = _json.loads(capsys.readouterr().out)
    assert {r["id"] for r in rows} == {"m2"}

    assert main(["storage", str(tmp_path), "--delete", "nope"]) == 1


def test_chat_constrained_flags(chat_dir, tmp_path, capsys, monkeypatch):
    """`chat --json-schema` / `--regex` constrain the interactive stream."""
    schema = {"type": "object", "properties": {"city": {"enum": ["Paris"]}},
              "required": ["city"]}
    sf = tmp_path / "schema.json"
    sf.write_text(json.dumps(schema))
    lines = iter(["hello", ""])
    monkeypatch.setattr("builtins.input", lambda *_: next(lines))
    rc = main(["chat", chat_dir, "--max-tokens", "32", "--max-context", "128",
               "--json-schema", str(sf)])
    assert rc == 0
    out = capsys.readouterr().out
    body = out.split("exit)")[1].split("[")[0].strip()
    from uzu_tpu.grammar import JsonMatcher

    assert JsonMatcher(schema).feed_text(body), body

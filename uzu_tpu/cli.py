"""Command-line interface: bench / serve / chat / classify / synth / ppl.

Role parity: crates/cli (main.rs:19-38 — bench | server | storage |
interactive chat). The bench subcommand consumes the reference's
benchmark_task.json shape (BenchTask, cli/src/bench/model.rs:6-19) and
emits BenchResult-compatible JSON (model.rs:55-68) so existing tooling can
compare runs across engines.

    python -m uzu_tpu.cli bench  <model_dir> <task.json> <out.json>
    python -m uzu_tpu.cli serve  <model_dir> [--port 8000] [--host ...]
    python -m uzu_tpu.cli chat   <model_dir> [--max-tokens N]
    python -m uzu_tpu.cli classify <model_dir> <text...>
    python -m uzu_tpu.cli synth  <kind> <out_dir> [--seed N]
    python -m uzu_tpu.cli ppl    <model_dir> <text file>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _load_chat(model_dir: str, max_context: int, tp=None, dp=None,
               speculate=None):
    from uzu_tpu import LanguageModel
    from uzu_tpu.sessions import ChatSession, Tokenizer

    lm = LanguageModel.from_dir(model_dir, max_context=max_context, tp=tp, dp=dp)
    tok = Tokenizer(model_dir)
    speculator = speculate  # "self" / "fused-self" strings pass through
    spec_cfg = os.path.join(model_dir, "speculator", "config.json")
    if speculator is None and os.path.exists(spec_cfg):
        try:
            from uzu_tpu.engine.dflash import DFlashDraft
            from uzu_tpu.engine.speculation import (
                DFlashSpeculativeDecoder,
                speculation_supported,
            )

            if speculation_supported(lm.decoder_config):
                draft = DFlashDraft.from_dir(os.path.dirname(spec_cfg),
                                             max_context=max_context)
                speculator = DFlashSpeculativeDecoder(lm, draft)
        except Exception:
            speculator = None
    return ChatSession(lm, tok, speculator=speculator)


def cmd_bench(args) -> int:
    from uzu_tpu.engine.sampling import SamplingParams

    with open(args.task) as f:
        task = json.load(f)
    session = _load_chat(args.model_dir, args.max_context, args.tp, args.dp)

    messages = [
        {"role": m["role"], "content": m["content"]} for m in task.get("messages", [])
    ]
    limit = int(task.get("tokens_limit", 128))
    runs = int(task.get("number_of_runs", 1))
    sampling = SamplingParams() if task.get("greedy", True) else None

    # warmup (runner.rs:67-68)
    session.reset()
    session.reply(list(messages), sampling=sampling, max_new_tokens=min(limit, 8))

    from uzu_tpu.tools.telemetry import ResourceMeter, device_memory

    meter = ResourceMeter()
    meter.start()
    results = []
    for _ in range(runs):
        session.reset()
        reply = session.reply(list(messages), sampling=sampling, max_new_tokens=limit)
        results.append(reply)
    reading = meter.stop()
    dev = device_memory()

    last = results[-1]
    mean = lambda xs: sum(xs) / len(xs)
    out = {
        "task": task,
        "device": {
            "os_name": sys.platform,
            "cpu_name": _device_kind(),
            "memory_total": 0,
        },
        "engine_version": _version(),
        "timestamp": int(time.time()),
        "data_type": "bf16",
        "memory_used": dev.live_buffer_bytes if dev else reading.peak_rss_bytes,
        "peak_rss_bytes": reading.peak_rss_bytes,
        "cpu_utilization": round(reading.cpu_utilization, 3),
        "tokens_count_input": last.stats.tokens_count_input,
        "tokens_count_output": last.stats.tokens_count_output,
        "time_to_first_token": mean([r.stats.time_to_first_token for r in results]),
        "prompt_tokens_per_second": mean(
            [r.stats.prefill_tokens_per_second for r in results]
        ),
        "generate_tokens_per_second": mean(
            [r.stats.generate_tokens_per_second for r in results]
        ),
        "text": last.text,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({
        "ttft": round(out["time_to_first_token"], 4),
        "prefill_tok_s": round(out["prompt_tokens_per_second"], 2),
        "decode_tok_s": round(out["generate_tokens_per_second"], 2),
    }))
    return 0


def cmd_serve(args) -> int:
    name = os.path.basename(args.model_dir.rstrip("/")) or "uzu-tpu"
    if args.batched:
        from uzu_tpu import LanguageModel
        from uzu_tpu.server import serve_batched
        from uzu_tpu.sessions import Tokenizer

        lm = LanguageModel.from_dir(args.model_dir, max_context=args.max_context,
                                    tp=args.tp, dp=args.dp)
        httpd = serve_batched(lm, Tokenizer(args.model_dir), host=args.host,
                              port=args.port, model_name=name,
                              batch_size=args.batch_size,
                              speculate=args.speculate)
    else:
        if args.speculate:
            print("warning: --speculate applies to the --batched server "
                  "only; serving plain single-stream", file=sys.stderr)
        session = _load_chat(args.model_dir, args.max_context, args.tp, args.dp)
        from uzu_tpu.server import serve

        httpd = serve(session, host=args.host, port=args.port, model_name=name)
    print(f"serving OpenAI-compatible API on http://{args.host}:{httpd.server_address[1]}/v1")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        httpd.shutdown()
    return 0


def cmd_chat(args) -> int:
    from uzu_tpu.engine.sampling import SamplingParams

    session = _load_chat(args.model_dir, args.max_context, args.tp, args.dp,
                         speculate=args.speculate)
    sampling = SamplingParams(temperature=args.temperature, top_p=0.95) \
        if args.temperature else SamplingParams()

    def make_grammar():
        """Fresh per turn: a GrammarSession is single-use (its matcher
        advances with the emitted stream)."""
        if not (args.json_schema or args.regex):
            return None
        from uzu_tpu.grammar import GrammarSession

        if args.regex:
            return GrammarSession(session.tokenizer, regex=args.regex)
        schema = None
        if args.json_schema != "-":  # "-" = any JSON value
            with open(args.json_schema) as f:
                schema = json.load(f)
        kw = {}
        if args.json_indent is not None:
            kw = dict(any_whitespace=False, indent=args.json_indent)
        elif args.json_compact:
            kw = dict(any_whitespace=False, separators=(",", ":"))
        return GrammarSession(session.tokenizer, schema=schema, **kw)

    print("(interactive chat; empty line or Ctrl-D to exit)")
    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            break
        for ev in session.stream(line, sampling=sampling,
                                 max_new_tokens=args.max_tokens,
                                 grammar=make_grammar()):
            if ev.kind == "text":
                print(ev.delta, end="", flush=True)
        print()
        reply = session.last_reply
        session.messages.append({"role": "assistant", "content": reply.text})
        s = reply.stats
        print(f"  [{s.tokens_count_output} tok, {s.generate_tokens_per_second:.1f} tok/s]")
    return 0


def cmd_classify(args) -> int:
    from uzu_tpu.models.classifier import ClassifierModel
    from uzu_tpu.sessions import Tokenizer

    clf = ClassifierModel.from_dir(args.model_dir)
    tok = Tokenizer(args.model_dir)
    ids = tok.encode(" ".join(args.text))
    print(json.dumps(clf.classify(ids), indent=1))
    return 0


def cmd_synth(args) -> int:
    from uzu_tpu.tools import synth as S

    builders = {
        "llama": S.llama_config,
        "qwen3": S.qwen3_config,
        "qwen35": S.qwen35_config,
        "lfm2": S.lfm2_config,
        "mamba2": S.mamba2_hybrid_config,
        "gemma": S.gemma_config,
        "moe": S.moe_config,
    }
    if args.kind == "chat":
        S.synth_chat_model(args.out_dir, seed=args.seed)
    elif args.kind in builders:
        S.synthesize(builders[args.kind](), args.out_dir, seed=args.seed)
    else:
        print(f"unknown kind {args.kind}; one of: chat, {', '.join(builders)}")
        return 1
    print(args.out_dir)
    return 0


def cmd_storage(args) -> int:
    """Model storage manager (reference: cli storage subcommand,
    cli/src/main.rs:19-38): list local models with sizes, delete one."""
    import shutil

    from uzu_tpu.engine.facade import LocalRegistry

    reg = LocalRegistry(args.models_dir)
    if args.delete:
        target = os.path.join(args.models_dir, args.delete)
        if not os.path.isdir(target):
            print(f"no such model: {args.delete}", file=sys.stderr)
            return 1
        shutil.rmtree(target)
        print(f"deleted {args.delete}")
        return 0
    rows = [
        {"id": info.id, "kind": info.kind, "size_bytes": info.size_bytes,
         "path": info.path}
        for info in reg.models()
    ]
    print(json.dumps(rows, indent=1))
    return 0


def cmd_autotune(args) -> int:
    """Measure fused-matmul tile configs for a model's linear shapes on the
    current device and save the table (the reference's fleet-tuned GEMV
    tables, matmul/gemv/policy.rs)."""
    from uzu_tpu.config import load_language_model_config
    from uzu_tpu.ops.pallas.autotune import (
        autotune_shapes,
        model_linear_shapes,
        save_table,
    )

    if args.validate_e2e:
        from uzu_tpu.ops.pallas.autotune import validate_e2e

        out = validate_e2e(args.model_dir)
        print(json.dumps(out))
        return 0
    cfg = load_language_model_config(os.path.join(args.model_dir, "config.json"))
    shapes = model_linear_shapes(cfg.decoder_config)
    print(f"shapes: {shapes}")
    table = autotune_shapes(shapes, reps=args.reps)
    path = save_table(table)
    print(f"saved {len(table)} entries to {path}")
    return 0


def cmd_ppl(args) -> int:
    from uzu_tpu import LanguageModel
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.quality import sequence_nll

    lm = LanguageModel.from_dir(args.model_dir, max_context=args.max_context,
                                kv_quant=args.kv_quant, tp=args.tp, dp=args.dp)
    tok = Tokenizer(args.model_dir)
    with open(args.textfile) as f:
        ids = tok.encode(f.read())[: args.max_context]
    print(json.dumps(sequence_nll(lm, ids)))
    return 0


def _device_kind() -> str:
    try:
        import jax

        return str(jax.devices()[0].device_kind)
    except Exception:
        return "unknown"


def _version() -> str:
    import uzu_tpu

    return getattr(uzu_tpu, "__version__", "0.1.0")


def _mesh_flags(sp) -> None:
    """Multi-chip serving flags: shard the model over a (dp, tp) device mesh
    (GSPMD; no flags = single-device)."""
    sp.add_argument("--tp", type=int, default=None,
                    help="tensor-parallel ways (shards heads/hidden over chips)")
    sp.add_argument("--dp", type=int, default=None,
                    help="data-parallel ways (shards batch slots over chips)")


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="uzu_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("bench")
    b.add_argument("model_dir"); b.add_argument("task"); b.add_argument("out")
    b.add_argument("--max-context", type=int, default=4096, dest="max_context")
    _mesh_flags(b)
    b.set_defaults(fn=cmd_bench)

    s = sub.add_parser("serve")
    s.add_argument("model_dir")
    s.add_argument("--host", default="127.0.0.1"); s.add_argument("--port", type=int, default=8000)
    s.add_argument("--max-context", type=int, default=4096, dest="max_context")
    s.add_argument("--batched", action="store_true",
                   help="continuous batching (concurrent requests share the chip)")
    s.add_argument("--batch-size", type=int, default=4, dest="batch_size")
    s.add_argument("--speculate", nargs="?", const="ngram", default=False,
                   choices=("ngram", "self", "fused-self", "fused-ngram"),
                   help="batched chain speculation: 'ngram' (per-slot host "
                        "drafts), 'self' (fused device-side layer-"
                        "truncated self-draft), 'fused-self' (self-draft "
                        "+ 8 rounds per dispatch), or 'fused-ngram' "
                        "(device prompt-lookup drafts + 8 rounds, zero "
                        "draft compute); requires --batched")
    _mesh_flags(s)
    s.set_defaults(fn=cmd_serve)

    c = sub.add_parser("chat")
    c.add_argument("model_dir")
    c.add_argument("--max-tokens", type=int, default=512, dest="max_tokens")
    c.add_argument("--temperature", type=float, default=None)
    c.add_argument("--max-context", type=int, default=4096, dest="max_context")
    c.add_argument("--json-schema", default=None, dest="json_schema",
                   help="constrain replies to a JSON schema file ('-' = any JSON)")
    c.add_argument("--json-indent", type=int, default=None, dest="json_indent",
                   help="force exact pretty-printed JSON at this indent")
    c.add_argument("--json-compact", action="store_true", dest="json_compact",
                   help="force exact compact JSON (no whitespace)")
    c.add_argument("--regex", default=None,
                   help="constrain replies to a regex pattern")
    c.add_argument("--speculate", default=None,
                   choices=("self", "fused-self", "fused-ngram"),
                   help="single-stream speculation: 'self' (per-round "
                        "layer-truncated self-draft), 'fused-self' "
                        "(multi-round fused dispatches), or 'fused-ngram' "
                        "(fused prompt-lookup, zero draft compute)")
    _mesh_flags(c)
    c.set_defaults(fn=cmd_chat)

    cl = sub.add_parser("classify")
    cl.add_argument("model_dir"); cl.add_argument("text", nargs="+")
    cl.set_defaults(fn=cmd_classify)

    sy = sub.add_parser("synth")
    sy.add_argument("kind"); sy.add_argument("out_dir")
    sy.add_argument("--seed", type=int, default=0)
    sy.set_defaults(fn=cmd_synth)

    at = sub.add_parser("autotune")
    at.add_argument("model_dir")
    at.add_argument("--reps", type=int, default=32)
    at.add_argument("--validate-e2e", action="store_true", dest="validate_e2e",
                    help="A/B the measured tile table vs the heuristics on "
                         "the full decode loop (interleaved rounds)")
    at.set_defaults(fn=cmd_autotune)

    st = sub.add_parser("storage")
    st.add_argument("models_dir")
    st.add_argument("--delete", default=None)
    st.set_defaults(fn=cmd_storage)

    pp = sub.add_parser("ppl")
    pp.add_argument("model_dir"); pp.add_argument("textfile")
    pp.add_argument("--max-context", type=int, default=2048, dest="max_context")
    pp.add_argument("--kv-quant", action="store_true", dest="kv_quant")
    _mesh_flags(pp)
    pp.set_defaults(fn=cmd_ppl)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())

"""Golden response fixtures: per-family template render + stream-parse
expectations (the role of the reference's workspace/data/responses/*.json
catalog — each entry pins the EXACT rendered prompt for a message/tool set
and what the parser must extract from a canned completion).

Entries either name a built-in style ("qwen" / "llama" / "harmony") or carry
a "parser_config" dict — the per-model stream-parsing config a model dir
ships as parser_config.json (the reference's bundled per-family parsing
configs, hanashi/configs/parsing/*.json): NEW families parse via config
only, no code."""

import json
import os

import pytest

from uzu_tpu.sessions.parser import (
    LLAMA_STYLE,
    QWEN_STYLE,
    StreamParser,
    sections_from_config,
)
from uzu_tpu.sessions.template import ChatTemplate

FIXTURES = os.path.join(os.path.dirname(__file__), "fixtures",
                        "golden_responses.json")

with open(FIXTURES) as f:
    ENTRIES = json.load(f)

STYLES = {"qwen": QWEN_STYLE, "llama": LLAMA_STYLE}


def _make_template(entry):
    if entry.get("style") == "harmony":
        from uzu_tpu.sessions.harmony import HarmonyEncoding

        return HarmonyEncoding()
    return ChatTemplate(entry["template"])


def _make_parser(entry):
    if entry.get("style") == "harmony":
        from uzu_tpu.sessions.harmony import HarmonyParser

        return HarmonyParser()
    if "parser_config" in entry:
        cfg = entry["parser_config"]
        transform = None
        tcfg = cfg.get("transformation")
        if tcfg:
            from uzu_tpu.sessions.transform import TransformSchema

            transform = (TransformSchema.from_json(tcfg["schema"]),
                         tcfg["pipeline"])
        return StreamParser(sections_from_config(cfg["sections"]),
                            transform=transform)
    return StreamParser(STYLES[entry["style"]])


@pytest.mark.parametrize("entry", ENTRIES, ids=[e["family"] for e in ENTRIES])
def test_golden_render_and_parse(entry):
    t = _make_template(entry)
    prompt = t.render(entry["parameters"]["messages"],
                      tools=entry["parameters"]["tools"])
    assert prompt == entry["result"]["prompt"], (
        f"{entry['family']}: rendered prompt drifted\n"
        f"got:  {prompt!r}\nwant: {entry['result']['prompt']!r}"
    )

    parser = _make_parser(entry)
    text = ""
    reasoning = False
    tool_names = []
    # feed char-at-a-time: pins the partial-marker buffering too
    for ch in entry["completion"]:
        for ev in parser.push(ch):
            if ev.kind == "text":
                text += ev.delta
            elif ev.kind == "reasoning":
                reasoning = True
            elif ev.kind == "tool_call":
                tool_names.append(ev.tool_call["name"]
                                  if isinstance(ev.tool_call, dict)
                                  else ev.tool_call.name)
    for ev in parser.finish():
        if ev.kind == "text":
            text += ev.delta
        elif ev.kind == "reasoning":
            reasoning = True
        elif ev.kind == "tool_call":
            tool_names.append(ev.tool_call["name"]
                              if isinstance(ev.tool_call, dict)
                              else ev.tool_call.name)

    exp = entry["expectations"]
    assert reasoning == exp["reasoning"], entry["family"]
    assert tool_names == exp["tool_call_names"], entry["family"]
    assert text == exp["text"], (entry["family"], text)

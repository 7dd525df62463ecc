"""json-transform equivalent tests (sessions/transform.py).

Semantics pinned against the reference crate (crates/json-transform/src/
execution/*.rs): operation set, null-on-type-mismatch degradation, capacity
of pipelines to canonicalize model-specific tool-call text.
"""

import pytest

from uzu_tpu.sessions.parser import SectionConfig, StreamParser
from uzu_tpu.sessions.transform import (
    TransformError,
    TransformSchema,
    repair_json,
    split_top_level,
)


def test_basic_ops():
    s = TransformSchema({
        "main": [
            {"type": "parse_json"},
            {"type": "get", "key": "function"},
            {"type": "object", "fields": {
                "name": [{"type": "get", "key": "name"}],
                "arguments": [{"type": "get", "key": "args"},
                              {"type": "default", "value": {}}],
            }, "required": ["arguments"]},
        ]
    })
    out = s.execute("main", '{"function": {"name": "search", "args": {"q": "x"}}}')
    assert out == {"name": "search", "arguments": {"q": "x"}}


def test_get_path_and_first():
    s = TransformSchema({
        "p": [{"type": "get", "path": ["a", 1, "b"]}],
        "f": [{"type": "first"}],
    })
    assert s.execute("p", {"a": [{}, {"b": 7}]}) == 7
    assert s.execute("p", {"a": []}) is None
    assert s.execute("f", [3, 4]) == 3
    assert s.execute("f", []) is None
    assert s.execute("f", "notarray") is None


def test_regex_find_all_and_python_call_style():
    """Extract python-style calls: foo(a=1, b="x") -> canonical JSON."""
    s = TransformSchema({
        "calls": [
            {"type": "regex_find_all", "pattern": r"(\w+\([^)]*\))"},
            {"type": "each", "apply": [
                {"type": "object", "fields": {
                    "name": [{"type": "regex_replace", "pattern": r"^(\w+)\(.*$",
                              "template": "$1"}],
                    "arguments": [
                        {"type": "regex_replace", "pattern": r"^\w+\((.*)\)$",
                         "template": "{$1}"},
                        {"type": "regex_replace", "pattern": r"(\w+)=",
                         "template": '"$1":'},
                        {"type": "parse_json", "repair": True},
                    ],
                }, "required": ["name", "arguments"]},
            ]},
        ]
    })
    out = s.execute("calls", 'get_weather(city="Paris", days=3)')
    assert out == [{"name": "get_weather",
                    "arguments": {"city": "Paris", "days": 3}}]


def test_switch_resolve_on():
    s = TransformSchema({
        "main": [
            {"type": "switch",
             "key": [{"type": "get", "key": "kind"}],
             "cases": [
                 {"when": {"type": "equals", "value": "a"},
                  "then": [{"type": "literal", "value": "was_a"}]},
                 {"when": {"type": "starts_with", "value": "b"},
                  "then": [{"type": "literal", "value": "was_b"}]},
             ],
             "default": [{"type": "literal", "value": "other"}]},
        ],
        "res": [{"type": "resolve", "key": "unit",
                 "map": {"c": "celsius", "f": "fahrenheit"},
                 "default": "celsius"}],
        "on": [{"type": "on", "field": "active", "with": "payload",
                "do": [{"type": "format", "template": "<{}>"}]}],
    })
    assert s.execute("main", {"kind": "a"}) == "was_a"
    assert s.execute("main", {"kind": "bx"}) == "was_b"
    assert s.execute("main", {"kind": "z"}) == "other"
    assert s.execute("res", {"unit": "f"}) == {"unit": "fahrenheit"}
    assert s.execute("res", {"unit": "??"}) == {"unit": "celsius"}
    assert s.execute("on", {"active": True, "payload": "x"}) == "<x>"
    assert s.execute("on", {"active": False, "payload": "x"}) == "x"


def test_call_and_flat_map_join_filter():
    s = TransformSchema({
        "inner": [{"type": "get", "key": "v"}],
        "main": [
            {"type": "each", "apply": [{"type": "call", "name": "inner"}]},
            {"type": "filter", "condition": {"type": "not",
                                             "condition": {"type": "is_null"}}},
            {"type": "join", "separator": ","},
        ],
        "dyn": [{"type": "call", "key": "which", "arguments": {"v": "injected"}}],
    })
    assert s.execute("main", [{"v": "a"}, {}, {"v": "b"}]) == "a,b"
    assert s.execute("dyn", {"which": "inner"}) == "injected"
    with pytest.raises(TransformError):
        s.execute("missing", {})


def test_reduce_groups_consecutive():
    s = TransformSchema({
        "main": [{"type": "reduce",
                  "key": [{"type": "get", "key": "role"}],
                  "if": {"type": "equals", "value": "tool"},
                  "then": [
                      {"type": "each", "apply": [{"type": "get", "key": "text"}]},
                      {"type": "join", "separator": "+"},
                  ]}],
    })
    out = s.execute("main", [
        {"role": "tool", "text": "a"},
        {"role": "tool", "text": "b"},
        {"role": "user", "text": "c"},
        {"role": "tool", "text": "d"},
    ])
    assert out == ["a+b", {"role": "user", "text": "c"}, "d"]


def test_repair_json():
    assert repair_json("{'a': True, 'b': None,}") == '{"a": true, "b": null}'
    assert repair_json('{"x": [1, 2') == '{"x": [1, 2]}'
    assert repair_json('{key: "val"}') == '{"key": "val"}'
    # quoted content untouched
    assert repair_json('{"s": "True None {"}') == '{"s": "True None {"}'


def test_split_top_level():
    assert split_top_level('a, {b, c}, "d, e", f(g, h)', ",") == [
        "a", " {b, c}", ' "d, e"', " f(g, h)"]


def test_stream_parser_with_transform():
    """A transform pipeline canonicalizes non-JSON tool sections in-stream."""
    schema = TransformSchema({
        "tool": [
            {"type": "parse_json", "repair": True},
            {"type": "object", "fields": {
                "name": [{"type": "get", "key": "tool"}],
                "arguments": [{"type": "get", "key": "params"},
                              {"type": "default", "value": {}}],
            }, "required": ["name", "arguments"]},
            {"type": "to_array"},
        ]
    })
    p = StreamParser(
        [SectionConfig("tool_call", "<tool_call>", "</tool_call>")],
        transform=(schema, "tool"),
    )
    events = []
    for chunk in ["hi <tool_call>{tool: 'lookup', params: {q: 1",
                  "}}</tool_call> bye"]:
        events.extend(p.push(chunk))
    events.extend(p.finish())
    calls = [e for e in events if e.kind == "tool_call"]
    assert len(calls) == 1
    assert calls[0].tool_call["name"] == "lookup"
    assert calls[0].tool_call["arguments"] == {"q": 1}
    assert p.text.strip().startswith("hi")

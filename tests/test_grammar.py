"""Grammar-constrained decoding tests.

The decisive property (reference: xgrammar bitmask path, stream.rs:632-675):
a RANDOM-weight model forced through the grammar must emit syntactically
valid JSON conforming to the schema — the grammar, not the model, guarantees
structure.
"""

import json

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.sampling import SamplingParams
from uzu_tpu.grammar import GrammarSession, JsonMatcher, constrained_generate
from uzu_tpu.sessions import Tokenizer
from uzu_tpu.tools.synth import synth_chat_model


@pytest.fixture(scope="module")
def chat_dir(tmp_path_factory):
    return synth_chat_model(
        str(tmp_path_factory.mktemp("grammar_model")),
        num_layers=2, model_dim=64, hidden_dim=160,
        num_heads=4, num_groups=2, head_dim=16,
    )


# -- matcher unit tests -------------------------------------------------------


def test_matcher_accepts_valid_json():
    m = JsonMatcher()
    assert m.feed_text('{"a": [1, 2.5, "x"], "b": {"c": null}, "d": true}')
    assert m.is_complete()


def test_matcher_rejects_invalid():
    assert not JsonMatcher().feed_text('{"a": }')
    assert not JsonMatcher().feed_text("[1,, 2]")
    assert not JsonMatcher().feed_text('{"a" 1}')


def test_matcher_schema_constraints():
    schema = {
        "type": "object",
        "properties": {"city": {"type": "string"}, "days": {"type": "integer"}},
        "required": ["city"],
    }
    assert JsonMatcher(schema).feed_text('{"city": "Paris", "days": 3}')
    assert not JsonMatcher(schema).feed_text('{"town"')
    m = JsonMatcher(schema)
    assert not (m.feed_text("{") and m.feed_text("}"))  # missing required
    assert not JsonMatcher({"type": "integer"}).feed_text("1.5")
    assert JsonMatcher({"enum": ["red", "green"]}).feed_text('"green"')
    m = JsonMatcher({"enum": ["red", "green"]})
    assert not m.feed_text('"gx')


def test_matcher_array_bounds():
    schema = {"type": "array", "items": {"type": "integer"}, "maxItems": 2}
    assert JsonMatcher(schema).feed_text("[1, 2]")
    assert not JsonMatcher(schema).feed_text("[1, 2, 3]")


# -- constrained generation ----------------------------------------------------


def test_random_model_emits_valid_json(chat_dir):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    grammar = GrammarSession(tok, schema=None, stop_token_ids=tok.eos_token_ids)
    out = list(
        constrained_generate(
            lm, np.asarray(tok.encode("<|user|>give me json<|end|><|assistant|>")),
            96, grammar, sampling=SamplingParams(temperature=1.0, top_k=40), seed=3,
        )
    )
    text = tok.decode(out, skip_special_tokens=True)
    m = JsonMatcher()
    assert m.feed_text(text.strip()) , f"grammar let through invalid prefix: {text!r}"
    # if generation closed the value, it must parse
    if m.is_complete():
        json.loads(text)


def test_random_model_respects_schema(chat_dir):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    schema = {
        "type": "object",
        "properties": {"city": {"enum": ["Paris", "Rome"]}},
        "required": ["city"],
    }
    grammar = GrammarSession(tok, schema=schema, stop_token_ids=tok.eos_token_ids)
    out = list(
        constrained_generate(
            lm, np.asarray(tok.encode("<|user|>weather<|end|><|assistant|>")),
            64, grammar, sampling=SamplingParams(temperature=1.0, top_k=40), seed=9,
        )
    )
    text = tok.decode(out, skip_special_tokens=True).strip()
    assert JsonMatcher(schema).feed_text(text), text


# -- native (C++) backend -------------------------------------------------------


def test_native_matches_python_masks(chat_dir):
    """The C++ engine (native/grammar.cpp) and the Python matcher must
    produce identical token masks along a generation trajectory."""
    pytest.importorskip("ctypes")
    from uzu_tpu.grammar.native_backend import NativeGrammar

    tok = Tokenizer(chat_dir)
    schema = {
        "type": "object",
        "properties": {
            "city": {"enum": ["Paris", "Rome"]},
            "days": {"type": "integer"},
            "tags": {"type": "array", "items": {"type": "string"}, "maxItems": 2},
        },
        "required": ["city"],
    }
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native" and g_py.backend == "python"

    text = '{"city": "Paris", "days": 3, "tags": ["a"]}'
    # walk the text via tokenizer ids, comparing masks at every step
    ids = tok.encode(text)
    for i, tid in enumerate(ids):
        m_py = g_py.current_mask()
        m_nat = g_nat.current_mask()
        np.testing.assert_array_equal(m_nat, m_py, err_msg=f"mask diverged at step {i}")
        assert m_py[tid], f"step {i}: token {tok.id_to_token(tid)!r} should be allowed"
        g_py.observe(tid)
        g_nat.observe(tid)
    assert g_py.matcher.is_complete()
    assert g_nat.native.is_complete()


def test_native_mask_speed(chat_dir):
    """Native mask computation must be fast enough for per-step use."""
    import time

    from uzu_tpu.grammar.native_backend import NativeGrammar

    tok = Tokenizer(chat_dir)
    g = GrammarSession(tok, schema=None, backend="native")
    t0 = time.perf_counter()
    g.current_mask()
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    for _ in range(100):
        g.current_mask()  # cached state
    warm = (time.perf_counter() - t0) / 100
    assert warm < 0.01, f"cached mask too slow: {warm*1e3:.2f} ms"
    assert cold < 1.0, f"cold mask too slow: {cold*1e3:.1f} ms"


def test_constrained_generate_native_backend(chat_dir):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    schema = {"type": "object", "properties": {"city": {"enum": ["Paris", "Rome"]}},
              "required": ["city"]}
    grammar = GrammarSession(tok, schema=schema, stop_token_ids=tok.eos_token_ids,
                             backend="native")
    out = list(constrained_generate(
        lm, np.asarray(tok.encode("<|user|>w<|end|><|assistant|>")),
        64, grammar, sampling=SamplingParams(temperature=1.0, top_k=40), seed=9))
    text = tok.decode(out, skip_special_tokens=True).strip()
    assert JsonMatcher(schema).feed_text(text), text


# -- speculative grammar decoding ------------------------------------------------


def _greedy_constrained(chat_dir, schema, speculator=None, backend="auto"):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    grammar = GrammarSession(tok, schema=schema, stop_token_ids=tok.eos_token_ids,
                             backend=backend)
    out = list(
        constrained_generate(
            lm, np.asarray(tok.encode("<|user|>json please<|end|><|assistant|>")),
            48, grammar, sampling=SamplingParams(), seed=5, speculator=speculator,
        )
    )
    return out, tok


def test_speculative_grammar_matches_plain(chat_dir):
    """Grammar-constrained speculative decoding (per-draft-row masks from
    lookahead_masks — the reference's per-trie-node bitmask fill) emits the
    EXACT same greedy stream as the one-token-per-dispatch grammar path,
    on both matcher backends."""
    from uzu_tpu.engine.speculation import NgramSpeculator

    schema = {
        "type": "object",
        "properties": {"city": {"enum": ["Paris", "Rome"]}},
        "required": ["city"],
    }
    plain, tok = _greedy_constrained(chat_dir, schema)
    spec, _ = _greedy_constrained(chat_dir, schema,
                                  speculator=NgramSpeculator(max_ngram=3, k=6))
    assert spec == plain
    text = tok.decode(plain, skip_special_tokens=True).strip()
    assert JsonMatcher(schema).feed_text(text), text

    # python backend too (exercises the clone-based lookahead)
    plain_py, _ = _greedy_constrained(chat_dir, schema, backend="python")
    spec_py, _ = _greedy_constrained(chat_dir, schema, backend="python",
                                     speculator=NgramSpeculator(max_ngram=3, k=6))
    assert spec_py == plain_py == plain


def test_speculative_grammar_on_hybrid_matches_plain(tmp_path_factory):
    """Grammar speculation on a recurrent-mixer hybrid (GDN): the deferred
    state commit must keep the constrained stream identical to the plain
    one-token-per-dispatch grammar path."""
    from uzu_tpu.engine.speculation import NgramSpeculator
    from uzu_tpu.tools.synth import qwen35_config

    d = synth_chat_model(
        str(tmp_path_factory.mktemp("grammar_hybrid")),
        config=qwen35_config(num_layers=3, model_dim=64, hidden_dim=160,
                             num_heads=4, num_groups=2, head_dim=16,
                             value_head_dim=16, attn_every=3),
    )
    schema = {
        "type": "object",
        "properties": {"city": {"enum": ["Paris", "Rome"]}},
        "required": ["city"],
    }
    plain, tok = _greedy_constrained(d, schema)
    spec, _ = _greedy_constrained(d, schema,
                                  speculator=NgramSpeculator(max_ngram=3, k=6))
    assert spec == plain
    text = tok.decode(plain, skip_special_tokens=True).strip()
    assert JsonMatcher(schema).feed_text(text), text


def test_lookahead_masks_restore_state(chat_dir):
    """lookahead_masks must leave the session state untouched, truncate at
    grammar-forbidden draft tokens, and agree with sequential observation."""
    tok = Tokenizer(chat_dir)
    grammar = GrammarSession(tok, schema=None, stop_token_ids=tok.eos_token_ids)
    open_brace = tok.encode("{")[-1]
    quote = tok.encode('"')[-1]

    before = grammar.current_mask().copy()
    masks = grammar.lookahead_masks([open_brace, quote])
    assert len(masks) == 3
    np.testing.assert_array_equal(grammar.current_mask(), before)

    # sequential ground truth
    g2 = GrammarSession(tok, schema=None, stop_token_ids=tok.eos_token_ids)
    np.testing.assert_array_equal(masks[0], g2.current_mask())
    g2.observe(int(open_brace))
    np.testing.assert_array_equal(masks[1], g2.current_mask())
    g2.observe(int(quote))
    np.testing.assert_array_equal(masks[2], g2.current_mask())

    # a forbidden draft token truncates the mask list
    closing = tok.encode("}")[-1]
    fresh = GrammarSession(tok, schema=None, stop_token_ids=tok.eos_token_ids)
    if not fresh.current_mask()[int(closing)]:
        truncated = fresh.lookahead_masks([closing, open_brace])
        assert len(truncated) == 1


def test_number_prefix_validity():
    """Misplaced sign/exponent chars must be REJECTED at accept time — the
    old dot-count-only check let generation walk into a dead number state
    ('1-') that the mask could never terminate."""
    for bad in ["1-", "1e5e", "12e++", "01", "--1", "1.2.3", "1.e5"]:
        assert not JsonMatcher({"type": "number"}).feed_text(bad), bad
    for good in ["-0.5", "1e+5", "123", "0.25", "1E-2", "-7e10"]:
        m = JsonMatcher({"type": "number"})
        assert m.feed_text(good), good
        assert m.feed_text(" ") and m.is_complete(), good
    # terminators reject INCOMPLETE numbers (mid-exponent, bare sign)
    for partial in ["1e", "1e+", "-", "3."]:
        m = JsonMatcher({"type": "number"})
        assert m.feed_text(partial), partial
        assert not m.feed_text(" "), partial


def test_string_escape_validity():
    r"""\uXXXX needs exactly 4 hex digits; raw control chars are invalid."""
    assert JsonMatcher().feed_text('"a\\u0041b"')
    assert not JsonMatcher().feed_text('"a\\uZZ11b"')
    assert not JsonMatcher().feed_text('"a\\u12"')  # closes mid-escape
    assert not JsonMatcher().feed_text('"a\tb"')
    assert not JsonMatcher().feed_text('"a\rb"')
    assert JsonMatcher().feed_text('"a\\tb"')


def test_native_matches_python_numbers_and_escapes(chat_dir):
    """Lockstep masks through number edges and \\u escapes."""
    pytest.importorskip("ctypes")
    tok = Tokenizer(chat_dir)
    schema = {"type": "object",
              "properties": {"x": {"type": "number"}, "s": {"type": "string"}},
              "required": ["x"]}
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native"
    text = '{"x": -1.25e+2, "s": "a\\u0041\\n b"}'
    for i, tid in enumerate(tok.encode(text)):
        np.testing.assert_array_equal(
            g_nat.current_mask(), g_py.current_mask(),
            err_msg=f"mask diverged at step {i}")
        g_py.observe(tid)
        g_nat.observe(tid)
    np.testing.assert_array_equal(g_nat.current_mask(), g_py.current_mask())


def test_trigger_tail_feeds_matcher(chat_dir):
    """A token whose text completes the trigger AND carries body text must
    feed the post-trigger remainder to the matcher (dropping it would make
    the mask demand the body chars again)."""
    tok = Tokenizer(chat_dir)
    g = GrammarSession(tok, schema=None, trigger="<t>")
    assert not g.engaged
    g._text_tail = "<t"
    # use a session-local strings copy so we can synthesize a token whose
    # text is '>{' (trigger completion + JSON body in ONE token)
    g.token_strings = list(g.token_strings)
    g.token_strings[5] = ">{"
    g.observe(5)
    assert g.engaged
    # the matcher must have consumed '{': an object body can now complete
    assert g.observe_text('"a": 1}') is None  # feeds without breaking
    assert g._is_complete()


# -- combinators, $ref, pattern (reference: xgrammar schema scope,
# grammar/mod.rs:18-76) --------------------------------------------------------

ANYOF_SCHEMA = {
    "anyOf": [
        {"type": "object", "properties": {"a": {"type": "integer"}},
         "required": ["a"], "additionalProperties": False},
        {"type": "object", "properties": {"b": {"type": "string"}},
         "required": ["b"], "additionalProperties": False},
    ],
}

REF_SCHEMA = {
    "$defs": {"node": {
        "type": "object",
        "properties": {
            "v": {"type": "integer"},
            "next": {"anyOf": [{"$ref": "#/$defs/node"}, {"type": "null"}]},
        },
        "required": ["v"], "additionalProperties": False,
    }},
    "$ref": "#/$defs/node",
}


def test_matcher_anyof_forks():
    assert JsonMatcher(ANYOF_SCHEMA).feed_text('{"a": 3}')
    assert JsonMatcher(ANYOF_SCHEMA).feed_text('{"b": "x"}')
    assert not JsonMatcher(ANYOF_SCHEMA).feed_text('{"a": "x"')
    assert not JsonMatcher(ANYOF_SCHEMA).feed_text('{"c"')
    # the fork happens at the shared '{' prefix: both keys stay viable
    m = JsonMatcher(ANYOF_SCHEMA)
    assert m.feed_text('{"')
    assert m.accepts_text('a')
    assert m.accepts_text('b')
    assert not m.accepts_text('c')


def test_matcher_oneof_union():
    s = {"oneOf": [{"type": "integer"}, {"type": "null"}]}
    assert JsonMatcher(s).feed_text("-5 ")
    assert JsonMatcher(s).feed_text("null")
    assert not JsonMatcher(s).feed_text('"s"')


def test_matcher_ref_recursive():
    assert JsonMatcher(REF_SCHEMA).feed_text(
        '{"v": 1, "next": {"v": 2, "next": null}}')
    assert not JsonMatcher(REF_SCHEMA).feed_text('{"v": "s"')
    # unresolvable ref raises at use time
    from uzu_tpu.grammar import GrammarError
    with pytest.raises(GrammarError):
        JsonMatcher({"$ref": "#/$defs/nope"}).feed_text("1")


def test_matcher_ref_sibling_merge():
    # constraining siblings narrow the ref target (local keys win)
    s = {"$defs": {"c": {"type": "string"}},
         "$ref": "#/$defs/c", "enum": ["x", "y"]}
    assert JsonMatcher(s).feed_text('"x"')
    assert not JsonMatcher(s).feed_text('"z"')


@pytest.mark.parametrize("pattern,ok,bad", [
    ("^[a-z]+[0-9]$", ['"abc3"'], ['"abc"', '"3abc"', '"abc3x"']),
    ("cat", ['"the cat sat"', '"cat"'], ['"the dog sat"']),
    ("^ab", ['"abXYZ"'], ['"Xab"']),
    ("ab$", ['"XYab"', '"ab"'], ['"abX"']),
    ("^a\\nb$", ['"a\\nb"'], ['"anb"']),
    ("^A.B$", ['"A\\u0041B"', '"AxB"'], ['"AB"']),
])
def test_matcher_pattern_modes(pattern, ok, bad):
    s = {"type": "string", "pattern": pattern}
    for t in ok:
        assert JsonMatcher(s).feed_text(t), (pattern, t)
    for t in bad:
        assert not JsonMatcher(s).feed_text(t), (pattern, t)


def test_pattern_inside_object_mask_terminates(chat_dir):
    """Constrained generation over a pattern property terminates and emits
    a conforming value (the mask must keep the closing quote viable only
    when the pattern is satisfied)."""
    tok = Tokenizer(chat_dir)
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    schema = {"type": "object",
              "properties": {"id": {"type": "string", "pattern": "^[a-z]{2}[0-9]{2}$"}},
              "required": ["id"], "additionalProperties": False}
    grammar = GrammarSession(tok, schema=schema, backend="python")
    out = list(constrained_generate(
        lm, tok.encode("emit json"), 48, grammar,
        sampling=SamplingParams(temperature=1.0, top_k=40), seed=3))
    text = tok.decode(out, skip_special_tokens=True).strip()
    assert JsonMatcher(schema).feed_text(text), text
    val = json.loads(text)
    import re
    assert re.fullmatch(r"[a-z]{2}[0-9]{2}", val["id"]), val


def test_native_matches_python_combinators(chat_dir):
    """C++ and Python masks stay identical across anyOf forks, recursive
    $ref expansion, and pattern strings (the r4 schema-scope extension)."""
    from uzu_tpu.grammar.native_backend import NativeGrammar

    tok = Tokenizer(chat_dir)
    schema = {
        "$defs": REF_SCHEMA["$defs"],
        "anyOf": [
            {"$ref": "#/$defs/node"},
            {"type": "object",
             "properties": {"id": {"type": "string", "pattern": "^x-[0-9]+$"}},
             "required": ["id"], "additionalProperties": False},
        ],
    }
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native" and g_py.backend == "python"
    for text in ('{"v": 2, "next": {"v": 1, "next": null}}',
                 '{"id": "x-42"}'):
        g_py.reset()
        g_nat.reset()
        ids = tok.encode(text)
        for i, tid in enumerate(ids):
            m_py = g_py.current_mask()
            m_nat = g_nat.current_mask()
            np.testing.assert_array_equal(
                m_nat, m_py, err_msg=f"{text!r} diverged at step {i}")
            if not m_py[tid]:
                break  # tokenization may straddle; masks still compared
            g_py.observe(tid)
            g_nat.observe(tid)


@pytest.mark.parametrize("fmt,ok,bad", [
    ("uuid", ["123e4567-e89b-12d3-a456-426614174000"],
     ["123e4567-e89b-12d3-a456", "123e4567-e89b-12d3-a456-42661417400g"]),
    ("date", ["2026-08-20", "1999-12-31"],
     ["2026-13-01", "2026-00-10", "2026-08-32", "26-08-20"]),
    ("time", ["23:59:59Z", "08:00:00+05:30", "12:00:00.25Z"],
     ["24:00:00Z", "12:60:00Z", "12:00:00"]),
    ("date-time", ["2026-08-20T12:34:56Z", "2026-08-20T12:34:56-07:00"],
     ["2026-08-20 12:34:56Z", "2026-08-20T25:00:00Z"]),
    ("duration", ["P3Y6M4DT12H30M5S", "PT1M", "P2W"],
     ["P", "3Y", "P4DT"]),
    ("email", ["a.b+c@ex-ample.org"], ["a@b", "@x.com", "a b@x.com"]),
    ("hostname", ["example.com", "a", "x-1.y-2.z"],
     ["-bad.com", "bad-.com", "a..b"]),
    ("ipv4", ["192.168.0.1", "255.255.255.255", "0.0.0.0"],
     ["256.1.1.1", "1.2.3", "01.2.3.4.5"]),
    ("ipv6", ["2001:db8:85a3:0:0:8a2e:370:7334", "::", "fe80::1"],
     ["2001:db8", "12345::1"]),
    ("uri", ["https://example.com/a?b=1", "mailto:x@y.z"],
     ["not a uri", "//missing.scheme"]),
])
def test_matcher_format_strings(fmt, ok, bad):
    """Known `format` values constrain strings (xgrammar scope,
    grammar/mod.rs:18-76 — formats compile to regexes)."""
    s = {"type": "string", "format": fmt}
    for t in ok:
        assert JsonMatcher(s).feed_text(json.dumps(t)), (fmt, t)
    for t in bad:
        assert not JsonMatcher(s).feed_text(json.dumps(t)), (fmt, t)


def test_matcher_string_length_bounds():
    s = {"type": "string", "minLength": 2, "maxLength": 4}
    assert JsonMatcher(s).feed_text('"ab"')
    assert JsonMatcher(s).feed_text('"abcd"')
    assert JsonMatcher(s).feed_text('"a\\nb"')  # escapes count as one char
    assert not JsonMatcher(s).feed_text('"a"')
    assert not JsonMatcher(s).feed_text('"abcde"')
    # one-sided bounds
    assert JsonMatcher({"type": "string", "minLength": 3}).feed_text('"abc"')
    assert not JsonMatcher({"type": "string", "minLength": 3}).feed_text('"ab"')
    assert JsonMatcher({"type": "string", "maxLength": 1}).feed_text('""')
    assert not JsonMatcher({"type": "string", "maxLength": 1}).feed_text('"xy"')
    # bounds apply to strings only; other branches unaffected
    s = {"type": ["string", "integer"], "maxLength": 2}
    assert JsonMatcher(s).feed_text("12345")


def test_native_matches_python_length_bounds(chat_dir):
    from uzu_tpu.grammar.native_backend import NativeGrammar  # noqa: F401

    tok = Tokenizer(chat_dir)
    schema = {"type": "object",
              "properties": {"tag": {"type": "string", "minLength": 1,
                                     "maxLength": 6}},
              "required": ["tag"], "additionalProperties": False}
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native"
    ids = tok.encode('{"tag": "abc"}')
    for i, tid in enumerate(ids):
        np.testing.assert_array_equal(
            g_nat.current_mask(), g_py.current_mask(),
            err_msg=f"diverged at step {i}")
        if not g_py.current_mask()[tid]:
            break
        g_py.observe(tid)
        g_nat.observe(tid)


def test_matcher_integer_bounds():
    """Integer minimum/maximum (xgrammar numeric-bounds scope): brute-force
    value sweep + per-char viability (prefixes that cannot reach the range
    are rejected at the first dead character, not at close)."""
    def sweep(lo, hi, schema):
        for v in list(range(-130, 130)) + [999, -999, 10**12, -(10**12)]:
            want = (lo is None or v >= lo) and (hi is None or v <= hi)
            assert JsonMatcher(schema).feed_text(f"{v} ") == want, (schema, v)

    sweep(0, 100, {"type": "integer", "minimum": 0, "maximum": 100})
    sweep(-5, 5, {"type": "integer", "minimum": -5, "maximum": 5})
    sweep(None, -3, {"type": "integer", "maximum": -3})
    sweep(7, None, {"type": "integer", "minimum": 7})
    sweep(1, 9, {"type": "integer",
                 "exclusiveMinimum": 0, "exclusiveMaximum": 10})
    sweep(6, 6, {"type": "integer", "minimum": 5, "exclusiveMinimum": True,
                 "maximum": 6})
    sweep(1, 2, {"type": "integer", "minimum": 0.5, "maximum": 2.5})
    # prefix viability: first digit already out of range masks off
    s = {"type": "integer", "minimum": 20, "maximum": 29}
    assert not JsonMatcher(s).advance("3")
    m = JsonMatcher(s)
    assert m.feed_text("25")
    assert not m.advance("5")  # 255 would overshoot: digits mask off
    # number-typed bounds are ENFORCED too as of r5 (test_number_bounds_*)
    assert not JsonMatcher({"type": "number", "minimum": 5}).feed_text("1.5 ")
    # inside an object property
    s = {"type": "object",
         "properties": {"n": {"type": "integer", "minimum": 10, "maximum": 99}},
         "required": ["n"], "additionalProperties": False}
    assert JsonMatcher(s).feed_text('{"n": 42}')
    assert not JsonMatcher(s).feed_text('{"n": 7}')
    assert not JsonMatcher(s).feed_text('{"n": 420')


def test_integer_bounds_native_lockstep(chat_dir):
    """The C++ engine enforces integer bounds natively (int64 node bounds,
    same digit-viability arithmetic): masks identical to Python at every
    step, and value acceptance agrees over a brute-force sweep."""
    from uzu_tpu.grammar.native_backend import NativeGrammar

    tok = Tokenizer(chat_dir)
    schema = {"type": "object",
              "properties": {"n": {"type": "integer", "minimum": 1,
                                   "exclusiveMaximum": 100}},
              "required": ["n"], "additionalProperties": False}
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native"
    ids = tok.encode('{"n": 42}')
    for i, tid in enumerate(ids):
        np.testing.assert_array_equal(
            g_nat.current_mask(), g_py.current_mask(),
            err_msg=f"diverged at step {i}")
        if not g_py.current_mask()[tid]:
            break
        g_py.observe(tid)
        g_nat.observe(tid)

    # value-acceptance sweep: C++ advance agrees with the Python matcher
    for lo, hi in [(0, 100), (-37, -3), (20, 29), (None, 5), (7, None)]:
        s = {"type": "integer"}
        if lo is not None:
            s["minimum"] = lo
        if hi is not None:
            s["maximum"] = hi
        nat = NativeGrammar(s, [None])
        for v in list(range(-150, 150)) + [10**10, -(10**10)]:
            want = JsonMatcher(s).feed_text(f"{v} ")
            nat.reset()
            got = nat.feed_text(f"{v} ")
            assert got == want, (s, v, got, want)


def test_matcher_allof_merge():
    """allOf inlines by conservative key-merge: $ref + overlay, bound
    tightening, property union (conflicting property schemas nest)."""
    s = {"$defs": {"base": {"type": "object",
                            "properties": {"a": {"type": "integer"}},
                            "required": ["a"]}},
         "allOf": [{"$ref": "#/$defs/base"},
                   {"properties": {"b": {"type": "string"}},
                    "required": ["b"], "additionalProperties": False}]}
    assert JsonMatcher(s).feed_text('{"a": 1, "b": "x"}')
    assert not JsonMatcher(s).feed_text('{"a": 1}')      # b required
    assert not JsonMatcher(s).feed_text('{"c"')          # union closed
    # bound tightening across members
    s = {"allOf": [{"type": "integer", "minimum": 0, "maximum": 50},
                   {"minimum": 10, "maximum": 99}]}
    assert JsonMatcher(s).feed_text("10 ") and JsonMatcher(s).feed_text("50 ")
    assert not JsonMatcher(s).feed_text("9 ")
    assert not JsonMatcher(s).feed_text("51 ")
    # conflicting property schemas nest and both apply
    s = {"allOf": [
        {"type": "object",
         "properties": {"n": {"type": "integer", "minimum": 5}}},
        {"properties": {"n": {"maximum": 9}}, "required": ["n"],
         "additionalProperties": False},
    ]}
    assert JsonMatcher(s).feed_text('{"n": 7}')
    assert not JsonMatcher(s).feed_text('{"n": 4}')
    assert not JsonMatcher(s).feed_text('{"n": 12')
    # irreconcilable members raise at use time
    from uzu_tpu.grammar import GrammarError
    with pytest.raises(GrammarError):
        JsonMatcher({"allOf": [{"type": "string"},
                               {"type": "integer"}]}).feed_text("1")


def test_allof_native_lockstep(chat_dir):
    from uzu_tpu.grammar.native_backend import NativeGrammar  # noqa: F401

    tok = Tokenizer(chat_dir)
    schema = {"allOf": [
        {"type": "object", "properties": {"a": {"type": "integer"}},
         "required": ["a"]},
        {"properties": {"b": {"type": "string", "format": "date"}},
         "additionalProperties": False},
    ]}
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native"
    ids = tok.encode('{"a": 3, "b": "2026-08-20"}')
    for i, tid in enumerate(ids):
        np.testing.assert_array_equal(
            g_nat.current_mask(), g_py.current_mask(),
            err_msg=f"diverged at step {i}")
        if not g_py.current_mask()[tid]:
            break
        g_py.observe(tid)
        g_nat.observe(tid)


def test_matcher_format_precedence():
    # explicit sibling pattern wins over format
    s = {"type": "string", "format": "uuid", "pattern": "^ok$"}
    assert JsonMatcher(s).feed_text('"ok"')
    assert not JsonMatcher(s).feed_text(
        '"123e4567-e89b-12d3-a456-426614174000"')
    # unknown format names are annotations (ignored)
    assert JsonMatcher({"type": "string", "format": "no-such"}).feed_text('"?"')
    # enum beats format
    s = {"type": "string", "format": "uuid", "enum": ["a"]}
    assert JsonMatcher(s).feed_text('"a"')


def test_native_matches_python_format(chat_dir):
    """C++ and Python masks stay identical for `format` strings (the
    normalization is shared, so the native engine must NOT fall back)."""
    from uzu_tpu.grammar.native_backend import NativeGrammar  # noqa: F401

    tok = Tokenizer(chat_dir)
    schema = {"type": "object",
              "properties": {"ip": {"type": "string", "format": "ipv4"},
                             "day": {"type": "string", "format": "date"}},
              "required": ["ip", "day"], "additionalProperties": False}
    g_py = GrammarSession(tok, schema=schema, backend="python")
    g_nat = GrammarSession(tok, schema=schema, backend="native")
    assert g_nat.backend == "native"
    g_py.reset(), g_nat.reset()
    ids = tok.encode('{"ip": "10.0.0.1", "day": "2026-08-20"}')
    for i, tid in enumerate(ids):
        np.testing.assert_array_equal(
            g_nat.current_mask(), g_py.current_mask(),
            err_msg=f"diverged at step {i}")
        if not g_py.current_mask()[tid]:
            break
        g_py.observe(tid)
        g_nat.observe(tid)


def test_server_response_format_anyof_pattern(chat_dir):
    """A served json_schema with anyOf + pattern round-trips (VERDICT r3 #5
    done-condition)."""
    from uzu_tpu.server.openai import ChatCompletionServer
    from uzu_tpu.sessions.chat import ChatSession

    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    schema = {
        "anyOf": [
            {"type": "object",
             "properties": {"code": {"type": "string", "pattern": "^[A-Z]{3}$"}},
             "required": ["code"], "additionalProperties": False},
            {"type": "object",
             "properties": {"num": {"type": "integer"}},
             "required": ["num"], "additionalProperties": False},
        ],
    }
    srv = ChatCompletionServer(ChatSession(lm, tok))
    out = srv.handle_chat({
        "messages": [{"role": "user", "content": "json"}],
        "max_tokens": 48,
        "temperature": 1.0,
        "top_k": 40,
        "response_format": {
            "type": "json_schema",
            "json_schema": {"name": "pick", "schema": schema},
        },
    })
    text = out["choices"][0]["message"]["content"].strip()
    assert JsonMatcher(schema).feed_text(text), text
    val = json.loads(text)
    import re
    if "code" in val:
        assert re.fullmatch(r"[A-Z]{3}", val["code"]), val
    else:
        assert isinstance(val["num"], int), val


# -- formatting / strictness knobs (ref grammar/config.rs:5-12) ----------------


FMT_SCHEMA = {"type": "object",
              "properties": {"city": {"enum": ["Paris", "Rome"]},
                             "days": {"type": "integer"},
                             "tags": {"type": "array",
                                      "items": {"type": "string"}}},
              "required": ["city"]}
FMT_VAL = {"city": "Paris", "days": 3, "tags": ["a", "bb"]}


def _accepts(m, text):
    m = m.clone()
    for ch in text:
        if not m.advance(ch):
            return False
    return m.is_complete()


@pytest.mark.parametrize("kw,dumps_kw", [
    (dict(any_whitespace=False), dict(separators=(", ", ": "))),
    (dict(any_whitespace=False, separators=(",", ":")),
     dict(separators=(",", ":"))),
    (dict(any_whitespace=False, indent=2), dict(indent=2)),
    (dict(any_whitespace=False, indent=4, separators=(",", ": ")),
     dict(indent=4)),
])
def test_matcher_exact_formatting(kw, dumps_kw):
    """any_whitespace=False admits EXACTLY the json.dumps serialization of
    the matching (indent, separators) config — and rejects every other
    formatting of the same value."""
    from uzu_tpu.grammar.matcher import _Fmt

    m = JsonMatcher(FMT_SCHEMA, fmt=_Fmt(**kw))
    text = json.dumps(FMT_VAL, **dumps_kw)
    assert _accepts(m, text), (kw, text)
    # any whitespace deviation rejects
    assert not _accepts(m, text.replace('"city"', ' "city"', 1))
    assert not _accepts(m, text + " ")
    alt = json.dumps(FMT_VAL, separators=(",", ":"))
    if alt != text:
        assert not _accepts(m, alt)
    # empty containers serialize as {} / [] in every mode
    m2 = JsonMatcher({"type": "object"}, fmt=_Fmt(**kw))
    assert _accepts(m2, "{}")
    m3 = JsonMatcher({"type": "array"}, fmt=_Fmt(**kw))
    assert _accepts(m3, "[]")


def test_matcher_flexible_mode_unchanged():
    m = JsonMatcher(FMT_SCHEMA)
    assert _accepts(m, json.dumps(FMT_VAL, indent=3))
    assert _accepts(m, json.dumps(FMT_VAL, separators=(",", ":")))


def test_strict_mode_knob():
    """strict_mode=False flips the additionalProperties default open (the
    xgrammar strictness semantic); default stays closed."""
    from uzu_tpu.grammar.matcher import _Fmt

    extra = {**FMT_VAL, "extra": 1}
    assert not _accepts(JsonMatcher(FMT_SCHEMA), json.dumps(extra))
    m = JsonMatcher(FMT_SCHEMA, fmt=_Fmt(strict_mode=False))
    assert _accepts(m, json.dumps(extra))


def test_exact_format_native_lockstep(chat_dir):
    """C++ engine under ug_set_fmt == Python matcher masks at every step of
    the exact serialization, for compact and indent modes."""
    tok = Tokenizer(chat_dir)
    for kw, dumps_kw in [
        (dict(any_whitespace=False), dict(separators=(", ", ": "))),
        (dict(any_whitespace=False, indent=2), dict(indent=2)),
        (dict(any_whitespace=False, separators=(",", ":")),
         dict(separators=(",", ":"))),
    ]:
        g_py = GrammarSession(tok, schema=FMT_SCHEMA, backend="python", **kw)
        g_nat = GrammarSession(tok, schema=FMT_SCHEMA, backend="native", **kw)
        assert g_nat.backend == "native"
        ids = tok.encode(json.dumps(FMT_VAL, **dumps_kw))
        for i, tid in enumerate(ids):
            np.testing.assert_array_equal(
                g_nat.current_mask(), g_py.current_mask(),
                err_msg=f"{kw} diverged at step {i}")
            if not g_py.current_mask()[tid]:
                break
            g_py.observe(tid)
            g_nat.observe(tid)


def test_exact_format_constrained_generate(chat_dir):
    """End-to-end: a constrained stream under indent=2 IS valid
    pretty-printed JSON (round-trips through json.loads and re-dumps
    identically)."""
    lm = LanguageModel.from_dir(chat_dir, max_context=256,
                                prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    # finite value space so the random model must terminate within budget
    # (an unbounded integer lets it spam digits forever)
    schema = {"type": "object",
              "properties": {"city": {"enum": ["Paris", "Rome"]},
                             "days": {"type": "integer", "minimum": 0,
                                      "maximum": 99},
                             "tags": {"type": "array",
                                      "items": {"enum": ["a", "b"]},
                                      "maxItems": 2}},
              "required": ["city"]}
    g = GrammarSession(tok, schema=schema,
                       stop_token_ids=tok.eos_token_ids,
                       any_whitespace=False, indent=2)
    toks = list(constrained_generate(
        lm, np.asarray(tok.encode("<|user|>json<|end|><|assistant|>")),
        96, g, stop_token_ids=list(tok.eos_token_ids)))
    text = tok.decode([t for t in toks if t not in tok.eos_token_ids])
    obj = json.loads(text)
    assert json.dumps(obj, indent=2) == text
    assert obj.get("city") in ("Paris", "Rome")


def test_number_bounds_matcher():
    """number-typed minimum/maximum enforced by fractional digit-viability
    arithmetic (was: annotations); exponents masked under bounds."""
    def ok(s, t):
        return JsonMatcher(s).feed_text(t + " ") and True

    S = {"type": "number", "minimum": 0.5, "maximum": 0.6}
    assert ok(S, "0.55") and ok(S, "0.5") and ok(S, "0.6")
    for bad in ("0.7", "1", "0.49", "-0.55"):
        assert not JsonMatcher(S).feed_text(bad + " "), bad
    S2 = {"type": "number", "exclusiveMinimum": 0, "maximum": 100}
    assert ok(S2, "0.001") and ok(S2, "100") and ok(S2, "99.9")
    for bad in ("0", "100.5", "-1", "1e2"):
        assert not JsonMatcher(S2).feed_text(bad + " "), bad
    S3 = {"type": "number", "minimum": -2.5, "maximum": -1.5}
    assert ok(S3, "-2.0") and ok(S3, "-1.5") and ok(S3, "-2.5")
    for bad in ("-1", "-3", "2"):
        assert not JsonMatcher(S3).feed_text(bad + " "), bad
    # digit-viability: after "2" under minimum=25, '.' is masked (2.x can
    # never reach range) but digits stay viable (25, 2xx)
    S4 = {"type": "number", "minimum": 25}
    m = JsonMatcher(S4)
    assert m.advance("2")
    assert not m.clone().advance(".")
    assert m.advance("5")
    # unbounded numbers keep exponent forms
    assert JsonMatcher({"type": "number"}).feed_text("1e5 ")


def test_fmt_persists_across_reset(chat_dir):
    """GrammarSession.reset() (paged preempt replay path) must keep the
    exact-format contract on BOTH backends — the C++ engine stores the
    knobs on the engine, the Python matcher rebuilds with session.fmt."""
    tok = Tokenizer(chat_dir)
    for backend in ("python", "native"):
        g = GrammarSession(tok, schema={"type": "object"},
                           backend=backend,
                           any_whitespace=False, indent=2)
        g.observe_text("{")
        g.reset()
        g.observe_text("{")
        m = g.current_mask()
        assert m[tok.encode("\n")[-1]], backend  # indent newline required
        # a quote cannot start the key before the indent whitespace
        assert not m[tok.encode('"')[-1]], backend


def test_number_bounds_native_falls_back(chat_dir):
    """The C++ walk has no fractional arithmetic: number-typed bounds must
    route to the Python matcher (never silently unenforced natively)."""
    tok = Tokenizer(chat_dir)
    s = {"type": "object",
         "properties": {"score": {"type": "number", "minimum": 0,
                                  "maximum": 1}}}
    g = GrammarSession(tok, schema=s)
    assert g.backend == "python"
    with pytest.raises(Exception):
        GrammarSession(tok, schema=s, backend="native")


def test_server_response_format_knobs(chat_dir):
    """grammar_from_request threads the formatting knobs (both nesting
    levels) and 400s on malformed separators."""
    from uzu_tpu.server.common import grammar_from_request

    tok = Tokenizer(chat_dir)
    g = grammar_from_request(tok, {"response_format": {
        "type": "json_schema",
        "json_schema": {"schema": FMT_SCHEMA, "indent": 2,
                        "any_whitespace": False}}})
    assert g.fmt is not None and g.fmt.indent == 2 and not g.fmt.any_ws
    g2 = grammar_from_request(tok, {"response_format": {
        "type": "json_object", "any_whitespace": False,
        "separators": [",", ":"]}})
    assert g2.fmt is not None and g2.fmt.item_tail == ""
    with pytest.raises(ValueError):
        grammar_from_request(tok, {"response_format": {
            "type": "json_object", "any_whitespace": False,
            "separators": ["x", ":"]}})
    # JSON `"indent": true` passes isinstance(True, int) — must 400, not
    # silently pretty-print at True*depth spaces
    with pytest.raises(ValueError):
        grammar_from_request(tok, {"response_format": {
            "type": "json_object", "indent": True}})
    with pytest.raises(ValueError):
        grammar_from_request(tok, {"response_format": {
            "type": "json_object", "any_whitespace": "false"}})

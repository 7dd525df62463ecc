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

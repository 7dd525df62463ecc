"""Regex-constrained decoding tests.

Reference capability: Grammar::Regex (crates/backend-uzu/src/engine/
language_model/grammar/mod.rs:65-68, compiled through xgrammar). Pinned
here: the DFA compiler agrees with Python's `re` as an oracle; native and
numpy mask backends agree on every reachable state; the constrained stream
is a full match of the pattern; speculative == plain constrained streams.
"""

import random
import re as pyre
import string

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.sampling import SamplingParams
from uzu_tpu.grammar import GrammarError, GrammarSession, constrained_generate
from uzu_tpu.grammar.regex import RegexDFA, RegexMatcher, RegexTokenMasks
from uzu_tpu.sessions import Tokenizer
from uzu_tpu.tools.synth import synth_chat_model

PATTERNS = [
    r"abc",
    r"a*b+c?",
    r"(ab|cd)+",
    r"[a-z0-9_]{3,8}",
    r"\d{4}-\d{2}-\d{2}",
    r"[+-]?\d+(\.\d+)?([eE][+-]?\d+)?",
    r'"[^"\\]*"',
    r"(foo|bar|baz)?end",
    r"a{2,4}",
    r"x|",
    r"[^a-z]+",
    r"\w+@\w+\.(com|org)",
    r".*stop",
    r"colou?r",
    r"(a|b)*abb",
    r"yes|no|maybe",
]


@pytest.fixture(scope="module")
def chat_dir(tmp_path_factory):
    return synth_chat_model(
        str(tmp_path_factory.mktemp("regex_model")),
        num_layers=2, model_dim=64, hidden_dim=160,
        num_heads=4, num_groups=2, head_dim=16,
    )


def test_dfa_matches_re_oracle():
    """Anchored acceptance of the compiled DFA == Python's re on random and
    targeted inputs for the whole pattern suite."""
    rng = random.Random(0)
    alphabet = string.ascii_lowercase + string.digits + '+-."\\@_eE '
    for pat in PATTERNS:
        dfa = RegexDFA(pat)
        gold = pyre.compile(r"(?:" + pat + r")\Z")
        cases = ["", "abc", "0123", "foo", "aaaa", '"hi"', "x@y.com",
                 "aabb", "r", "2024-01-31", "colour", "fooend", "stop"]
        for _ in range(200):
            n = rng.randint(0, 10)
            cases.append("".join(rng.choice(alphabet) for _ in range(n)))
        for s in cases:
            m = RegexMatcher(dfa)
            got = m.feed_text(s) and m.is_complete()
            want = gold.match(s) is not None
            assert got == want, (pat, s)


def test_dfa_rejects_bad_patterns():
    for pat in [r"(", r"a)", r"[z-a]", r"a{3,1}", r"*a", r"(?P<x>a)"]:
        with pytest.raises(GrammarError):
            RegexDFA(pat)


def test_native_masks_equal_numpy_masks(chat_dir):
    """The C++ DFA walk and the vectorized numpy walk must produce
    identical masks at every reachable DFA state."""
    tok = Tokenizer(chat_dir)
    strings = []
    specials = tok.special_token_strings
    for i in range(tok.vocab_size):
        t = tok.id_to_token(i)
        strings.append(None if (t is None or t in specials) else tok.decode([i]))
    for pat in [r"\d{4}-\d{2}-\d{2}", r"(foo|bar)+", r"[a-z ]{1,20}"]:
        dfa = RegexDFA(pat)
        native = RegexTokenMasks(dfa, strings)
        if native.backend != "native":
            pytest.skip("native toolchain unavailable")
        python = RegexTokenMasks(dfa, strings)
        python._native = None
        for state in range(dfa.n_states):
            np.testing.assert_array_equal(
                native.mask_for_state(state), python.mask_for_state(state),
                err_msg=f"{pat} state {state}",
            )


@pytest.mark.parametrize("pattern", [r"\d{3}-\d{3}", r"(yes|no) (yes|no)",
                                     r"[0-9]{2,6} [a-z]{1,8}"])
def test_constrained_stream_matches_pattern(chat_dir, pattern):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    grammar = GrammarSession(tok, regex=pattern, stop_token_ids=tok.eos_token_ids)
    out = list(constrained_generate(
        lm, np.asarray(tok.encode("<|user|>answer<|end|><|assistant|>")),
        48, grammar, sampling=SamplingParams(), seed=3,
    ))
    body = [t for t in out if t not in tok.eos_token_ids]
    text = tok.decode(body, skip_special_tokens=True)
    assert pyre.fullmatch(pattern, text), (pattern, text)


def test_speculative_regex_matches_plain(chat_dir):
    """Regex speculation rides the same lookahead-mask machinery as schema
    grammars: the speculative constrained stream is bit-identical."""
    from uzu_tpu.engine.speculation import NgramSpeculator

    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    prompt = np.asarray(tok.encode("<|user|>digits<|end|><|assistant|>"))

    def run(spec):
        grammar = GrammarSession(tok, regex=r"\d{2}( \d{2}){2,6}",
                                 stop_token_ids=tok.eos_token_ids)
        return list(constrained_generate(
            lm, prompt, 48, grammar, sampling=SamplingParams(), seed=5,
            speculator=spec,
        ))

    plain = run(None)
    spec = run(NgramSpeculator(max_ngram=3, k=6))
    assert spec == plain
    text = tok.decode([t for t in plain if t not in tok.eos_token_ids],
                      skip_special_tokens=True)
    assert pyre.fullmatch(r"\d{2}( \d{2}){2,6}", text), text


def test_session_api_guards(chat_dir):
    tok = Tokenizer(chat_dir)
    with pytest.raises(GrammarError):
        GrammarSession(tok, schema={"type": "object"}, regex=r"\d+")
    s = GrammarSession(tok, regex=r"ab|cd", stop_token_ids=tok.eos_token_ids)
    assert s.backend in ("native", "python")
    # completion semantics: accepting state allows stop AND continuation
    s2 = GrammarSession(tok, regex=r"[a-z]+", stop_token_ids=tok.eos_token_ids)
    a_id = tok.encode("a")[-1]
    s2.observe(a_id)
    m = s2.current_mask()
    assert m[tok.eos_token_ids[0]]  # may stop
    assert m[a_id]  # may continue


def test_wide_unicode_range_class():
    """Ranges wider than the old 512-codepoint sampling cap classify
    interior characters correctly (CJK class): the mask must admit
    in-range tokens and reject out-of-range ones, in both directions."""
    from uzu_tpu.grammar.regex import RegexDFA, RegexMatcher

    dfa = RegexDFA("[一-鿿]+")
    m = RegexMatcher(dfa)
    assert m.accepts_text("中文")  # interior CJK chars
    assert not m.accepts_text("a")
    assert not m.accepts_text("䷿")  # just below the range
    assert not m.accepts_text("ꀀ")  # just above the range

    neg = RegexMatcher(RegexDFA("[^一-鿿]+"))
    assert neg.accepts_text("abc")
    assert not neg.accepts_text("中")  # interior must be rejected

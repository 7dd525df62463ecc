"""Session-layer tests: template, parser, chat session, OpenAI server.

Mirrors the reference's golden-fixture strategy (workspace/data/responses/*)
with synthetic models + deterministic tokenizer: rendering, prefix-cache
reuse, stream sectioning, the tool-call loop, and the HTTP surface.
"""

import json
import threading
import urllib.request

import numpy as np
import pytest

from uzu_tpu import LanguageModel
from uzu_tpu.engine.sampling import SamplingParams
from uzu_tpu.sessions import (
    ChatSession,
    ChatTemplate,
    SectionConfig,
    StreamParser,
    TemplateError,
    Tokenizer,
    ToolSpec,
    validate_messages,
)
from uzu_tpu.tools.synth import synth_chat_model


@pytest.fixture(scope="module")
def chat_dir(tmp_path_factory):
    return synth_chat_model(
        str(tmp_path_factory.mktemp("chat_model")),
        num_layers=2, model_dim=64, hidden_dim=160,
        num_heads=4, num_groups=2, head_dim=16,
    )


@pytest.fixture()
def session(chat_dir):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16, 64))
    return ChatSession(lm, Tokenizer(chat_dir))


# -- template ---------------------------------------------------------------


def test_template_renders_roles():
    t = ChatTemplate(None)
    out = t.render(
        [{"role": "system", "content": "be nice"}, {"role": "user", "content": "hi"}]
    )
    assert "be nice" in out and "hi" in out
    assert out.rstrip().endswith("<|assistant|>")


def test_template_validation_rejects_bad_order():
    with pytest.raises(TemplateError):
        validate_messages([{"role": "user", "content": "x"}, {"role": "system", "content": "y"}])
    with pytest.raises(TemplateError):
        validate_messages([{"role": "tool", "content": "y", "tool_call_id": "1"}])
    with pytest.raises(TemplateError):
        validate_messages([{"role": "alien", "content": "y"}])


# -- stream parser ------------------------------------------------------------


def test_parser_sections_and_partial_markers():
    p = StreamParser()
    events = []
    # feed char by char: markers arrive in fragments
    for ch in "a<think>deep</think>b<tool_call>{\"name\": \"f\", \"arguments\": {\"x\": 1}}</tool_call>c":
        events.extend(p.push(ch))
    events.extend(p.finish())
    assert p.text == "abc"
    assert p.reasoning == "deep"
    assert len(p.tool_calls) == 1
    assert p.tool_calls[0].name == "f"
    assert p.tool_calls[0].arguments == {"x": 1}
    kinds = [e.kind for e in events]
    assert "tool_call" in kinds and "reasoning" in kinds


def test_parser_holds_marker_prefix():
    p = StreamParser()
    evs = list(p.push("hello <th"))
    assert "".join(e.delta for e in evs) == "hello "  # "<th" held back
    evs = list(p.push("at"))  # "<that" -> not a marker, flushed
    assert "".join(e.delta for e in evs) == "<that" or p.buffer


# -- chat session -------------------------------------------------------------


def test_session_reply_and_prefix_reuse(session):
    r1 = session.reply("hello", max_new_tokens=8, sampling=SamplingParams())
    assert isinstance(r1.text, str)
    assert r1.stats.tokens_count_output > 0
    state_tokens_1 = list(session._state_tokens)
    r2 = session.reply("again", max_new_tokens=8, sampling=SamplingParams())
    # second turn must have reused the state (log extends turn 1's log)
    assert session._state_tokens[: len(state_tokens_1) - 8] is not None
    assert len(session.messages) == 4  # 2 user + 2 assistant


def test_session_deterministic(chat_dir):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16, 64))
    s1 = ChatSession(lm, Tokenizer(chat_dir))
    s2 = ChatSession(lm, Tokenizer(chat_dir))
    r1 = s1.reply("hello", max_new_tokens=8, sampling=SamplingParams())
    r2 = s2.reply("hello", max_new_tokens=8, sampling=SamplingParams())
    assert r1.text == r2.text


def test_tool_loop(chat_dir):
    """Force the model's 'output' through a scripted parser to exercise the
    tool loop: we monkeypatch stream to emit a tool call on turn 1."""
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16, 64))
    calls = []

    def get_weather(city: str):
        calls.append(city)
        return {"temp_c": 21, "city": city}

    tool = ToolSpec(
        name="get_weather",
        description="get weather",
        parameters={"type": "object", "properties": {"city": {"type": "string"}}},
        fn=get_weather,
    )
    session = ChatSession(lm, Tokenizer(chat_dir), tools=[tool])

    from uzu_tpu.sessions.parser import ToolCall

    originals = []

    real_stream = session.stream

    def scripted_stream(message, **kw):
        yield from real_stream(message, **kw)
        # first call: inject a tool call into the parsed reply
        if not originals:
            originals.append(1)
            session.last_reply.tool_calls = [
                ToolCall(name="get_weather", arguments={"city": "Paris"}, raw="")
            ]
            session.last_reply.finish_reason = "tool_calls"

    session.stream = scripted_stream
    reply = session.reply("what's the weather in paris?", max_new_tokens=8,
                          sampling=SamplingParams())
    assert calls == ["Paris"]
    assert reply.finish_reason in ("stop", "length")
    roles = [m["role"] for m in session.messages]
    assert "tool" in roles  # tool result was appended to the conversation


# -- server -------------------------------------------------------------------


def test_openai_server_end_to_end(chat_dir):
    from uzu_tpu.server import serve

    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16, 64))
    session = ChatSession(lm, Tokenizer(chat_dir))
    httpd = serve(session, port=0)  # port 0 = ephemeral
    port = httpd.server_address[1]
    base = f"http://127.0.0.1:{port}"
    try:
        with urllib.request.urlopen(f"{base}/v1/models") as r:
            models = json.load(r)
        assert models["data"][0]["id"] == "uzu-tpu"

        req = urllib.request.Request(
            f"{base}/v1/chat/completions",
            data=json.dumps({
                "model": "uzu-tpu",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 8,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            resp = json.load(r)
        assert resp["object"] == "chat.completion"
        assert resp["choices"][0]["message"]["role"] == "assistant"
        assert resp["usage"]["completion_tokens"] > 0

        # streaming
        req = urllib.request.Request(
            f"{base}/v1/chat/completions",
            data=json.dumps({
                "model": "uzu-tpu",
                "messages": [{"role": "user", "content": "hi"}],
                "max_tokens": 8,
                "stream": True,
            }).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            lines = [l for l in r.read().decode().splitlines() if l.startswith("data: ")]
        assert lines[-1] == "data: [DONE]"
        first = json.loads(lines[0][6:])
        assert first["object"] == "chat.completion.chunk"
        last = json.loads(lines[-2][6:])
        assert last["choices"][0]["finish_reason"] in ("stop", "length")
    finally:
        httpd.shutdown()


# -- harmony encoding (gpt-oss) -------------------------------------------------


def test_harmony_render():
    from uzu_tpu.sessions.harmony import HarmonyEncoding

    enc = HarmonyEncoding()
    text = enc.render(
        [
            {"role": "system", "content": "be brief"},
            {"role": "user", "content": "hi"},
            {"role": "assistant", "content": "hello", "reasoning_content": "greet back"},
            {"role": "user", "content": "weather?"},
        ],
        tools=[{"type": "function", "function": {
            "name": "get_weather", "description": "w", "parameters": {}}}],
    )
    assert text.startswith("<|start|>system<|message|>be brief<|end|>")
    assert "<|start|>developer<|message|># Tools" in text
    assert "<|start|>assistant<|channel|>analysis<|message|>greet back<|end|>" in text
    assert "<|start|>assistant<|channel|>final<|message|>hello<|end|>" in text
    assert text.endswith("<|start|>assistant")


def test_harmony_parser_sections():
    from uzu_tpu.sessions.harmony import HarmonyParser

    p = HarmonyParser()
    stream = ("<|channel|>analysis<|message|>thinking hard<|end|>"
              "<|start|>assistant<|channel|>final<|message|>the answer<|return|>")
    events = []
    for i in range(0, len(stream), 3):  # ragged deltas
        events.extend(p.push(stream[i:i+3]))
    events.extend(p.finish())
    assert p.reasoning == "thinking hard"
    assert p.text == "the answer"
    assert not p.tool_calls


def test_harmony_parser_tool_call():
    from uzu_tpu.sessions.harmony import HarmonyParser

    p = HarmonyParser()
    stream = ('<|channel|>commentary to=functions.get_weather <|constrain|>json'
              '<|message|>{"city": "Paris"}<|call|>')
    events = list(p.push(stream)) + list(p.finish())
    assert len(p.tool_calls) == 1
    assert p.tool_calls[0].name == "get_weather"
    assert p.tool_calls[0].arguments == {"city": "Paris"}


def test_harmony_chat_session(chat_dir):
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16, 64))
    session = ChatSession(lm, Tokenizer(chat_dir), encoding="harmony")
    reply = session.reply("hello", max_new_tokens=8, sampling=SamplingParams())
    assert reply.stats.tokens_count_output > 0


def test_remote_backend_against_local_server(tmp_path):
    """RemoteChatSession (backend-remote parity) drives our own
    OpenAI-compatible server: non-stream reply + streamed deltas."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.remote import RemoteChatSession, RemoteConfig
    from uzu_tpu.server.batched import serve_batched
    from uzu_tpu.sessions import Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "remote_srv"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    httpd = serve_batched(lm, Tokenizer(d), port=0, batch_size=2, decode_chunk=4)
    port = httpd.server_address[1]
    try:
        sess = RemoteChatSession(RemoteConfig(
            api_endpoint=f"http://127.0.0.1:{port}/v1", model="uzu-tpu"))
        reply = sess.reply([{"role": "user", "content": "hello"}], max_tokens=6)
        assert reply.stats.tokens_count_output > 0
        assert reply.finish_reason in ("stop", "length")

        deltas = list(sess.stream([{"role": "user", "content": "hi"}], max_tokens=5))
        assert deltas and deltas[-1].finish_reason in ("stop", "length")
        assert isinstance("".join(dl.text for dl in deltas), str)
    finally:
        httpd.batch_server.shutdown()
        httpd.shutdown()


def test_remote_tool_call_assembly():
    """Streaming tool-call fragments assemble into complete calls."""
    from uzu_tpu.engine.remote import _ToolCallAssembler

    a = _ToolCallAssembler()
    a.push([{"index": 0, "function": {"name": "get_", "arguments": ""}}])
    a.push([{"index": 0, "function": {"name": "time", "arguments": "{\"tz\":"}}])
    a.push([{"index": 1, "function": {"name": "other", "arguments": "{}"}},
            {"index": 0, "function": {"arguments": " \"UTC\"}"}}])
    calls = a.finish()
    assert [c.name for c in calls] == ["get_time", "other"]
    assert calls[0].arguments == {"tz": "UTC"}


def test_tts_session_streaming_and_cancel():
    """TTS session plumbing (nagare TextToSpeechSession parity): streaming
    chunks with stats, whole-utterance fold, cancellation, state machine."""
    from uzu_tpu.sessions.tts import (
        CancelToken,
        TextToSpeechSession,
        sine_test_synthesizer,
    )

    sess = TextToSpeechSession(sine_test_synthesizer())
    assert sess.state == "idle"

    outs = list(sess.synthesize_stream("hello brave new world"))
    assert len(outs) == 4
    assert outs[-1].stats.audio_seconds > outs[0].stats.audio_seconds
    assert sess.state == "idle"

    whole = sess.synthesize("hello brave new world")
    assert abs(whole.pcm.duration_s - 0.8) < 1e-6
    assert whole.stats.real_time_factor >= 0

    cancel = CancelToken()
    gen = sess.synthesize_stream("a b c d e f", cancel)
    first = next(gen)
    assert sess.state == "synthesizing"
    cancel.cancel()
    rest = list(gen)
    assert len(rest) == 0 and first is not None
    assert sess.state == "idle"


def test_tts_token_lm_synthesizer(tmp_path):
    """Audio-token-LM synthesis: the LM streams codec tokens on the fused
    decode path, each decoding to an overlap-added PCM frame — continuous
    sample count, deterministic streams, works through the session."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.sessions.tts import (
        TextToSpeechSession,
        TokenLMSynthesizer,
        codebook_sine,
    )
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "tts_model"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(d)
    cb = codebook_sine(lm.decoder_config.vocab_size, frame_len=320)
    synth = TokenLMSynthesizer(lm, tok, cb, max_frames=24,
                               tokens_per_chunk=8)
    sess = TextToSpeechSession(synth)
    out = sess.synthesize("say something")
    assert out.pcm.sample_rate == 16000
    hop = synth.frame_hop
    # continuous overlap-add: hop per frame plus the final tail
    assert len(out.pcm.samples) % hop == (320 - hop) % hop
    assert np.abs(out.pcm.samples).max() <= 1.0
    assert out.stats.audio_seconds > 0
    out2 = sess.synthesize("say something")
    np.testing.assert_array_equal(out.pcm.samples, out2.pcm.samples)


def test_chat_session_with_speculator(tmp_path):
    """Session-level speculation (the reference engages a model's bundled
    speculator in every stream): greedy reply text is identical with and
    without an ngram chain speculator, and acceptance stats surface."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.speculation import NgramSpeculator
    from uzu_tpu.sessions import ChatSession, Tokenizer
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "spec_chat"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    tok = Tokenizer(d)

    plain = ChatSession(lm, tok)
    r1 = plain.reply("hello there", sampling=SamplingParams(), max_new_tokens=24)

    spec = ChatSession(lm, tok, speculator=NgramSpeculator(max_ngram=3, k=4))
    r2 = spec.reply("hello there", sampling=SamplingParams(), max_new_tokens=24)

    assert r2.text == r1.text
    assert r2.stats.tokens_proposed >= 0
    assert r2.stats.tokens_count_output == r1.stats.tokens_count_output


def test_facade_auto_engages_bundled_speculator(tmp_path):
    import os

    """Engine.chat('auto') picks up a model's speculator/ dir (DFlash)."""
    from uzu_tpu import Engine
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.tools.synth import synth_chat_model, synth_dflash_speculator

    from uzu_tpu.config import load_language_model_config

    root = tmp_path / "models"
    d = synth_chat_model(str(root / "m"), num_layers=2, model_dim=64,
                         hidden_dim=160, num_heads=4, num_groups=2, head_dim=16)
    target_cfg = load_language_model_config(os.path.join(d, "config.json"))
    synth_dflash_speculator(os.path.join(d, "speculator"), target_cfg)

    eng = Engine(str(root))
    sess = eng.chat("m", max_context=128, prefill_buckets=(16, 64))
    assert sess.speculator is not None  # DFlash decoder engaged

    plain = eng.chat("m", max_context=128, speculate=False,
                     prefill_buckets=(16, 64))
    assert plain.speculator is None
    r_plain = plain.reply("hi", sampling=SamplingParams(), max_new_tokens=12)
    r_spec = sess.reply("hi", sampling=SamplingParams(), max_new_tokens=12)
    assert r_spec.text == r_plain.text  # exact-output invariant holds


def test_speculative_chat_keeps_prefix_cache(tmp_path):
    """Multi-turn speculative chat reuses the session KV across turns and
    stays bit-identical to the plain path."""
    from uzu_tpu import LanguageModel
    from uzu_tpu.engine.sampling import SamplingParams
    from uzu_tpu.engine.speculation import NgramSpeculator
    from uzu_tpu.sessions import ChatSession, Tokenizer
    from uzu_tpu.tools.synth import synth_chat_model

    d = synth_chat_model(str(tmp_path / "spec_chat2"), num_layers=2,
                         model_dim=64, hidden_dim=160, num_heads=4,
                         num_groups=2, head_dim=16)
    lm = LanguageModel.from_dir(d, max_context=512, prefill_buckets=(16, 64))
    tok = Tokenizer(d)
    greedy = SamplingParams()

    plain = ChatSession(lm, tok)
    spec = ChatSession(lm, tok, speculator=NgramSpeculator(max_ngram=3, k=4))
    for turn in ("hello", "tell me more"):
        r1 = plain.reply(turn, sampling=greedy, max_new_tokens=16)
        r2 = spec.reply(turn, sampling=greedy, max_new_tokens=16)
        assert r2.text == r1.text
    assert spec._state is not None  # prefix cache survived speculation
    assert len(spec._state_tokens) > 0


def test_request_level_tools_render_and_choice():
    """OpenAI request-level tools render into the template; tool_choice
    filters them (reference chat_completions.rs:203 choose_tools)."""
    from uzu_tpu.server.common import tools_from_request

    t1 = {"type": "function", "function": {"name": "get_weather",
                                           "description": "w", "parameters": {}}}
    t2 = {"type": "function", "function": {"name": "get_time",
                                           "description": "t", "parameters": {}}}
    body = {"tools": [t1, t2]}
    assert tools_from_request(body) == [t1, t2]
    assert tools_from_request({**body, "tool_choice": "none"}) is None
    assert tools_from_request({**body, "tool_choice": "required"}) == [t1, t2]
    assert tools_from_request(
        {**body, "tool_choice": {"function": {"name": "get_time"}}}) == [t2]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="tool_choice"):
        tools_from_request({**body, "tool_choice": "sometimes"})
    with _pytest.raises(ValueError, match="undeclared"):
        tools_from_request({**body, "tool_choice": {"function": {"name": "x"}}})
    assert tools_from_request({}) is None


def test_parser_config_from_model_dir(chat_dir, tmp_path):
    """A model dir shipping parser_config.json drives the session's stream
    parsing via CONFIG only (the reference resolves bundled per-family
    parsing configs the same way — hanashi/configs/parsing/*.json); the
    harmony preset swaps in the Harmony template + parser."""
    import shutil

    from uzu_tpu.sessions.harmony import HarmonyEncoding, HarmonyParser
    from uzu_tpu.sessions.parser import StreamParser

    d = str(tmp_path / "cfg_model")
    shutil.copytree(chat_dir, d)
    with open(f"{d}/parser_config.json", "w") as f:
        json.dump({"sections": [
            {"kind": "reasoning", "open": "[THINK]",
             "close_tokens": ["[/THINK]"], "closes_on_sibling": True},
            {"kind": "tool_call", "open": "[CALL]",
             "close_tokens": ["[/CALL]", "[DONE]"]},
        ]}, f)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16,))
    sess = ChatSession(lm, Tokenizer(d))
    p = sess._parser_factory()
    assert isinstance(p, StreamParser)
    list(p.push("[THINK]plan[CALL]{\"name\": \"f\", \"arguments\": {}}[DONE]ok"))
    list(p.finish())
    assert p.reasoning == "plan"
    assert [t.name for t in p.tool_calls] == ["f"]
    assert p.text == "ok"

    with open(f"{d}/parser_config.json", "w") as f:
        json.dump({"preset": "harmony"}, f)
    sess2 = ChatSession(lm, Tokenizer(d))
    assert isinstance(sess2.template, HarmonyEncoding)
    assert isinstance(sess2._parser_factory(), HarmonyParser)


def test_gptoss_composed_family_session(tmp_path):
    """The gpt-oss-class COMPOSED family end-to-end: MoE + sinks + sliding
    windows (gptoss_config) served through a harmony-preset ChatSession
    auto-selected from the model dir's parser_config.json (VERDICT r2 #7;
    ref registry.json:84 ships gpt-oss-20b, harmony mod.rs:26-35)."""
    from uzu_tpu.sessions.harmony import HarmonyEncoding
    from uzu_tpu.tools.synth import gptoss_config, synth_chat_model

    d = str(tmp_path / "gptoss_chat")
    synth_chat_model(d, config=gptoss_config(
        num_layers=2, model_dim=64, num_heads=4, num_groups=2, head_dim=16,
        vocab_size=512, num_experts=4, num_active=2, expert_hidden_dim=96,
        sliding_window=24, max_seq=256))
    with open(f"{d}/parser_config.json", "w") as f:
        json.dump({"preset": "harmony"}, f)
    lm = LanguageModel.from_dir(d, max_context=256, prefill_buckets=(16, 64))
    sess = ChatSession(lm, Tokenizer(d))
    assert isinstance(sess.template, HarmonyEncoding)
    reply = sess.reply("hello", max_new_tokens=16)
    assert reply.stats.tokens_count_output >= 1
    # second turn reuses the prefix cache over the MoE+sinks state
    reply2 = sess.reply("again", max_new_tokens=8)
    assert reply2.stats.tokens_count_output >= 1


def test_harmony_stop_ids(chat_dir):
    """Harmony sessions stop at <|return|>/<|call|>, not just eos (the
    hanashi harmony stop set) — without these ids a real gpt-oss turn
    would run to the token budget."""
    lm = LanguageModel.from_dir(chat_dir, max_context=256, prefill_buckets=(16,))
    tok = Tokenizer(chat_dir)
    sess = ChatSession(lm, tok, encoding="harmony")
    stops = sess._stop_ids()
    assert tok.token_to_id("<|return|>") in stops
    assert tok.token_to_id("<|call|>") in stops
    plain = ChatSession(lm, tok)
    assert tok.token_to_id("<|return|>") not in plain._stop_ids()

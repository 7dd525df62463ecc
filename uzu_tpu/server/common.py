"""Shared OpenAI request plumbing for both servers.

Reference counterpart: the request-side grammar selection in
crates/backend-uzu/src/engine/language_model/grammar/mod.rs:65-68
(Grammar::JsonSchema / Grammar::Regex); the OpenAI ``response_format``
object is this host's wire format for the same choice.
"""

from __future__ import annotations


def tools_from_request(body: dict):
    """OpenAI ``tools`` + ``tool_choice`` -> the tool-spec dicts to render
    into the chat template, or None when the request declares none.

    Reference semantics (cli/src/server/chat_tool_calls.rs choose_tools):
    "none" hides every declared tool, "auto"/"required" keep the full set
    (declarations are the only lever a local model has — "required" cannot
    compel a call), and a function object exposes only the named tool.
    Raises ValueError (-> HTTP 400) on unrecognized values."""
    tools = body.get("tools") or []
    if not isinstance(tools, list):
        raise ValueError("tools must be an array of tool declarations")
    choice = body.get("tool_choice")
    if choice is None:
        return tools or None
    if isinstance(choice, str):
        if choice == "none":
            return None
        if choice in ("auto", "required"):
            return tools or None
        raise ValueError(
            'tool_choice must be "none", "auto", "required" or a function '
            f"object, got {choice!r}")
    if isinstance(choice, dict):
        name = (choice.get("function") or {}).get("name")
        if not name:
            raise ValueError("tool_choice object needs function.name")
        selected = [
            t for t in tools
            if (t.get("function") or {}).get("name") == name
        ]
        if not selected:
            raise ValueError(f"tool_choice names an undeclared tool {name!r}")
        return selected
    raise ValueError("tool_choice is not a recognized value")


def stops_from_request(body: dict) -> list:
    """OpenAI ``stop``: a string or up to 4 strings."""
    stop = body.get("stop")
    if stop is None:
        return []
    if isinstance(stop, str):
        stop = [stop]
    if not isinstance(stop, list) or not all(isinstance(s, str) for s in stop):
        raise ValueError("stop must be a string or an array of strings")
    if len(stop) > 4:
        raise ValueError("stop supports at most 4 sequences")
    return [s for s in stop if s]


def sampling_from_request(body: dict, default):
    """Per-request OpenAI sampling fields over the server defaults.
    An explicit JSON null means "use the server default" (OpenAI
    semantics), not an override to None/greedy."""
    from ..engine.sampling import SamplingParams

    def field(name, dflt):
        v = body.get(name)
        return dflt if v is None else v

    return SamplingParams(
        temperature=field("temperature", default.temperature),
        top_k=field("top_k", default.top_k),
        top_p=field("top_p", default.top_p),
        min_p=field("min_p", default.min_p),
        repetition_penalty=field("repetition_penalty",
                                 default.repetition_penalty),
        suffix_repetition_length=default.suffix_repetition_length,
        banned_tokens=default.banned_tokens,
    )


def grammar_from_request(tokenizer, body: dict):
    """``response_format`` -> GrammarSession (or None when unconstrained).

    Accepts the OpenAI shapes ``{"type": "json_object"}`` and
    ``{"type": "json_schema", "json_schema": {"schema": ...}}`` plus the
    common extension ``{"type": "regex", "pattern": ...}``. Raises
    ValueError (mapped to HTTP 400 by the handlers) on anything else.
    """
    rf = body.get("response_format")
    if not rf:
        return None
    if not isinstance(rf, dict):
        raise ValueError("response_format must be an object")
    typ = rf.get("type")
    if typ in (None, "text"):
        return None
    from ..grammar import GrammarSession

    if typ == "json_object":
        return GrammarSession(tokenizer, schema=None)
    if typ == "json_schema":
        js = rf.get("json_schema") or {}
        schema = js.get("schema") if isinstance(js, dict) else None
        return GrammarSession(tokenizer, schema=schema)
    if typ == "regex":
        pattern = rf.get("pattern") or rf.get("regex")
        if not pattern:
            raise ValueError("response_format regex needs a 'pattern'")
        return GrammarSession(tokenizer, regex=pattern)
    raise ValueError(f"unsupported response_format type {typ!r}")

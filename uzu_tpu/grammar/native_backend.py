"""ctypes binding + schema flattening for the C++ grammar engine
(uzu_tpu/native/grammar.cpp — the xgrammar-FFI role). Falls back to the
Python matcher when the toolchain is unavailable or the schema uses
features outside the flattenable subset."""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

T_OBJECT, T_ARRAY, T_STRING, T_NUMBER = 1, 2, 4, 8
T_INTEGER_ONLY, T_BOOLEAN, T_NULL, T_ANY = 16, 32, 64, 128

_TYPE_BITS = {
    "object": T_OBJECT,
    "array": T_ARRAY,
    "string": T_STRING,
    "number": T_NUMBER,
    "integer": T_NUMBER | T_INTEGER_ONLY,
    "boolean": T_BOOLEAN,
    "null": T_NULL,
}

_UNSUPPORTED_KEYS = {
    "oneOf", "anyOf", "allOf", "not", "$ref", "patternProperties",
    "pattern", "format", "minimum", "maximum", "minLength", "maxLength",
    "prefixItems", "additionalItems", "dependencies", "if", "then", "else",
}


class SchemaUnsupported(Exception):
    pass


def flatten_schema(schema) -> tuple[np.ndarray, list[str]]:
    """Flatten a schema tree into the int32 table grammar.cpp consumes.
    Raises SchemaUnsupported for features only the Python matcher handles."""
    nodes: list[dict] = []
    strings: list[str] = []
    sids: dict[str, int] = {}

    def sid(s: str) -> int:
        if s not in sids:
            sids[s] = len(strings)
            strings.append(s)
        return sids[s]

    def walk(s) -> int:
        if s is None or s is True or s == {}:
            nodes.append({"type_mask": T_ANY, "items": -1, "min": 0, "max": -1,
                          "additional": 1, "props": [], "enum": []})
            return len(nodes) - 1
        if not isinstance(s, dict):
            raise SchemaUnsupported(f"schema node {type(s)}")
        for k in s:
            if k in _UNSUPPORTED_KEYS:
                raise SchemaUnsupported(k)
        idx = len(nodes)
        nodes.append({})  # reserve

        enum_vals = s.get("enum", [s["const"]] if "const" in s else None)
        enum_sids: list[int] = []
        type_mask = 0
        if enum_vals is not None:
            if not all(isinstance(v, str) for v in enum_vals):
                raise SchemaUnsupported("non-string enum")
            enum_sids = [sid(v) for v in enum_vals]
            type_mask = T_STRING
        elif "type" in s:
            t = s["type"]
            for name in (t if isinstance(t, list) else [t]):
                if name not in _TYPE_BITS:
                    raise SchemaUnsupported(f"type {name}")
                type_mask |= _TYPE_BITS[name]
        else:
            type_mask = T_ANY

        props = []
        if "properties" in s:
            required = set(s.get("required", ()))
            if len(s["properties"]) > 64:
                raise SchemaUnsupported(">64 properties")
            for name, sub in s["properties"].items():
                props.append((sid(name), walk(sub), 1 if name in required else 0))
        elif s.get("required"):
            raise SchemaUnsupported("required without properties")

        items = walk(s["items"]) if "items" in s else -1
        nodes[idx] = {
            "type_mask": type_mask,
            "items": items,
            "min": int(s.get("minItems", 0)),
            "max": int(s.get("maxItems", -1)),
            "additional": 0 if (props and not s.get("additionalProperties", False)) else 1,
            "props": props,
            "enum": enum_sids,
        }
        return idx

    walk(schema)
    buf = [len(nodes)]
    for n in nodes:
        buf += [n["type_mask"], n["items"], n["min"], n["max"], n["additional"],
                len(n["props"]), len(n["enum"])]
        for p in n["props"]:
            buf += list(p)
        buf += n["enum"]
    return np.asarray(buf, np.int32), strings


def _pack_strings(strs: list[str]) -> tuple[bytes, np.ndarray]:
    blob = b""
    offs = [0]
    for s in strs:
        blob += s.encode("utf-8", errors="replace")
        offs.append(len(blob))
    return blob, np.asarray(offs, np.int32)


class NativeGrammar:
    """One matcher instance over a fixed token vocabulary."""

    def __init__(self, schema, token_strings: list[Optional[str]]):
        from ..native import load

        lib = load("grammar")
        if lib is None:
            raise SchemaUnsupported("native grammar unavailable")
        self._lib = lib
        self._configure(lib)

        if schema is None:
            sbuf = np.zeros(0, np.int32)
            strings: list[str] = []
        else:
            sbuf, strings = flatten_schema(schema)
        str_blob, str_offs = _pack_strings(strings)
        tok_blob, tok_offs = _pack_strings([t or "" for t in token_strings])
        self.n_tokens = len(token_strings)
        # keep buffers alive
        self._keep = (sbuf, str_blob, str_offs, tok_blob, tok_offs)
        self._h = lib.ug_create(
            sbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), len(sbuf),
            str_blob, str_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(strings),
            tok_blob, tok_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.n_tokens,
        )

    @staticmethod
    def _configure(lib):
        if getattr(lib, "_g_configured", False):
            return
        lib.ug_create.restype = ctypes.c_void_p
        lib.ug_create.argtypes = [
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
        ]
        for name in ("ug_reset", "ug_destroy"):
            getattr(lib, name).restype = None
            getattr(lib, name).argtypes = [ctypes.c_void_p]
        lib.ug_observe.restype = ctypes.c_int
        lib.ug_observe.argtypes = [ctypes.c_void_p, ctypes.c_int]
        lib.ug_is_complete.restype = ctypes.c_int
        lib.ug_is_complete.argtypes = [ctypes.c_void_p]
        lib.ug_advance_text.restype = ctypes.c_int
        lib.ug_advance_text.argtypes = [ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int]
        lib.ug_mask.restype = ctypes.c_int
        lib.ug_mask.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8)]
        lib.ug_save.restype = ctypes.c_void_p
        lib.ug_save.argtypes = [ctypes.c_void_p]
        lib.ug_restore.restype = None
        lib.ug_restore.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
        lib.ug_snapshot_free.restype = None
        lib.ug_snapshot_free.argtypes = [ctypes.c_void_p]
        lib._g_configured = True

    def reset(self):
        self._lib.ug_reset(self._h)

    def observe(self, token_id: int) -> bool:
        return self._lib.ug_observe(self._h, int(token_id)) == 0

    def feed_text(self, text: str) -> bool:
        b = text.encode("utf-8", errors="replace")
        return self._lib.ug_advance_text(self._h, b, len(b)) == 0

    def is_complete(self) -> bool:
        return bool(self._lib.ug_is_complete(self._h))

    def save(self):
        """Opaque state snapshot (speculative-grammar lookahead)."""
        return self._lib.ug_save(self._h)

    def restore(self, snapshot) -> None:
        self._lib.ug_restore(self._h, snapshot)

    def snapshot_free(self, snapshot) -> None:
        self._lib.ug_snapshot_free(snapshot)

    def mask(self) -> np.ndarray:
        out = np.zeros(self.n_tokens, np.uint8)
        self._lib.ug_mask(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.astype(bool)

    def __del__(self):
        try:
            self._lib.ug_destroy(self._h)
        except Exception:
            pass

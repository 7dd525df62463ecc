// JSON (+schema subset) pushdown matcher with vocabulary mask computation.
//
// Role parity: the reference links xgrammar (C++) for grammar-constrained
// decoding (crates/backend-uzu/src/engine/language_model/grammar/mod.rs);
// this is the native hot path behind uzu_tpu.grammar — the Python matcher
// (uzu_tpu/grammar/matcher.py) is the semantic reference and fallback, this
// library computes per-step token bitmasks over large vocabularies fast.
// Semantics are kept in lockstep with matcher.py (tests compare them).
//
// Schema is passed pre-flattened from Python as an int32 table + string
// pool, so no JSON parsing happens here.
//
// C ABI only — consumed via ctypes.

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <cstdio>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

// type_mask bits
enum : uint32_t {
    T_OBJECT = 1u << 0,
    T_ARRAY = 1u << 1,
    T_STRING = 1u << 2,
    T_NUMBER = 1u << 3,
    T_INTEGER_ONLY = 1u << 4,  // with T_NUMBER: reject '.', 'e'
    T_BOOLEAN = 1u << 5,
    T_NULL = 1u << 6,
    T_ANY = 1u << 7,
};

struct Prop {
    int32_t name_sid;
    int32_t node;
    int32_t required;
};

struct Node {
    uint32_t type_mask = T_ANY;
    int32_t items = -1;     // node index for array items (-1 = any)
    int32_t min_items = 0;
    int32_t max_items = -1; // -1 = unbounded
    int32_t additional = 1; // additionalProperties allowed
    std::vector<Prop> props;
    std::vector<int32_t> enum_sids;  // string enum values
};

enum FrameKind : uint8_t {
    F_VALUE,
    F_STRING_BODY,
    F_STRING_ESC,
    F_NUMBER,
    F_LITERAL,
    F_OBJ_OPEN,
    F_OBJ_KEY_BODY,
    F_OBJ_VALUE_COLON,
    F_OBJ_NEXT,
    F_OBJ_KEY_START,
    F_ARR_OPEN,
    F_ARR_NEXT,
    F_STRING_U,  // inside \uXXXX: `count` hex digits remain
};

struct Frame {
    FrameKind kind;
    int32_t node = -1;        // schema node (or -1)
    uint64_t seen = 0;        // object: props already emitted
    uint64_t allowed = ~0ull; // obj keys: allowed prop bitmask (when !additional)
    int32_t count = 0;        // array item count
    int32_t key = -1;         // completed key prop index (-1 = additional)
    bool enum_str = false;    // string restricted to node's enum
    std::string acc;          // string/number accumulator
    std::string lit;          // literal remainder
};

struct Engine {
    std::vector<Node> nodes;
    std::vector<std::string> strings;
    std::vector<std::string> tokens;
    std::vector<Frame> stack;
    std::unordered_map<std::string, std::vector<uint8_t>> mask_cache;
    int32_t root = -1;
};

const Node* node_of(const Engine& e, int32_t idx) {
    return idx >= 0 ? &e.nodes[idx] : nullptr;
}

bool is_ws(char c) { return c == ' ' || c == '\t' || c == '\n' || c == '\r'; }
bool is_digit(char c) { return c >= '0' && c <= '9'; }

bool allow_type(const Node* n, uint32_t bit) {
    if (!n || (n->type_mask & T_ANY)) return true;
    return (n->type_mask & bit) != 0;
}

// does any candidate string (enum values or allowed keys) start with acc?
bool enum_viable(const Engine& e, const Node* n, const std::string& acc, bool closing) {
    for (int32_t sid : n->enum_sids) {
        const std::string& s = e.strings[sid];
        if (closing ? (s == acc) : (s.rfind(acc, 0) == 0 || acc.size() <= s.size()) ) {
            if (closing) return true;
            if (s.size() >= acc.size() && std::memcmp(s.data(), acc.data(), acc.size()) == 0)
                return true;
        }
    }
    return false;
}

bool key_viable(const Engine& e, const Node* n, uint64_t allowed, uint64_t seen,
                const std::string& acc, bool closing, int32_t* out_prop) {
    // additionalProperties: any key goes
    if (n == nullptr || n->additional) {
        if (closing && n != nullptr) {
            for (size_t i = 0; i < n->props.size(); ++i) {
                if (e.strings[n->props[i].name_sid] == acc) {
                    if (seen & (1ull << i)) return false;  // duplicate
                    *out_prop = (int32_t)i;
                    return true;
                }
            }
            *out_prop = -1;
            return true;
        }
        if (!closing) return true;
        *out_prop = -1;
        return true;
    }
    bool any = false;
    for (size_t i = 0; i < n->props.size(); ++i) {
        if (!(allowed & (1ull << i)) || (seen & (1ull << i))) continue;
        const std::string& name = e.strings[n->props[i].name_sid];
        if (closing) {
            if (name == acc) { *out_prop = (int32_t)i; return true; }
        } else if (name.size() >= acc.size() &&
                   std::memcmp(name.data(), acc.data(), acc.size()) == 0) {
            any = true;
        }
    }
    return closing ? false : any;
}

bool advance(Engine& e, char ch);

bool value_start(Engine& e, char ch, int32_t node_idx) {
    if (is_ws(ch)) return true;
    const Node* n = node_of(e, node_idx);
    e.stack.pop_back();
    Frame f;
    f.node = node_idx;
    if (ch == '"' && allow_type(n, T_STRING)) {
        f.kind = F_STRING_BODY;
        f.enum_str = n && !n->enum_sids.empty();
        e.stack.push_back(std::move(f));
        return true;
    }
    if (ch == '{' && allow_type(n, T_OBJECT)) {
        f.kind = F_OBJ_OPEN;
        e.stack.push_back(std::move(f));
        return true;
    }
    if (ch == '[' && allow_type(n, T_ARRAY)) {
        f.kind = F_ARR_OPEN;
        f.count = 0;
        e.stack.push_back(std::move(f));
        return true;
    }
    if ((is_digit(ch) || ch == '-') && allow_type(n, T_NUMBER)) {
        f.kind = F_NUMBER;
        f.acc.push_back(ch);
        e.stack.push_back(std::move(f));
        return true;
    }
    if (ch == 't' && allow_type(n, T_BOOLEAN)) {
        f.kind = F_LITERAL; f.lit = "rue";
        e.stack.push_back(std::move(f));
        return true;
    }
    if (ch == 'f' && allow_type(n, T_BOOLEAN)) {
        f.kind = F_LITERAL; f.lit = "alse";
        e.stack.push_back(std::move(f));
        return true;
    }
    if (ch == 'n' && allow_type(n, T_NULL)) {
        f.kind = F_LITERAL; f.lit = "ull";
        e.stack.push_back(std::move(f));
        return true;
    }
    return false;
}

bool num_prefix_ok(const std::string& a) {
    // a extends to SOME valid JSON number (mirrors matcher.py
    // _num_prefix_ok): -?(0|[1-9][0-9]*)(\.[0-9]+)?([eE][+-]?[0-9]+)?
    size_t i = 0, n = a.size();
    if (i < n && a[i] == '-') ++i;
    if (i == n) return true;
    if (a[i] == '0') {
        ++i;
    } else if (is_digit(a[i])) {
        while (i < n && is_digit(a[i])) ++i;
    } else {
        return false;
    }
    if (i == n) return true;
    if (a[i] == '.') {
        ++i;
        size_t start = i;
        while (i < n && is_digit(a[i])) ++i;
        if (i == n) return true;
        if (i == start) return false;  // '.e', '.+': no fraction digits yet
    }
    if (a[i] == 'e' || a[i] == 'E') {
        ++i;
        if (i == n) return true;
        if (a[i] == '+' || a[i] == '-') ++i;
        while (i < n && is_digit(a[i])) ++i;
        return i == n;
    }
    return false;
}

bool advance(Engine& e, char ch) {
    if (e.stack.empty()) return is_ws(ch);
    Frame& f = e.stack.back();
    const Node* n = node_of(e, f.node);
    switch (f.kind) {
        case F_VALUE:
            return value_start(e, ch, f.node);
        case F_STRING_BODY: {
            if (ch == '"') {
                if (f.enum_str && !enum_viable(e, n, f.acc, true)) return false;
                e.stack.pop_back();
                return true;
            }
            if (ch == '\\') { f.kind = F_STRING_ESC; return true; }
            if ((unsigned char)ch < 0x20) return false;  // raw controls
            f.acc.push_back(ch);
            if (f.enum_str && !enum_viable(e, n, f.acc, false)) return false;
            return true;
        }
        case F_STRING_ESC: {
            if (ch == 'u') {  // \uXXXX: exactly 4 hex digits must follow
                f.acc.push_back('\x7f');
                f.kind = F_STRING_U;
                f.count = 4;
                return true;
            }
            static const char* esc = "\"\\/bfnrt";
            // NB: strchr(s, '\0') matches the terminator — guard it, or a
            // NUL byte is "accepted" as an escape (py matcher rejects it)
            if (!ch || !std::strchr(esc, ch)) return false;
            char rep = (ch == '"' || ch == '\\' || ch == '/') ? ch : '\x7f';
            f.acc.push_back(rep);
            f.kind = F_STRING_BODY;
            if (f.enum_str && !enum_viable(e, n, f.acc, false)) return false;
            return true;
        }
        case F_STRING_U: {
            bool hex = is_digit(ch) || (ch >= 'a' && ch <= 'f') ||
                       (ch >= 'A' && ch <= 'F');
            if (!hex) return false;
            if (--f.count == 0) {
                f.kind = F_STRING_BODY;
                if (f.enum_str && !enum_viable(e, n, f.acc, false)) return false;
            }
            return true;
        }
        case F_NUMBER: {
            if (is_digit(ch) || ch == '.' || ch == 'e' || ch == 'E' || ch == '+' || ch == '-') {
                if ((ch == '.' || ch == 'e' || ch == 'E') && n &&
                    (n->type_mask & T_INTEGER_ONLY))
                    return false;
                f.acc.push_back(ch);
                if (!num_prefix_ok(f.acc)) { f.acc.pop_back(); return false; }
                return true;
            }
            // prefix validity is enforced per char: complete == digit-final
            if (f.acc.empty() || !is_digit(f.acc.back())) return false;
            e.stack.pop_back();
            return advance(e, ch);
        }
        case F_LITERAL: {
            if (!f.lit.empty() && ch == f.lit[0]) {
                f.lit.erase(0, 1);
                if (f.lit.empty()) e.stack.pop_back();
                return true;
            }
            return false;
        }
        case F_OBJ_OPEN: {
            if (is_ws(ch)) return true;
            if (ch == '}') {
                if (n) {
                    for (size_t i = 0; i < n->props.size(); ++i)
                        if (n->props[i].required) return false;
                }
                e.stack.pop_back();
                return true;
            }
            if (ch == '"') {
                uint64_t allowed = ~0ull;
                if (n && !n->additional) {
                    allowed = 0;
                    for (size_t i = 0; i < n->props.size(); ++i) allowed |= 1ull << i;
                }
                f.kind = F_OBJ_KEY_BODY;
                f.seen = 0;
                f.allowed = allowed;
                f.acc.clear();
                return true;
            }
            return false;
        }
        case F_OBJ_KEY_BODY: {
            if (ch == '"') {
                int32_t prop = -1;
                if (!key_viable(e, n, f.allowed, f.seen, f.acc, true, &prop)) return false;
                f.kind = F_OBJ_VALUE_COLON;
                f.key = prop;
                return true;
            }
            if (ch == '\\') return false;  // escaped keys unsupported (matches python)
            f.acc.push_back(ch);
            int32_t ignore;
            if (n && !n->additional &&
                !key_viable(e, n, f.allowed, f.seen, f.acc, false, &ignore))
                return false;
            return true;
        }
        case F_OBJ_VALUE_COLON: {
            if (is_ws(ch)) return true;
            if (ch == ':') {
                int32_t sub = -1;
                if (f.key >= 0 && n) {
                    f.seen |= 1ull << f.key;
                    sub = n->props[f.key].node;
                }
                f.kind = F_OBJ_NEXT;
                f.acc.clear();
                Frame v;
                v.kind = F_VALUE;
                v.node = sub;
                e.stack.push_back(std::move(v));
                return true;
            }
            return false;
        }
        case F_OBJ_NEXT: {
            if (is_ws(ch)) return true;
            if (ch == '}') {
                if (n) {
                    for (size_t i = 0; i < n->props.size(); ++i)
                        if (n->props[i].required && !(f.seen & (1ull << i))) return false;
                }
                e.stack.pop_back();
                return true;
            }
            if (ch == ',') {
                if (n && !n->additional) {
                    uint64_t all = 0;
                    for (size_t i = 0; i < n->props.size(); ++i) all |= 1ull << i;
                    uint64_t remaining = all & ~f.seen;
                    if (!remaining) return false;
                    f.allowed = remaining;
                }
                f.kind = F_OBJ_KEY_START;
                return true;
            }
            return false;
        }
        case F_OBJ_KEY_START: {
            if (is_ws(ch)) return true;
            if (ch == '"') {
                f.kind = F_OBJ_KEY_BODY;
                f.acc.clear();
                return true;
            }
            return false;
        }
        case F_ARR_OPEN: {
            if (is_ws(ch)) return true;
            if (ch == ']') {
                if (n && f.count < n->min_items) return false;
                e.stack.pop_back();
                return true;
            }
            int32_t items = n ? n->items : -1;
            f.kind = F_ARR_NEXT;
            f.count += 1;
            Frame v;
            v.kind = F_VALUE;
            v.node = items;
            e.stack.push_back(std::move(v));
            return advance(e, ch);
        }
        case F_ARR_NEXT: {
            if (is_ws(ch)) return true;
            if (ch == ']') {
                if (n && f.count < n->min_items) return false;
                e.stack.pop_back();
                return true;
            }
            if (ch == ',') {
                if (n && n->max_items >= 0 && f.count >= n->max_items) return false;
                int32_t items = n ? n->items : -1;
                f.count += 1;
                Frame v;
                v.kind = F_VALUE;
                v.node = items;
                e.stack.push_back(std::move(v));
                return true;
            }
            return false;
        }
    }
    return false;
}

void signature(const Engine& e, std::string* out) {
    out->clear();
    char buf[64];
    for (const Frame& f : e.stack) {
        int len = std::snprintf(buf, sizeof buf, "%d:%d:%llu:%llu:%d:%d:%d|",
                                (int)f.kind, f.node, (unsigned long long)f.seen,
                                (unsigned long long)f.allowed, f.count, f.key,
                                (int)f.enum_str);
        out->append(buf, len);
        out->append(f.acc);
        out->push_back(';');
        out->append(f.lit);
        out->push_back('#');
    }
}

}  // namespace

extern "C" {

// schema_buf layout (int32): n_nodes, then per node:
//   [type_mask, items, min_items, max_items, additional, n_props, n_enum]
//   then n_props * [name_sid, node, required], then n_enum * [sid]
// strings: blob + (n_strs+1) offsets; tokens likewise.
void* ug_create(const int32_t* schema_buf, int32_t schema_len,
                const char* str_blob, const int32_t* str_offs, int32_t n_strs,
                const char* tok_blob, const int32_t* tok_offs, int32_t n_tokens) {
    Engine* e = new Engine();
    for (int32_t i = 0; i < n_strs; ++i)
        e->strings.emplace_back(str_blob + str_offs[i], str_offs[i + 1] - str_offs[i]);
    for (int32_t i = 0; i < n_tokens; ++i)
        e->tokens.emplace_back(tok_blob + tok_offs[i], tok_offs[i + 1] - tok_offs[i]);

    if (schema_len > 0) {
        const int32_t* p = schema_buf;
        int32_t n_nodes = *p++;
        for (int32_t i = 0; i < n_nodes; ++i) {
            Node n;
            n.type_mask = (uint32_t)*p++;
            n.items = *p++;
            n.min_items = *p++;
            n.max_items = *p++;
            n.additional = *p++;
            int32_t n_props = *p++;
            int32_t n_enum = *p++;
            for (int32_t j = 0; j < n_props; ++j) {
                Prop pr{p[0], p[1], p[2]};
                p += 3;
                n.props.push_back(pr);
            }
            for (int32_t j = 0; j < n_enum; ++j) n.enum_sids.push_back(*p++);
            e->nodes.push_back(std::move(n));
        }
        e->root = 0;
    }
    Frame v;
    v.kind = F_VALUE;
    v.node = e->root;
    e->stack.push_back(v);
    return e;
}

void ug_reset(void* h) {
    Engine* e = static_cast<Engine*>(h);
    e->stack.clear();
    Frame v;
    v.kind = F_VALUE;
    v.node = e->root;
    e->stack.push_back(v);
}

int ug_advance_text(void* h, const char* s, int len) {
    Engine* e = static_cast<Engine*>(h);
    for (int i = 0; i < len; ++i)
        if (!advance(*e, s[i])) return -1;
    return 0;
}

int ug_observe(void* h, int token_id) {
    Engine* e = static_cast<Engine*>(h);
    const std::string& t = e->tokens[token_id];
    return ug_advance_text(h, t.data(), (int)t.size());
}

int ug_is_complete(void* h) {
    return static_cast<Engine*>(h)->stack.empty() ? 1 : 0;
}

// Fills out[n_tokens]; returns count of allowed tokens. Uses the per-state
// cache (the role of xgrammar's adaptive token mask cache).
int ug_mask(void* h, uint8_t* out) {
    Engine* e = static_cast<Engine*>(h);
    std::string sig;
    signature(*e, &sig);
    auto it = e->mask_cache.find(sig);
    if (it != e->mask_cache.end()) {
        std::memcpy(out, it->second.data(), it->second.size());
        int count = 0;
        for (uint8_t b : it->second) count += b;
        return count;
    }
    std::vector<uint8_t> mask(e->tokens.size(), 0);
    int count = 0;
    for (size_t i = 0; i < e->tokens.size(); ++i) {
        const std::string& t = e->tokens[i];
        if (t.empty()) continue;
        std::vector<Frame> saved = e->stack;  // clone state
        bool ok = true;
        for (char c : t) {
            if (!advance(*e, c)) { ok = false; break; }
        }
        e->stack = std::move(saved);
        if (ok) { mask[i] = 1; ++count; }
    }
    std::memcpy(out, mask.data(), mask.size());
    e->mask_cache.emplace(std::move(sig), std::move(mask));
    return count;
}

void ug_destroy(void* h) { delete static_cast<Engine*>(h); }

// Snapshot/restore of the matcher state (the Frame stack) — the lookahead
// path of speculative grammar decoding clones the state, walks a draft
// chain filling per-node masks, then restores (reference: per-trie-node
// bitmask fill, stream.rs:632-675 + trie.rs:167).
void* ug_save(void* h) {
    Engine* e = static_cast<Engine*>(h);
    return new std::vector<Frame>(e->stack);
}

void ug_restore(void* h, void* snap) {
    Engine* e = static_cast<Engine*>(h);
    e->stack = *static_cast<std::vector<Frame>*>(snap);
}

void ug_snapshot_free(void* snap) {
    delete static_cast<std::vector<Frame>*>(snap);
}

}  // extern "C"

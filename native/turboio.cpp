// turboio — native host-side IO/tokenizer runtime for turboinfer_tpu.
//
// Native counterpart of the reference's C++ host layers: the GGUF
// binary parser (reference: src/model/model_loader.cpp:710-873) and the
// greedy-merge tokenizer encode loop (reference:
// src/model/inference_engine.cpp:1332-1391). The TPU compute path is
// JAX/XLA/Pallas; this library covers the host-side hot paths that the
// reference implemented in C++: model-file index parsing and O(n log n)
// BPE encoding. Exposed through a plain C ABI consumed via ctypes
// (turboinfer_tpu/native.py), with a pure-Python fallback when the
// shared library is unavailable.
//
// Build: make -C native   (g++ -O2 -std=c++20 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <map>
#include <queue>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Minimal binary reader
// ---------------------------------------------------------------------------

struct Reader {
    const uint8_t* p;
    size_t n;
    size_t pos = 0;
    bool ok = true;

    template <typename T>
    T get() {
        if (pos + sizeof(T) > n) { ok = false; return T{}; }
        T v;
        std::memcpy(&v, p + pos, sizeof(T));
        pos += sizeof(T);
        return v;
    }

    std::string_view str() {
        uint64_t len = get<uint64_t>();
        if (!ok || pos + len > n) { ok = false; return {}; }
        std::string_view s(reinterpret_cast<const char*>(p + pos), len);
        pos += len;
        return s;
    }

    void skip(size_t k) {
        if (pos + k > n) { ok = false; return; }
        pos += k;
    }
};

// ---------------------------------------------------------------------------
// JSON writer (no external deps)
// ---------------------------------------------------------------------------

void json_escape(std::string& out, std::string_view s) {
    out += '"';
    for (unsigned char c : s) {
        switch (c) {
            case '"': out += "\\\""; break;
            case '\\': out += "\\\\"; break;
            case '\n': out += "\\n"; break;
            case '\r': out += "\\r"; break;
            case '\t': out += "\\t"; break;
            default:
                if (c < 0x20) {
                    char buf[8];
                    std::snprintf(buf, sizeof buf, "\\u%04x", c);
                    out += buf;
                } else {
                    out += static_cast<char>(c);
                }
        }
    }
    out += '"';
}

// GGUF metadata value types.
enum : uint32_t {
    T_U8 = 0, T_I8, T_U16, T_I16, T_U32, T_I32, T_F32, T_BOOL,
    T_STRING, T_ARRAY, T_U64, T_I64, T_F64
};

bool write_scalar(Reader& r, uint32_t t, std::string& out) {
    char buf[64];
    switch (t) {
        case T_U8: std::snprintf(buf, sizeof buf, "%u", r.get<uint8_t>()); break;
        case T_I8: std::snprintf(buf, sizeof buf, "%d", r.get<int8_t>()); break;
        case T_U16: std::snprintf(buf, sizeof buf, "%u", r.get<uint16_t>()); break;
        case T_I16: std::snprintf(buf, sizeof buf, "%d", r.get<int16_t>()); break;
        case T_U32: std::snprintf(buf, sizeof buf, "%u", r.get<uint32_t>()); break;
        case T_I32: std::snprintf(buf, sizeof buf, "%d", r.get<int32_t>()); break;
        case T_F32: std::snprintf(buf, sizeof buf, "%.9g", r.get<float>()); break;
        case T_BOOL: std::snprintf(buf, sizeof buf, "%s", r.get<uint8_t>() ? "true" : "false"); break;
        case T_U64: std::snprintf(buf, sizeof buf, "%llu", (unsigned long long)r.get<uint64_t>()); break;
        case T_I64: std::snprintf(buf, sizeof buf, "%lld", (long long)r.get<int64_t>()); break;
        case T_F64: std::snprintf(buf, sizeof buf, "%.17g", r.get<double>()); break;
        default: return false;
    }
    if (!r.ok) return false;
    // JSON can't hold bare NaN/Inf; clamp to null.
    if (std::strstr(buf, "nan") || std::strstr(buf, "inf"))
        out += "null";
    else
        out += buf;
    return true;
}

bool write_value(Reader& r, uint32_t t, std::string& out);

bool write_array(Reader& r, std::string& out) {
    uint32_t et = r.get<uint32_t>();
    uint64_t count = r.get<uint64_t>();
    if (!r.ok) return false;
    out += '[';
    for (uint64_t i = 0; i < count; ++i) {
        if (i) out += ',';
        if (!write_value(r, et, out)) return false;
    }
    out += ']';
    return true;
}

bool write_value(Reader& r, uint32_t t, std::string& out) {
    if (t == T_STRING) {
        auto s = r.str();
        if (!r.ok) return false;
        json_escape(out, s);
        return true;
    }
    if (t == T_ARRAY) return write_array(r, out);
    return write_scalar(r, t, out);
}

char* dup_string(const std::string& s) {
    char* out = static_cast<char*>(std::malloc(s.size() + 1));
    std::memcpy(out, s.data(), s.size() + 1);
    return out;
}

std::vector<uint8_t> read_file(const char* path) {
    std::vector<uint8_t> buf;
    FILE* f = std::fopen(path, "rb");
    if (!f) return buf;
    std::fseek(f, 0, SEEK_END);
    long size = std::ftell(f);
    std::fseek(f, 0, SEEK_SET);
    buf.resize(size > 0 ? static_cast<size_t>(size) : 0);
    if (size > 0 && std::fread(buf.data(), 1, buf.size(), f) != buf.size())
        buf.clear();
    std::fclose(f);
    return buf;
}

}  // namespace

extern "C" {

void turboio_free(char* p) { std::free(p); }

const char* turboio_version() { return "turboio 1.0"; }

// Parse a GGUF v3 file's header + metadata + tensor index into JSON:
// {"metadata": {...}, "tensors": {name: {"dims": [...], "type": t,
//  "offset": o}}, "data_start": int, "alignment": int}
// Returns malloc'd JSON (caller frees with turboio_free) or nullptr.
char* turboio_gguf_index_json(const char* path) {
    auto buf = read_file(path);
    if (buf.size() < 24) return nullptr;
    Reader r{buf.data(), buf.size()};
    uint32_t magic = r.get<uint32_t>();
    uint32_t version = r.get<uint32_t>();
    if (magic != 0x46554747u || version != 3) return nullptr;
    uint64_t n_tensors = r.get<uint64_t>();
    uint64_t n_kv = r.get<uint64_t>();
    if (!r.ok) return nullptr;

    std::string out;
    out.reserve(1 << 20);
    out += "{\"metadata\":{";
    uint64_t alignment = 32;
    for (uint64_t i = 0; i < n_kv; ++i) {
        auto key = r.str();
        uint32_t t = r.get<uint32_t>();
        if (!r.ok) return nullptr;
        if (i) out += ',';
        json_escape(out, key);
        out += ':';
        std::string val;
        if (!write_value(r, t, val)) return nullptr;
        out += val;
        if (key == "general.alignment") {
            alignment = std::strtoull(val.c_str(), nullptr, 10);
            if (alignment == 0) alignment = 32;
        }
    }
    out += "},\"tensors\":{";
    for (uint64_t i = 0; i < n_tensors; ++i) {
        auto name = r.str();
        uint32_t nd = r.get<uint32_t>();
        if (!r.ok || nd > 8) return nullptr;
        uint64_t dims[8];
        for (uint32_t d = 0; d < nd; ++d) dims[d] = r.get<uint64_t>();
        uint32_t ttype = r.get<uint32_t>();
        uint64_t offset = r.get<uint64_t>();
        if (!r.ok) return nullptr;
        if (i) out += ',';
        json_escape(out, name);
        out += ":{\"dims\":[";
        for (uint32_t d = 0; d < nd; ++d) {
            if (d) out += ',';
            char b[32];
            std::snprintf(b, sizeof b, "%llu", (unsigned long long)dims[d]);
            out += b;
        }
        char b[96];
        std::snprintf(b, sizeof b, "],\"type\":%u,\"offset\":%llu}", ttype,
                      (unsigned long long)offset);
        out += b;
    }
    uint64_t data_start = (r.pos + alignment - 1) / alignment * alignment;
    char b[96];
    std::snprintf(b, sizeof b, "},\"data_start\":%llu,\"alignment\":%llu}",
                  (unsigned long long)data_start,
                  (unsigned long long)alignment);
    out += b;
    return dup_string(out);
}

// ---------------------------------------------------------------------------
// SPM (SentencePiece-BPE) encoder: score-driven agenda merge, O(n log n).
// Equivalent semantics to tokenizer/bpe.py::SPMTokenizer.encode.
// ---------------------------------------------------------------------------

struct SpmTokenizer {
    std::vector<std::string> tokens;
    std::vector<float> scores;
    std::unordered_map<std::string, int32_t> vocab;
    int32_t byte_ids[256];
    bool add_space_prefix = true;
};

void* turboio_spm_new(const char** toks, const float* scores, int32_t n,
                      int32_t add_space_prefix) {
    auto* t = new SpmTokenizer;
    t->tokens.reserve(n);
    t->scores.reserve(n);
    t->vocab.reserve(n * 2);
    for (int32_t i = 0; i < n; ++i) {
        t->tokens.emplace_back(toks[i]);
        t->scores.push_back(scores ? scores[i] : 0.0f);
        t->vocab.emplace(t->tokens.back(), i);
    }
    for (int b = 0; b < 256; ++b) {
        char name[8];
        std::snprintf(name, sizeof name, "<0x%02X>", b);
        auto it = t->vocab.find(name);
        t->byte_ids[b] = it == t->vocab.end() ? -1 : it->second;
    }
    t->add_space_prefix = add_space_prefix != 0;
    return t;
}

void turboio_spm_delete(void* h) { delete static_cast<SpmTokenizer*>(h); }

namespace {

// Agenda-based merge over a doubly-linked list of pieces.
struct Piece {
    int32_t begin, end;     // byte span in the working string
    int32_t prev, next;
    bool alive = true;
};

struct Merge {
    float score;
    int32_t left;           // left piece index
    int32_t gen_l, gen_r;   // generation stamps for staleness check
    int32_t tok;            // merged token id
    // Highest score wins; ties break to the LEFTMOST pair (matches the
    // Python reference implementation's first-best scan).
    bool operator<(const Merge& o) const {
        if (score != o.score) return score < o.score;
        return left > o.left;
    }
};

}  // namespace

// Encode UTF-8 text. Returns number of ids written (<= max_out), or the
// required count if out == nullptr.
int32_t turboio_spm_encode(void* h, const char* text_c, int32_t add_bos,
                           int32_t bos_id, int32_t unk_id,
                           int32_t* out, int32_t max_out) {
    auto* t = static_cast<SpmTokenizer*>(h);
    std::string s;
    {
        std::string_view text(text_c);
        s.reserve(text.size() + 4);
        if (t->add_space_prefix && !text.empty() && text[0] != ' ')
            s += ' ';
        s += text;
        // Replace ' ' with U+2581 (the SPM space marker, 3 bytes UTF-8).
        std::string s2;
        s2.reserve(s.size() * 2);
        for (char c : s) {
            if (c == ' ') s2 += "\xe2\x96\x81";
            else s2 += c;
        }
        s = std::move(s2);
    }

    // Initial pieces: one per UTF-8 character.
    std::vector<Piece> pieces;
    std::vector<int32_t> gen;
    {
        int32_t i = 0, n = static_cast<int32_t>(s.size());
        while (i < n) {
            unsigned char c = s[i];
            int32_t len = c < 0x80 ? 1 : c < 0xE0 ? 2 : c < 0xF0 ? 3 : 4;
            if (i + len > n) len = 1;
            int32_t idx = static_cast<int32_t>(pieces.size());
            pieces.push_back({i, i + len, idx - 1, idx + 1, true});
            i += len;
        }
        if (!pieces.empty()) pieces.back().next = -1;
        gen.assign(pieces.size(), 0);
    }

    std::priority_queue<Merge> agenda;
    auto push_pair = [&](int32_t l) {
        if (l < 0 || !pieces[l].alive) return;
        int32_t rn = pieces[l].next;
        if (rn < 0 || !pieces[rn].alive) return;
        std::string cand = s.substr(pieces[l].begin,
                                    pieces[rn].end - pieces[l].begin);
        auto it = t->vocab.find(cand);
        if (it == t->vocab.end()) return;
        agenda.push({t->scores[it->second], l, gen[l], gen[rn], it->second});
    };
    for (int32_t i = 0; i + 1 < static_cast<int32_t>(pieces.size()); ++i)
        push_pair(i);

    while (!agenda.empty()) {
        Merge m = agenda.top();
        agenda.pop();
        int32_t l = m.left;
        if (!pieces[l].alive || gen[l] != m.gen_l) continue;
        int32_t rn = pieces[l].next;
        if (rn < 0 || !pieces[rn].alive || gen[rn] != m.gen_r) continue;
        // Merge r into l.
        pieces[l].end = pieces[rn].end;
        pieces[rn].alive = false;
        pieces[l].next = pieces[rn].next;
        if (pieces[l].next >= 0) pieces[pieces[l].next].prev = l;
        gen[l]++;
        push_pair(pieces[l].prev);
        push_pair(l);
    }

    // Emit ids.
    int32_t count = 0;
    auto emit = [&](int32_t id) {
        if (out && count < max_out) out[count] = id;
        ++count;
    };
    if (add_bos) emit(bos_id);
    for (int32_t i = 0; i >= 0 && i < static_cast<int32_t>(pieces.size());
         i = pieces[i].next) {
        if (!pieces[i].alive) continue;
        std::string piece = s.substr(pieces[i].begin,
                                     pieces[i].end - pieces[i].begin);
        auto it = t->vocab.find(piece);
        if (it != t->vocab.end()) {
            emit(it->second);
        } else {
            for (unsigned char c : piece) {
                int32_t bid = t->byte_ids[c];
                emit(bid >= 0 ? bid : unk_id);
            }
        }
    }
    return count;
}

}  // extern "C"

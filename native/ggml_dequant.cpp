// ggml_dequant — native GGUF block dequantization for turboinfer_tpu.
//
// Native counterpart of the reference's model-loading layer (reference:
// src/model/model_loader.cpp:852-870 reads tensors; its quantized GGML
// types were silently mis-read — SURVEY.md quirk #10). The Python
// loader (turboinfer_tpu/loader/gguf.py:dequantize_ggml) defines the
// numpy golden semantics; this file is the multithreaded fast path —
// the numpy forms run at ~10-300 Melem/s, which costs minutes for a 7B
// checkpoint, while this OpenMP loop nest runs at memory speed.
//
// Layouts follow the public GGML/GGUF block formats:
//   Q4_0  18B/32:  fp16 d, 16B nibbles          (q-8)*d
//   Q4_1  20B/32:  fp16 d, fp16 m, 16B nibbles  q*d+m
//   Q5_0  22B/32:  fp16 d, u32 high bits, 16B   (q-16)*d
//   Q5_1  24B/32:  fp16 d, fp16 m, u32, 16B     q*d+m
//   Q8_0  34B/32:  fp16 d, 32 int8              q*d
//   Q4_K 144B/256: fp16 d, fp16 dmin, 12B 6-bit scales, 128B nibbles
//   Q5_K 176B/256: + 32B high bits
//   Q6_K 210B/256: 128B low, 64B high, 16 int8 scales, fp16 d
// Nibble order within a 32-group is all-low then all-high, matching
// the numpy reference exactly.

#include <cstdint>
#include <cstring>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal: normalize
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; ++shift; }
            man &= 0x3FF;
            bits = sign | ((uint32_t)(127 - 15 + 1 - shift) << 23)
                 | (man << 13);
        }
    } else if (exp == 31) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp + 127 - 15) << 23) | (man << 13);
    }
    float f;
    std::memcpy(&f, &bits, sizeof(f));
    return f;
}

inline uint16_t rd16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

inline uint32_t rd32(const uint8_t* p) {
    uint32_t v;
    std::memcpy(&v, p, 4);
    return v;
}

// K-quant 12-byte 6-bit scale/min packing (gguf.py:_unpack_kscales).
void unpack_kscales(const uint8_t* s, float sc[8], float mn[8]) {
    for (int j = 0; j < 4; ++j) {
        sc[j] = (float)(s[j] & 63);
        mn[j] = (float)(s[j + 4] & 63);
    }
    for (int j = 4; j < 8; ++j) {
        sc[j] = (float)((s[j + 4] & 0x0F) | ((s[j - 4] >> 6) << 4));
        mn[j] = (float)((s[j + 4] >> 4) | ((s[j] >> 6) << 4));
    }
}

void blk_q4_0(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    const uint8_t* qs = b + 2;
    for (int i = 0; i < 16; ++i) {
        o[i] = (float)((int)(qs[i] & 0x0F) - 8) * d;
        o[16 + i] = (float)((int)(qs[i] >> 4) - 8) * d;
    }
}

void blk_q4_1(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    float m = f16_to_f32(rd16(b + 2));
    const uint8_t* qs = b + 4;
    for (int i = 0; i < 16; ++i) {
        o[i] = (float)(qs[i] & 0x0F) * d + m;
        o[16 + i] = (float)(qs[i] >> 4) * d + m;
    }
}

void blk_q5_0(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    uint32_t qh = rd32(b + 2);
    const uint8_t* qs = b + 6;
    for (int i = 0; i < 16; ++i) {
        int lo = (qs[i] & 0x0F) | (int)((qh >> i) & 1) << 4;
        int hi = (qs[i] >> 4) | (int)((qh >> (16 + i)) & 1) << 4;
        o[i] = (float)(lo - 16) * d;
        o[16 + i] = (float)(hi - 16) * d;
    }
}

void blk_q5_1(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    float m = f16_to_f32(rd16(b + 2));
    uint32_t qh = rd32(b + 4);
    const uint8_t* qs = b + 8;
    for (int i = 0; i < 16; ++i) {
        int lo = (qs[i] & 0x0F) | (int)((qh >> i) & 1) << 4;
        int hi = (qs[i] >> 4) | (int)((qh >> (16 + i)) & 1) << 4;
        o[i] = (float)lo * d + m;
        o[16 + i] = (float)hi * d + m;
    }
}

void blk_q8_0(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    const int8_t* qs = reinterpret_cast<const int8_t*>(b + 2);
    for (int i = 0; i < 32; ++i) o[i] = (float)qs[i] * d;
}

void blk_q4_k(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    float dmin = f16_to_f32(rd16(b + 2));
    float sc[8], mn[8];
    unpack_kscales(b + 4, sc, mn);
    const uint8_t* qs = b + 16;
    for (int j = 0; j < 4; ++j) {
        const uint8_t* qb = qs + 32 * j;
        float d1 = d * sc[2 * j], m1 = dmin * mn[2 * j];
        float d2 = d * sc[2 * j + 1], m2 = dmin * mn[2 * j + 1];
        float* out = o + 64 * j;
        for (int i = 0; i < 32; ++i) {
            out[i] = (float)(qb[i] & 0x0F) * d1 - m1;
            out[32 + i] = (float)(qb[i] >> 4) * d2 - m2;
        }
    }
}

void blk_q5_k(const uint8_t* b, float* o) {
    float d = f16_to_f32(rd16(b));
    float dmin = f16_to_f32(rd16(b + 2));
    float sc[8], mn[8];
    unpack_kscales(b + 4, sc, mn);
    const uint8_t* qh = b + 16;
    const uint8_t* qs = b + 48;
    for (int j = 0; j < 4; ++j) {
        const uint8_t* qb = qs + 32 * j;
        float d1 = d * sc[2 * j], m1 = dmin * mn[2 * j];
        float d2 = d * sc[2 * j + 1], m2 = dmin * mn[2 * j + 1];
        float* out = o + 64 * j;
        for (int i = 0; i < 32; ++i) {
            float h1 = (float)((qh[i] >> (2 * j)) & 1) * 16.0f;
            float h2 = (float)((qh[i] >> (2 * j + 1)) & 1) * 16.0f;
            out[i] = ((float)(qb[i] & 0x0F) + h1) * d1 - m1;
            out[32 + i] = ((float)(qb[i] >> 4) + h2) * d2 - m2;
        }
    }
}

void blk_q2_k(const uint8_t* b, float* o) {
    // 84B/256: 16 u8 scales (lo nibble scale, hi nibble min), 64B 2-bit
    // quants, fp16 d, fp16 dmin (gguf.py GGML_Q2_K branch).
    const uint8_t* scs = b;
    const uint8_t* qs = b + 16;
    float d = f16_to_f32(rd16(b + 80));
    float dmin = f16_to_f32(rd16(b + 82));
    int is = 0;
    for (int half = 0; half < 2; ++half) {
        const uint8_t* q = qs + 32 * half;
        float* out = o + 128 * half;
        for (int j = 0; j < 4; ++j) {
            for (int sub = 0; sub < 2; ++sub, ++is) {
                float dl = d * (float)(scs[is] & 0x0F);
                float ml = dmin * (float)(scs[is] >> 4);
                const uint8_t* qq = q + 16 * sub;
                float* oo = out + 32 * j + 16 * sub;
                for (int l = 0; l < 16; ++l)
                    oo[l] = dl * (float)((qq[l] >> (2 * j)) & 3) - ml;
            }
        }
    }
}

// Q3_K 12-byte 6-bit scale packing (gguf.py:_unpack_q3k_scales).
void unpack_q3k_scales(const uint8_t* s, float sc[16]) {
    for (int i = 0; i < 4; ++i) {
        uint8_t hib = s[8 + i];
        sc[i] = (float)((s[i] & 0x0F) | ((hib & 3) << 4));
        sc[4 + i] = (float)((s[4 + i] & 0x0F) | (((hib >> 2) & 3) << 4));
        sc[8 + i] = (float)((s[i] >> 4) | (((hib >> 4) & 3) << 4));
        sc[12 + i] = (float)((s[4 + i] >> 4) | (((hib >> 6) & 3) << 4));
    }
}

void blk_q3_k(const uint8_t* b, float* o) {
    // 110B/256: 32B high-bit mask, 64B 2-bit low quants, 12B 6-bit
    // scales, fp16 d; q = (lo | hi<<2) - 4 with hi from hmask bit
    // half*4+j, scale bias -32 (gguf.py GGML_Q3_K branch).
    const uint8_t* hm = b;
    const uint8_t* qs = b + 32;
    float sc[16];
    unpack_q3k_scales(b + 96, sc);
    float d = f16_to_f32(rd16(b + 108));
    int is = 0;
    for (int half = 0; half < 2; ++half) {
        const uint8_t* q = qs + 32 * half;
        float* out = o + 128 * half;
        for (int j = 0; j < 4; ++j) {
            int mbit = 4 * half + j;
            for (int sub = 0; sub < 2; ++sub, ++is) {
                float dl = d * (sc[is] - 32.0f);
                const uint8_t* qq = q + 16 * sub;
                const uint8_t* hh = hm + 16 * sub;
                float* oo = out + 32 * j + 16 * sub;
                for (int l = 0; l < 16; ++l) {
                    int v = (int)((qq[l] >> (2 * j)) & 3)
                          - (((hh[l] >> mbit) & 1) ? 0 : 4);
                    oo[l] = dl * (float)v;
                }
            }
        }
    }
}

void blk_q8_k(const uint8_t* b, float* o) {
    // 292B/256: fp32 d, 256 int8, 16 int16 bsums (unused on dequant).
    float d;
    std::memcpy(&d, b, 4);
    const int8_t* qs = reinterpret_cast<const int8_t*>(b + 4);
    for (int i = 0; i < 256; ++i) o[i] = (float)qs[i] * d;
}

void blk_q6_k(const uint8_t* b, float* o) {
    const uint8_t* ql = b;
    const uint8_t* qh = b + 128;
    const int8_t* sc = reinterpret_cast<const int8_t*>(b + 192);
    float d = f16_to_f32(rd16(b + 208));
    for (int half = 0; half < 2; ++half) {
        const uint8_t* qlh = ql + 64 * half;
        const uint8_t* qhh = qh + 32 * half;
        const int8_t* sch = sc + 8 * half;
        float* out = o + 128 * half;
        for (int l = 0; l < 32; ++l) {
            int is = l / 16;
            int q1 = ((qlh[l] & 0x0F) | (((qhh[l] >> 0) & 3) << 4)) - 32;
            int q2 = ((qlh[32 + l] & 0x0F) | (((qhh[l] >> 2) & 3) << 4)) - 32;
            int q3 = ((qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4)) - 32;
            int q4 = ((qlh[32 + l] >> 4) | (((qhh[l] >> 6) & 3) << 4)) - 32;
            out[l] = d * (float)sch[is + 0] * (float)q1;
            out[32 + l] = d * (float)sch[is + 2] * (float)q2;
            out[64 + l] = d * (float)sch[is + 4] * (float)q3;
            out[96 + l] = d * (float)sch[is + 6] * (float)q4;
        }
    }
}

struct Layout {
    int block_elems;
    int block_bytes;
    void (*fn)(const uint8_t*, float*);
};

// ggml type ids (gguf.py top-of-file constants).
bool layout_for(int32_t t, Layout* L) {
    switch (t) {
        case 2:  *L = {32, 18, blk_q4_0}; return true;   // Q4_0
        case 3:  *L = {32, 20, blk_q4_1}; return true;   // Q4_1
        case 6:  *L = {32, 22, blk_q5_0}; return true;   // Q5_0
        case 7:  *L = {32, 24, blk_q5_1}; return true;   // Q5_1
        case 8:  *L = {32, 34, blk_q8_0}; return true;   // Q8_0
        case 10: *L = {256, 84, blk_q2_k}; return true;  // Q2_K
        case 11: *L = {256, 110, blk_q3_k}; return true; // Q3_K
        case 12: *L = {256, 144, blk_q4_k}; return true; // Q4_K
        case 13: *L = {256, 176, blk_q5_k}; return true; // Q5_K
        case 14: *L = {256, 210, blk_q6_k}; return true; // Q6_K
        case 15: *L = {256, 292, blk_q8_k}; return true; // Q8_K
        default: return false;
    }
}

}  // namespace

extern "C" {

// raw[raw_len] -> out[n_elems] f32. Returns 0 ok, -1 unsupported type,
// -2 short buffer. Thread-parallel over blocks.
int32_t turboio_ggml_dequant(int32_t ggml_type, const uint8_t* raw,
                             int64_t raw_len, int64_t n_elems, float* out) {
    Layout L;
    if (!layout_for(ggml_type, &L)) return -1;
    int64_t nb_full = n_elems / L.block_elems;
    int64_t tail = n_elems - nb_full * L.block_elems;
    int64_t need = (nb_full + (tail ? 1 : 0)) * (int64_t)L.block_bytes;
    if (raw_len < need) return -2;

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < nb_full; ++i) {
        L.fn(raw + i * L.block_bytes, out + i * L.block_elems);
    }
    if (tail) {
        float tmp[256];
        L.fn(raw + nb_full * L.block_bytes, tmp);
        std::memcpy(out + nb_full * L.block_elems, tmp,
                    (size_t)tail * sizeof(float));
    }
    return 0;
}

}  // extern "C"

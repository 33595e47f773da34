// Native host-side dequantization kernels for GGUF block formats.
//
// TPU-native framework counterpart of the reference's Rust/SIMD dequant
// layer (/root/reference/src/tensor/quant/dequant.rs:16-451) — here it is
// the model-LOAD hot path (streaming GBs of quantized weights from the
// mmapped GGUF into f32 / repacked device layouts), not the decode path
// (decode dequant runs in Pallas kernels on the TPU).
//
// Built with: g++ -O3 -march=native -fopenmp -shared -fPIC
// Exposed via ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstring>

#if defined(_OPENMP)
#include <omp.h>
#endif

namespace {

inline float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FF;
    uint32_t bits;
    if (exp == 0) {
        if (man == 0) {
            bits = sign;
        } else {  // subnormal: value = man * 2^-24; normalize to bit 10
            int shift = 0;
            while (!(man & 0x400)) { man <<= 1; ++shift; }
            man &= 0x3FF;
            // exponent = -14 - shift  ->  biased = 113 - shift
            bits = sign | ((uint32_t)(113 - shift) << 23) | (man << 13);
        }
    } else if (exp == 0x1F) {
        bits = sign | 0x7F800000u | (man << 13);
    } else {
        bits = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    float out;
    std::memcpy(&out, &bits, sizeof(out));
    return out;
}

inline uint16_t load_u16(const uint8_t* p) {
    uint16_t v;
    std::memcpy(&v, p, 2);
    return v;
}

// llama.cpp get_scale_min_k4: 12 packed bytes -> 8 six-bit scales + mins
inline void k4_scale_min(const uint8_t* s, float* sc, float* mn) {
    for (int j = 0; j < 4; ++j) {
        sc[j] = (float)(s[j] & 63);
        mn[j] = (float)(s[j + 4] & 63);
        sc[j + 4] = (float)((s[j + 8] & 0x0F) | ((s[j] >> 6) << 4));
        mn[j + 4] = (float)((s[j + 8] >> 4) | ((s[j + 4] >> 6) << 4));
    }
}

}  // namespace

extern "C" {

// ---- legacy 32-element blocks ------------------------------------------------

void dequant_q4_0(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 18;
        float* o = out + b * 32;
        float d = f16_to_f32(load_u16(p));
        const uint8_t* qs = p + 2;
        for (int j = 0; j < 16; ++j) {
            o[j] = (float)((int)(qs[j] & 0x0F) - 8) * d;
            o[j + 16] = (float)((int)(qs[j] >> 4) - 8) * d;
        }
    }
}

void dequant_q4_1(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 20;
        float* o = out + b * 32;
        float d = f16_to_f32(load_u16(p));
        float m = f16_to_f32(load_u16(p + 2));
        const uint8_t* qs = p + 4;
        for (int j = 0; j < 16; ++j) {
            o[j] = (float)(qs[j] & 0x0F) * d + m;
            o[j + 16] = (float)(qs[j] >> 4) * d + m;
        }
    }
}

void dequant_q5_0(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 22;
        float* o = out + b * 32;
        float d = f16_to_f32(load_u16(p));
        uint32_t qh;
        std::memcpy(&qh, p + 2, 4);
        const uint8_t* qs = p + 6;
        for (int j = 0; j < 16; ++j) {
            int lo = (qs[j] & 0x0F) | (((qh >> j) & 1) << 4);
            int hi = (qs[j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
            o[j] = (float)(lo - 16) * d;
            o[j + 16] = (float)(hi - 16) * d;
        }
    }
}

void dequant_q5_1(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 24;
        float* o = out + b * 32;
        float d = f16_to_f32(load_u16(p));
        float m = f16_to_f32(load_u16(p + 2));
        uint32_t qh;
        std::memcpy(&qh, p + 4, 4);
        const uint8_t* qs = p + 8;
        for (int j = 0; j < 16; ++j) {
            int lo = (qs[j] & 0x0F) | (((qh >> j) & 1) << 4);
            int hi = (qs[j] >> 4) | (((qh >> (j + 16)) & 1) << 4);
            o[j] = (float)lo * d + m;
            o[j + 16] = (float)hi * d + m;
        }
    }
}

void dequant_q8_0(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 34;
        float* o = out + b * 32;
        float d = f16_to_f32(load_u16(p));
        const int8_t* qs = (const int8_t*)(p + 2);
        for (int j = 0; j < 32; ++j) o[j] = (float)qs[j] * d;
    }
}

// ---- K-quants (256-element super-blocks) -------------------------------------

void dequant_q4_k(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 144;
        float* o = out + b * 256;
        float d = f16_to_f32(load_u16(p));
        float dmin = f16_to_f32(load_u16(p + 2));
        float sc[8], mn[8];
        k4_scale_min(p + 4, sc, mn);
        const uint8_t* qs = p + 16;
        // four 64-element chunks; each uses 32 bytes: lo nibble = sub 2i,
        // hi nibble = sub 2i+1
        for (int c = 0; c < 4; ++c) {
            const uint8_t* q = qs + c * 32;
            float d_lo = d * sc[2 * c], m_lo = dmin * mn[2 * c];
            float d_hi = d * sc[2 * c + 1], m_hi = dmin * mn[2 * c + 1];
            float* o_lo = o + c * 64;
            float* o_hi = o + c * 64 + 32;
            for (int j = 0; j < 32; ++j) {
                o_lo[j] = d_lo * (float)(q[j] & 0x0F) - m_lo;
                o_hi[j] = d_hi * (float)(q[j] >> 4) - m_hi;
            }
        }
    }
}

void dequant_q5_k(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 176;
        float* o = out + b * 256;
        float d = f16_to_f32(load_u16(p));
        float dmin = f16_to_f32(load_u16(p + 2));
        float sc[8], mn[8];
        k4_scale_min(p + 4, sc, mn);
        const uint8_t* qh = p + 16;
        const uint8_t* qs = p + 48;
        for (int e = 0; e < 256; ++e) {
            int grp = e / 32;
            int byte_idx = (e / 64) * 32 + e % 32;
            int nib = ((e % 64) / 32) * 4;
            int hbit = (qh[e % 32] >> (e / 32)) & 1;
            float q = (float)(((qs[byte_idx] >> nib) & 0x0F) + 16 * hbit);
            o[e] = d * sc[grp] * q - dmin * mn[grp];
        }
    }
}

void dequant_q6_k(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 210;
        const uint8_t* ql = p;
        const uint8_t* qh = p + 128;
        const int8_t* scales = (const int8_t*)(p + 192);
        float d = f16_to_f32(load_u16(p + 208));
        float* o = out + b * 256;
        for (int n = 0; n < 2; ++n) {  // two 128-element halves
            for (int quarter = 0; quarter < 4; ++quarter) {
                for (int l = 0; l < 32; ++l) {
                    int ql_idx = n * 64 + l + ((quarter % 2) ? 32 : 0);
                    int ql_shift = (quarter >= 2) ? 4 : 0;
                    int qh_idx = n * 32 + l;
                    int qh_shift = 2 * quarter;
                    int sc_idx = n * 8 + l / 16 + 2 * quarter;
                    int lo = (ql[ql_idx] >> ql_shift) & 0x0F;
                    int hi = (qh[qh_idx] >> qh_shift) & 0x03;
                    int q = (lo | (hi << 4)) - 32;
                    o[n * 128 + quarter * 32 + l] =
                        d * (float)scales[sc_idx] * (float)q;
                }
            }
        }
    }
}

void dequant_q8_k(const uint8_t* in, float* out, int64_t nblocks) {
#pragma omp parallel for schedule(static)
    for (int64_t b = 0; b < nblocks; ++b) {
        const uint8_t* p = in + b * 292;
        float d;
        std::memcpy(&d, p, 4);
        const int8_t* qs = (const int8_t*)(p + 4);
        float* o = out + b * 256;
        for (int j = 0; j < 256; ++j) o[j] = (float)qs[j] * d;
    }
}

// ---- f16/bf16 bulk conversion --------------------------------------------------

void f16_to_f32_buf(const uint8_t* in, float* out, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i)
        out[i] = f16_to_f32(load_u16(in + 2 * i));
}

void bf16_to_f32_buf(const uint8_t* in, float* out, int64_t n) {
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < n; ++i) {
        uint32_t bits = (uint32_t)load_u16(in + 2 * i) << 16;
        std::memcpy(&out[i], &bits, 4);
    }
}

int native_num_threads(void) {
#if defined(_OPENMP)
    return omp_get_max_threads();
#else
    return 1;
#endif
}

}  // extern "C"

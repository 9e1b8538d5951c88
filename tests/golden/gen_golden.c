/* Golden-vector generator: an INDEPENDENT scalar-C implementation of
 * upstream ggml/llama.cpp quantization wire semantics (the GGUF-era
 * formats), written from the published format definitions — NOT a copy of
 * the C# reference (whose q8 paths are buggy, SURVEY §2.3) and sharing no
 * code with the JAX implementation under test.
 *
 * Emits tests/golden/golden.bin: a sequence of sections
 *     u32 name_len | name bytes | u32 payload_len | payload
 * with, per legacy format F in {q4_0, q4_1, q5_0, q5_1, q8_0}:
 *     F.input   — f32[ROWS*K]   deterministic LCG input rows
 *     F.wire    — wire blocks for the quantized rows
 *     F.dequant — f32[ROWS*K]   dequantized wire (f16 scale round-trip)
 * per k-quant F in {q4_k, q6_k} (wire decode only — import-path oracle):
 *     F.wire    — LCG-random wire blocks (valid fields)
 *     F.dequant — f32[ROWS*K]
 * and integer-dot references:
 *     dot_q4_0_q8_0.x / .y — f32[K] activation, f32[ROWS] row dots
 *     dot_q8_0_q8_0.x / .y
 *
 * Build + run (committed fixture; regenerate only if formats change):
 *     gcc -O2 -o /tmp/gen_golden tests/golden/gen_golden.c -lm
 *     (cd /root/repo && /tmp/gen_golden tests/golden/golden.bin)
 */
#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#define ROWS 4
#define K 256
#define QK 32
#define QKK 256

/* ---- IEEE f16 <-> f32 (round to nearest even), no F16C dependency ---- */
static uint16_t f32_to_f16(float f) {
    uint32_t x;
    memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t man = x & 0x7FFFFFu;
    if (((x >> 23) & 0xFF) == 0xFF) return (uint16_t)(sign | 0x7C00u | (man ? 0x200u : 0));
    if (exp >= 0x1F) return (uint16_t)(sign | 0x7C00u); /* overflow -> inf */
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;
        man |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half = man >> shift;
        uint32_t rem = man & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half & 1))) half++;
        return (uint16_t)(sign | half);
    }
    uint32_t half = (uint32_t)(exp << 10) | (man >> 13);
    uint32_t rem = man & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)(sign | half);
}

static float f16_to_f32(uint16_t h) {
    uint32_t sign = (uint32_t)(h & 0x8000u) << 16;
    uint32_t exp = (h >> 10) & 0x1F;
    uint32_t man = h & 0x3FFu;
    uint32_t x;
    float f;
    if (exp == 0) {
        if (man == 0) { x = sign; }
        else {
            /* subnormal: normalize */
            int e = -1;
            uint32_t m = man;
            do { m <<= 1; e++; } while (!(m & 0x400u));
            x = sign | ((uint32_t)(127 - 15 - e) << 23) | ((m & 0x3FFu) << 13);
        }
    } else if (exp == 0x1F) {
        x = sign | 0x7F800000u | (man << 13);
    } else {
        x = sign | ((exp - 15 + 127) << 23) | (man << 13);
    }
    memcpy(&f, &x, 4);
    return f;
}

/* ---- deterministic input (msvc LCG, like the reference's Test3) ------ */
static uint32_t lcg_state = 42;
static float frand(void) {
    lcg_state = lcg_state * 214013u + 2531011u;
    return ((float)((lcg_state >> 16) & 0x7FFF) / 32767.0f - 0.5f) * 4.0f;
}

/* ---- emit helpers ---------------------------------------------------- */
static FILE *out;
static void emit(const char *name, const void *data, size_t nbytes) {
    uint32_t nl = (uint32_t)strlen(name), pb = (uint32_t)nbytes;
    fwrite(&nl, 4, 1, out);
    fwrite(name, 1, nl, out);
    fwrite(&pb, 4, 1, out);
    fwrite(data, 1, nbytes, out);
}

#define MIN(a, b) ((a) < (b) ? (a) : (b))

/* ---- legacy formats: quantize + wire + dequant ----------------------- */

static void do_q4_0(const float *x, uint8_t *wire, float *deq) {
    /* block: f16 d | u8 qs[16]; nibble j = elems j (lo), j+16 (hi) */
    for (int i = 0; i < ROWS * K / QK; i++) {
        const float *b = x + i * QK;
        uint8_t *w = wire + i * 18;
        float amax = 0.0f, maxv = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(b[j]) > amax) { amax = fabsf(b[j]); maxv = b[j]; }
        float d = maxv / -8.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d);
        memcpy(w, &dh, 2);
        float df = f16_to_f32(dh);
        for (int j = 0; j < QK / 2; j++) {
            uint8_t xi0 = MIN(15, (int8_t)(b[j] * id + 8.5f));
            uint8_t xi1 = MIN(15, (int8_t)(b[j + 16] * id + 8.5f));
            w[2 + j] = (uint8_t)(xi0 | (xi1 << 4));
            deq[i * QK + j] = ((int)xi0 - 8) * df;
            deq[i * QK + j + 16] = ((int)xi1 - 8) * df;
        }
    }
}

static void do_q4_1(const float *x, uint8_t *wire, float *deq) {
    for (int i = 0; i < ROWS * K / QK; i++) {
        const float *b = x + i * QK;
        uint8_t *w = wire + i * 20;
        float mn = b[0], mx = b[0];
        for (int j = 1; j < QK; j++) {
            if (b[j] < mn) mn = b[j];
            if (b[j] > mx) mx = b[j];
        }
        float d = (mx - mn) / 15.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
        memcpy(w, &dh, 2);
        memcpy(w + 2, &mh, 2);
        float df = f16_to_f32(dh), mf = f16_to_f32(mh);
        for (int j = 0; j < QK / 2; j++) {
            uint8_t xi0 = MIN(15, (int8_t)((b[j] - mn) * id + 0.5f));
            uint8_t xi1 = MIN(15, (int8_t)((b[j + 16] - mn) * id + 0.5f));
            w[4 + j] = (uint8_t)(xi0 | (xi1 << 4));
            deq[i * QK + j] = (float)xi0 * df + mf;
            deq[i * QK + j + 16] = (float)xi1 * df + mf;
        }
    }
}

static void do_q5_0(const float *x, uint8_t *wire, float *deq) {
    /* block: f16 d | u32 qh | u8 qs[16]; qh bit l = high bit of elem l */
    for (int i = 0; i < ROWS * K / QK; i++) {
        const float *b = x + i * QK;
        uint8_t *w = wire + i * 22;
        float amax = 0.0f, maxv = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(b[j]) > amax) { amax = fabsf(b[j]); maxv = b[j]; }
        float d = maxv / -16.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d);
        memcpy(w, &dh, 2);
        float df = f16_to_f32(dh);
        uint32_t qh = 0;
        for (int j = 0; j < QK / 2; j++) {
            uint8_t xi0 = MIN(31, (int8_t)(b[j] * id + 16.5f));
            uint8_t xi1 = MIN(31, (int8_t)(b[j + 16] * id + 16.5f));
            w[6 + j] = (uint8_t)((xi0 & 0xF) | ((xi1 & 0xF) << 4));
            qh |= (uint32_t)((xi0 & 0x10) >> 4) << j;
            qh |= (uint32_t)((xi1 & 0x10) >> 4) << (j + 16);
            deq[i * QK + j] = ((int)xi0 - 16) * df;
            deq[i * QK + j + 16] = ((int)xi1 - 16) * df;
        }
        memcpy(w + 2, &qh, 4);
    }
}

static void do_q5_1(const float *x, uint8_t *wire, float *deq) {
    for (int i = 0; i < ROWS * K / QK; i++) {
        const float *b = x + i * QK;
        uint8_t *w = wire + i * 24;
        float mn = b[0], mx = b[0];
        for (int j = 1; j < QK; j++) {
            if (b[j] < mn) mn = b[j];
            if (b[j] > mx) mx = b[j];
        }
        float d = (mx - mn) / 31.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d), mh = f32_to_f16(mn);
        memcpy(w, &dh, 2);
        memcpy(w + 2, &mh, 2);
        float df = f16_to_f32(dh), mf = f16_to_f32(mh);
        uint32_t qh = 0;
        for (int j = 0; j < QK / 2; j++) {
            uint8_t xi0 = MIN(31, (int8_t)((b[j] - mn) * id + 0.5f));
            uint8_t xi1 = MIN(31, (int8_t)((b[j + 16] - mn) * id + 0.5f));
            w[8 + j] = (uint8_t)((xi0 & 0xF) | ((xi1 & 0xF) << 4));
            qh |= (uint32_t)((xi0 & 0x10) >> 4) << j;
            qh |= (uint32_t)((xi1 & 0x10) >> 4) << (j + 16);
            deq[i * QK + j] = (float)xi0 * df + mf;
            deq[i * QK + j + 16] = (float)xi1 * df + mf;
        }
        memcpy(w + 4, &qh, 4);
    }
}

static void do_q8_0(const float *x, uint8_t *wire, float *deq) {
    for (int i = 0; i < ROWS * K / QK; i++) {
        const float *b = x + i * QK;
        uint8_t *w = wire + i * 34;
        float amax = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(b[j]) > amax) amax = fabsf(b[j]);
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        uint16_t dh = f32_to_f16(d);
        memcpy(w, &dh, 2);
        float df = f16_to_f32(dh);
        for (int j = 0; j < QK; j++) {
            int8_t q = (int8_t)roundf(b[j] * id);
            ((int8_t *)(w + 2))[j] = q;
            deq[i * QK + j] = (float)q * df;
        }
    }
}

/* ---- k-quants: random valid wire -> dequant (import-path oracle) ----- */

static void do_q4_k(uint8_t *wire, float *deq) {
    /* block: f16 d | f16 dmin | u8 scales[12] (6-bit packed) | u8 qs[128] */
    for (int i = 0; i < ROWS * K / QKK; i++) {
        uint8_t *w = wire + i * 144;
        uint16_t dh = f32_to_f16(frand() * 0.05f);
        uint16_t mh = f32_to_f16(fabsf(frand()) * 0.02f);
        memcpy(w, &dh, 2);
        memcpy(w + 2, &mh, 2);
        for (int j = 0; j < 12; j++) {
            lcg_state = lcg_state * 214013u + 2531011u;
            w[4 + j] = (uint8_t)(lcg_state >> 16);
        }
        for (int j = 0; j < 128; j++) {
            lcg_state = lcg_state * 214013u + 2531011u;
            w[16 + j] = (uint8_t)(lcg_state >> 16);
        }
        float d = f16_to_f32(dh), dmin = f16_to_f32(mh);
        const uint8_t *sc = w + 4;
        const uint8_t *qs = w + 16;
        float *y = deq + i * QKK;
        for (int g = 0; g < 4; g++) { /* 64-elem groups, 2 sub-blocks each */
            for (int half = 0; half < 2; half++) {
                int j = 2 * g + half; /* sub-block 0..7 */
                uint8_t s, m;
                if (j < 4) { s = sc[j] & 63; m = sc[j + 4] & 63; }
                else {
                    s = (uint8_t)((sc[j + 4] & 0xF) | ((sc[j - 4] >> 6) << 4));
                    m = (uint8_t)((sc[j + 4] >> 4) | ((sc[j] >> 6) << 4));
                }
                float dl = d * s, ml = dmin * m;
                for (int l = 0; l < 32; l++) {
                    uint8_t byte = qs[32 * g + l];
                    int q = half ? (byte >> 4) : (byte & 0xF);
                    y[64 * g + 32 * half + l] = dl * q - ml;
                }
            }
        }
    }
}

static void do_q6_k(uint8_t *wire, float *deq) {
    /* block: u8 ql[128] | u8 qh[64] | i8 scales[16] | f16 d */
    for (int i = 0; i < ROWS * K / QKK; i++) {
        uint8_t *w = wire + i * 210;
        for (int j = 0; j < 192; j++) {
            lcg_state = lcg_state * 214013u + 2531011u;
            w[j] = (uint8_t)(lcg_state >> 16);
        }
        for (int j = 0; j < 16; j++) {
            lcg_state = lcg_state * 214013u + 2531011u;
            ((int8_t *)w)[192 + j] = (int8_t)((lcg_state >> 16) & 0x3F) - 32;
        }
        uint16_t dh = f32_to_f16(frand() * 0.05f);
        memcpy(w + 208, &dh, 2);
        float d = f16_to_f32(dh);
        const uint8_t *ql = w, *qh = w + 128;
        const int8_t *sc = (const int8_t *)(w + 192);
        float *y = deq + i * QKK;
        for (int half = 0; half < 2; half++) {
            const uint8_t *qlh = ql + 64 * half;
            const uint8_t *qhh = qh + 32 * half;
            float *yy = y + 128 * half;
            const int8_t *s = sc + 8 * half;
            for (int l = 0; l < 32; l++) {
                int q1 = (int)(qlh[l] & 0xF) | (((qhh[l] >> 0) & 3) << 4);
                int q2 = (int)(qlh[l + 32] & 0xF) | (((qhh[l] >> 2) & 3) << 4);
                int q3 = (int)(qlh[l] >> 4) | (((qhh[l] >> 4) & 3) << 4);
                int q4 = (int)(qlh[l + 32] >> 4) | (((qhh[l] >> 6) & 3) << 4);
                yy[l] = d * s[l / 16] * (q1 - 32);
                yy[l + 32] = d * s[2 + l / 16] * (q2 - 32);
                yy[l + 64] = d * s[4 + l / 16] * (q3 - 32);
                yy[l + 96] = d * s[6 + l / 16] * (q4 - 32);
            }
        }
    }
}

/* ---- integer dots (ggml vec_dot semantics, f32 block accumulation) --- */

static void dot_q4_0_q8_0(const uint8_t *wire_w, const float *xact,
                          float *y) {
    /* activation -> q8_0, then per-block int MAC x (dw*dx) summed in f32 */
    int8_t q8[K];
    float dx[K / QK];
    for (int i = 0; i < K / QK; i++) {
        float amax = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(xact[i * QK + j]) > amax) amax = fabsf(xact[i * QK + j]);
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        dx[i] = f16_to_f32(f32_to_f16(d));
        for (int j = 0; j < QK; j++)
            q8[i * QK + j] = (int8_t)roundf(xact[i * QK + j] * id);
    }
    for (int r = 0; r < ROWS; r++) {
        float sumf = 0.0f;
        for (int i = 0; i < K / QK; i++) {
            const uint8_t *w = wire_w + (r * K / QK + i) * 18;
            uint16_t dh;
            memcpy(&dh, w, 2);
            int sumi = 0;
            for (int j = 0; j < QK / 2; j++) {
                int v0 = (w[2 + j] & 0xF) - 8;
                int v1 = (w[2 + j] >> 4) - 8;
                sumi += v0 * q8[i * QK + j] + v1 * q8[i * QK + j + 16];
            }
            sumf += f16_to_f32(dh) * dx[i] * (float)sumi;
        }
        y[r] = sumf;
    }
}

/* Q8_1 activation quantization: f32 d (no f16 round-trip) plus the stored
 * block-sum correction s = d * Σq (the reference keeps s0/s1 halves whose
 * sum is the same quantity). */
static void quant_q8_1(const float *xact, int8_t *q8, float *dx, float *sx) {
    for (int i = 0; i < K / QK; i++) {
        float amax = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(xact[i * QK + j]) > amax) amax = fabsf(xact[i * QK + j]);
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        dx[i] = d;
        int sum = 0;
        for (int j = 0; j < QK; j++) {
            int v = (int)roundf(xact[i * QK + j] * id);
            q8[i * QK + j] = (int8_t)v;
            sum += v;
        }
        sx[i] = d * (float)sum;
    }
}

static void dot_q4_1_q8_1(const uint8_t *wire_w, const float *xact,
                          float *y) {
    /* per block: d4·d8·Σ(q4·q8) + m4·s8  (q4 unsigned 0..15) */
    int8_t q8[K];
    float dx[K / QK], sx[K / QK];
    quant_q8_1(xact, q8, dx, sx);
    for (int r = 0; r < ROWS; r++) {
        float sumf = 0.0f;
        for (int i = 0; i < K / QK; i++) {
            const uint8_t *w = wire_w + (r * K / QK + i) * 20;
            uint16_t dh, mh;
            memcpy(&dh, w, 2);
            memcpy(&mh, w + 2, 2);
            int sumi = 0;
            for (int j = 0; j < QK / 2; j++) {
                int v0 = w[4 + j] & 0xF;
                int v1 = w[4 + j] >> 4;
                sumi += v0 * q8[i * QK + j] + v1 * q8[i * QK + j + 16];
            }
            sumf += f16_to_f32(dh) * dx[i] * (float)sumi
                    + f16_to_f32(mh) * sx[i];
        }
        y[r] = sumf;
    }
}

static void dot_q5_0_q8_0(const uint8_t *wire_w, const float *xact,
                          float *y) {
    /* per block: d5·d8·Σ((nib|hbit<<4) − 16)·q8, qh bit l = elem l */
    int8_t q8[K];
    float dx[K / QK];
    for (int i = 0; i < K / QK; i++) {
        float amax = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(xact[i * QK + j]) > amax) amax = fabsf(xact[i * QK + j]);
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        dx[i] = f16_to_f32(f32_to_f16(d));
        for (int j = 0; j < QK; j++)
            q8[i * QK + j] = (int8_t)roundf(xact[i * QK + j] * id);
    }
    for (int r = 0; r < ROWS; r++) {
        float sumf = 0.0f;
        for (int i = 0; i < K / QK; i++) {
            const uint8_t *w = wire_w + (r * K / QK + i) * 22;
            uint16_t dh;
            uint32_t qh;
            memcpy(&dh, w, 2);
            memcpy(&qh, w + 2, 4);
            int sumi = 0;
            for (int j = 0; j < QK / 2; j++) {
                int v0 = (int)((w[6 + j] & 0xF) | (((qh >> j) & 1) << 4)) - 16;
                int v1 = (int)((w[6 + j] >> 4)
                               | (((qh >> (j + 16)) & 1) << 4)) - 16;
                sumi += v0 * q8[i * QK + j] + v1 * q8[i * QK + j + 16];
            }
            sumf += f16_to_f32(dh) * dx[i] * (float)sumi;
        }
        y[r] = sumf;
    }
}

static void dot_q5_1_q8_1(const uint8_t *wire_w, const float *xact,
                          float *y) {
    /* per block: d5·d8·Σ(nib|hbit<<4)·q8 + m5·s8 */
    int8_t q8[K];
    float dx[K / QK], sx[K / QK];
    quant_q8_1(xact, q8, dx, sx);
    for (int r = 0; r < ROWS; r++) {
        float sumf = 0.0f;
        for (int i = 0; i < K / QK; i++) {
            const uint8_t *w = wire_w + (r * K / QK + i) * 24;
            uint16_t dh, mh;
            uint32_t qh;
            memcpy(&dh, w, 2);
            memcpy(&mh, w + 2, 2);
            memcpy(&qh, w + 4, 4);
            int sumi = 0;
            for (int j = 0; j < QK / 2; j++) {
                int v0 = (int)((w[8 + j] & 0xF) | (((qh >> j) & 1) << 4));
                int v1 = (int)((w[8 + j] >> 4)
                               | (((qh >> (j + 16)) & 1) << 4));
                sumi += v0 * q8[i * QK + j] + v1 * q8[i * QK + j + 16];
            }
            sumf += f16_to_f32(dh) * dx[i] * (float)sumi
                    + f16_to_f32(mh) * sx[i];
        }
        y[r] = sumf;
    }
}

static void dot_q8_0_q8_0(const uint8_t *wire_w, const float *xact,
                          float *y) {
    int8_t q8[K];
    float dx[K / QK];
    for (int i = 0; i < K / QK; i++) {
        float amax = 0.0f;
        for (int j = 0; j < QK; j++)
            if (fabsf(xact[i * QK + j]) > amax) amax = fabsf(xact[i * QK + j]);
        float d = amax / 127.0f;
        float id = d ? 1.0f / d : 0.0f;
        dx[i] = f16_to_f32(f32_to_f16(d));
        for (int j = 0; j < QK; j++)
            q8[i * QK + j] = (int8_t)roundf(xact[i * QK + j] * id);
    }
    for (int r = 0; r < ROWS; r++) {
        float sumf = 0.0f;
        for (int i = 0; i < K / QK; i++) {
            const uint8_t *w = wire_w + (r * K / QK + i) * 34;
            uint16_t dh;
            memcpy(&dh, w, 2);
            const int8_t *qw = (const int8_t *)(w + 2);
            int sumi = 0;
            for (int j = 0; j < QK; j++)
                sumi += qw[j] * q8[i * QK + j];
            sumf += f16_to_f32(dh) * dx[i] * (float)sumi;
        }
        y[r] = sumf;
    }
}

int main(int argc, char **argv) {
    const char *path = argc > 1 ? argv[1] : "tests/golden/golden.bin";
    out = fopen(path, "wb");
    if (!out) { perror(path); return 1; }

    static float x[ROWS * K], deq[ROWS * K], xact[K], ydot[ROWS];
    static uint8_t wire[ROWS * K / QK * 34];  /* largest: q8_0, 34 B/block */

    /* legacy formats */
    struct {
        const char *name;
        int blk_bytes;
        void (*fn)(const float *, uint8_t *, float *);
    } legacy[] = {
        {"q4_0", 18, do_q4_0}, {"q4_1", 20, do_q4_1},
        {"q5_0", 22, do_q5_0}, {"q5_1", 24, do_q5_1},
        {"q8_0", 34, do_q8_0},
    };
    static uint8_t q4_0_wire[ROWS * K / QK * 18];
    static uint8_t q4_1_wire[ROWS * K / QK * 20];
    static uint8_t q5_0_wire[ROWS * K / QK * 22];
    static uint8_t q5_1_wire[ROWS * K / QK * 24];
    static uint8_t q8_0_wire[ROWS * K / QK * 34];
    char buf[64];
    for (size_t f = 0; f < sizeof(legacy) / sizeof(legacy[0]); f++) {
        for (int i = 0; i < ROWS * K; i++) x[i] = frand();
        int nb = ROWS * K / QK;
        legacy[f].fn(x, wire, deq);
        snprintf(buf, sizeof buf, "%s.input", legacy[f].name);
        emit(buf, x, sizeof x);
        snprintf(buf, sizeof buf, "%s.wire", legacy[f].name);
        emit(buf, wire, (size_t)nb * legacy[f].blk_bytes);
        snprintf(buf, sizeof buf, "%s.dequant", legacy[f].name);
        emit(buf, deq, sizeof deq);
        if (!strcmp(legacy[f].name, "q4_0"))
            memcpy(q4_0_wire, wire, sizeof q4_0_wire);
        if (!strcmp(legacy[f].name, "q4_1"))
            memcpy(q4_1_wire, wire, sizeof q4_1_wire);
        if (!strcmp(legacy[f].name, "q5_0"))
            memcpy(q5_0_wire, wire, sizeof q5_0_wire);
        if (!strcmp(legacy[f].name, "q5_1"))
            memcpy(q5_1_wire, wire, sizeof q5_1_wire);
        if (!strcmp(legacy[f].name, "q8_0"))
            memcpy(q8_0_wire, wire, sizeof q8_0_wire);
    }

    /* k-quants (wire -> dequant only) */
    static uint8_t wk[ROWS * K / QKK * 210];
    do_q4_k(wk, deq);
    emit("q4_k.wire", wk, (size_t)(ROWS * K / QKK) * 144);
    emit("q4_k.dequant", deq, sizeof deq);
    do_q6_k(wk, deq);
    emit("q6_k.wire", wk, (size_t)(ROWS * K / QKK) * 210);
    emit("q6_k.dequant", deq, sizeof deq);

    /* integer dots */
    for (int i = 0; i < K; i++) xact[i] = frand();
    emit("dot.x", xact, sizeof xact);
    dot_q4_0_q8_0(q4_0_wire, xact, ydot);
    emit("dot_q4_0_q8_0.y", ydot, sizeof ydot);
    dot_q8_0_q8_0(q8_0_wire, xact, ydot);
    emit("dot_q8_0_q8_0.y", ydot, sizeof ydot);
    dot_q4_1_q8_1(q4_1_wire, xact, ydot);
    emit("dot_q4_1_q8_1.y", ydot, sizeof ydot);
    dot_q5_0_q8_0(q5_0_wire, xact, ydot);
    emit("dot_q5_0_q8_0.y", ydot, sizeof ydot);
    dot_q5_1_q8_1(q5_1_wire, xact, ydot);
    emit("dot_q5_1_q8_1.y", ydot, sizeof ydot);

    fclose(out);
    fprintf(stderr, "wrote %s\n", path);
    return 0;
}

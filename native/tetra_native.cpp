// Native host-side hot-path service for tetra_tpu.
//
// The control-plane Python is fine at kbit/s per carrier, but at the
// framework's operating point (hundreds to thousands of carriers) the
// byte-oriented crypto keystream generation and bit-serial CRC checks
// become host hot paths; this library provides batch implementations,
// exposed through ctypes (tetra_tpu/crypto/native.py), with the Python
// versions as reference/fallback.
//
// Independent implementation of the published TEA1/2/3 keystream
// generators (same ciphers as reference src/crypto/tea*.c, implemented
// from their specifications as a single table-driven core), TB5 ECK
// derivation, and the TETRA CRC16/FCS32 bit-serial checks.
//
// Build: see native/Makefile (g++ -O2 -shared -fPIC).

#include <cstdint>
#include <cstring>

namespace {

struct TeaParams {
    const uint8_t *sbox;
    const uint16_t *lutA;
    const uint16_t *lutB;
    uint32_t iv_xor;
    int warmup;
    int variant;  // 1, 2, 3
};

#include "tea_tables.inc"

inline uint8_t rotr8(uint8_t b) { return (uint8_t)((b >> 1) | (b << 7)); }

inline uint8_t word_newbyte(uint16_t w, const uint16_t *lut, int variant)
{
    uint8_t st0 = (uint8_t)w, st1 = (uint8_t)(w >> 8), out = 0;
    for (int i = 0; i < 8; i++) {
        uint8_t dist;
        switch (variant) {
        case 1:
            dist = (uint8_t)(((st0 >> 7) & 1) | ((st0 << 1) & 2) | ((st1 << 1) & 12));
            break;
        case 2:
            dist = (uint8_t)(((st0 >> 1) & 1) | ((st0 >> 1) & 2) |
                             ((st1 >> 5) & 4) | ((st1 << 3) & 8));
            break;
        default:
            dist = (uint8_t)(((st0 >> 5) & 3) | ((st1 >> 3) & 12));
            break;
        }
        if (lut[i] & (1u << dist))
            out = (uint8_t)(out | (1u << i));
        st0 = rotr8(st0);
        st1 = rotr8(st1);
    }
    return out;
}

inline uint8_t reorder_byte(uint8_t b, int variant)
{
    uint8_t o = 0;
    switch (variant) {
    case 1:
        o |= (uint8_t)((b << 6) & 0x40); o |= (uint8_t)((b << 1) & 0x20);
        o |= (uint8_t)((b << 2) & 0x08); o |= (uint8_t)((b >> 3) & 0x14);
        o |= (uint8_t)((b >> 2) & 0x01); o |= (uint8_t)((b >> 5) & 0x02);
        o |= (uint8_t)((b << 4) & 0x80);
        break;
    case 2:
        o |= (uint8_t)((b << 6) & 0x40); o |= (uint8_t)((b << 3) & 0x10);
        o |= (uint8_t)((b >> 2) & 0x01); o |= (uint8_t)((b << 2) & 0x20);
        o |= (uint8_t)((b << 3) & 0x80); o |= (uint8_t)((b >> 4) & 0x02);
        o |= (uint8_t)((b >> 3) & 0x08); o |= (uint8_t)((b >> 5) & 0x04);
        break;
    default:
        o |= (uint8_t)((b << 6) & 0x40); o |= (uint8_t)((b << 1) & 0x20);
        o |= (uint8_t)((b << 2) & 0x98); o |= (uint8_t)((b >> 4) & 0x04);
        o |= (uint8_t)((b >> 3) & 0x01); o |= (uint8_t)((b >> 6) & 0x02);
        break;
    }
    return o;
}

inline uint64_t iv_expand(uint32_t iv, uint32_t k)
{
    uint32_t x = iv ^ k;
    x = (x << 8) | (x >> 24);
    uint64_t q = ((uint64_t)iv << 32) | x;
    return (q >> 8) | (q << 56);
}

// Precomputed round tables: word_newbyte is a pure function of a
// 16-bit state word (per variant and A/B LUT), and reorder_byte of one
// byte — tabulating them (2 x 64K + 256 entries per KSG, ~390 KB
// total, L2-resident) turns the 8-iteration bit loops inside every
// round into single loads, ~10x on the keystream hot path.
struct TeaLuts {
    uint8_t nbA[65536];
    uint8_t nbB[65536];
    uint8_t re[256];
};

const TeaParams &params_for(int ksg);

const TeaLuts &luts_for(int ksg)
{
    static TeaLuts L[3];
    static bool done[3] = {false, false, false};
    int k = (ksg >= 1 && ksg <= 3) ? ksg - 1 : 2;
    if (!done[k]) {
        const TeaParams &P = params_for(k + 1);
        for (int w = 0; w < 65536; w++) {
            L[k].nbA[w] = word_newbyte((uint16_t)w, P.lutA, P.variant);
            L[k].nbB[w] = word_newbyte((uint16_t)w, P.lutB, P.variant);
        }
        for (int b = 0; b < 256; b++)
            L[k].re[b] = reorder_byte((uint8_t)b, P.variant);
        done[k] = true;
    }
    return L[k];
}

void tea_stream(const TeaParams &P, uint32_t iv, const uint8_t *eck,
                int nbytes, uint8_t *out)
{
    const TeaLuts &L = luts_for(P.variant);
    uint64_t st = iv_expand(iv, P.iv_xor);
    uint32_t kr32 = 0;
    uint8_t kreg[10];
    if (P.variant == 1) {
        for (int i = 0; i < 10; i++)
            kr32 = (kr32 << 8) | P.sbox[((kr32 >> 24) ^ eck[i] ^ kr32) & 0xff];
    } else {
        std::memcpy(kreg, eck, 10);
    }
    int skip = P.warmup;
    for (int i = 0; i < nbytes; i++) {
        for (int j = 0; j < skip; j++) {
            uint8_t fb;
            if (P.variant == 1) {
                fb = P.sbox[((kr32 >> 24) ^ kr32) & 0xff];
                kr32 = (kr32 << 8) | fb;
            } else {
                fb = (P.variant == 2)
                    ? P.sbox[kreg[0] ^ kreg[7]]
                    : (uint8_t)(P.sbox[kreg[7] ^ kreg[2]] ^ kreg[0]);
                std::memmove(kreg, kreg + 1, 9);
                kreg[9] = fb;
            }
            uint8_t nb, mix;
            if (P.variant == 1) {
                uint8_t dA = L.nbA[(uint16_t)(st >> 8)];
                uint8_t dB = L.nbB[(uint16_t)(st >> 40)];
                uint8_t r = L.re[(uint8_t)(st >> 32)];
                nb = (uint8_t)(dB ^ (uint8_t)(st >> 56) ^ r ^ fb);
                mix = dA;
                st = ((st << 8) ^ ((uint64_t)mix << 32)) | nb;
            } else if (P.variant == 2) {
                uint8_t dA = L.nbA[(uint16_t)st];
                uint8_t dB = L.nbB[(uint16_t)(st >> 24)];
                uint8_t r = L.re[(uint8_t)(st >> 40)];
                nb = (uint8_t)((uint8_t)(st >> 56) ^ (uint8_t)(st >> 16) ^ r ^ dA ^ fb);
                mix = dB;
                st = ((st << 8) ^ ((uint64_t)mix << 24)) | nb;
            } else {
                uint8_t dA = L.nbA[(uint16_t)(st >> 8)];
                uint8_t dB = L.nbB[(uint16_t)(st >> 40)];
                uint8_t r = L.re[(uint8_t)(st >> 32)];
                nb = (uint8_t)((uint8_t)(st >> 56) ^ r ^ dA ^ fb);
                mix = dB;
                st = ((st << 8) ^ ((uint64_t)mix << 40)) | nb;
            }
        }
        out[i] = (uint8_t)(st >> 56);
        skip = 19;
    }
}

const TeaParams &params_for(int ksg)
{
    static const TeaParams p1 = {kTea1Sbox, kTea1LutA, kTea1LutB, 0x96724FA1u, 54, 1};
    static const TeaParams p2 = {kTea2Sbox, kTea2LutA, kTea2LutB, 0x5A6E3278u, 51, 2};
    static const TeaParams p3 = {kTea3Sbox, kTea3LutA, kTea3LutB, 0xC43A7D51u, 51, 3};
    switch (ksg) {
    case 1: return p1;
    case 2: return p2;
    default: return p3;
    }
}

}  // namespace

extern "C" {

// Batch keystream generation: n independent (iv, eck) pairs, nbytes each.
// ecks: n x 10 bytes; out: n x nbytes.
void tetra_tea_keystream_batch(int ksg, const uint32_t *ivs,
                               const uint8_t *ecks, int n, int nbytes,
                               uint8_t *out)
{
    const TeaParams &P = params_for(ksg);
    for (int i = 0; i < n; i++)
        tea_stream(P, ivs[i], ecks + 10 * i, nbytes, out + (size_t)nbytes * i);
}

// TB5 ECK derivation: overlay [la:14 cn:12 cc:6 cn:12 cc:6 cn:12 cc:6 cn:12]
// over the 80-bit CK (EN 300 392-7).
void tetra_tb5(uint32_t cn, uint32_t la, uint32_t cc, const uint8_t *ck,
               uint8_t *eck)
{
    uint16_t w0 = (uint16_t)((ck[0] << 8) | ck[1]);
    uint32_t w1 = ((uint32_t)ck[2] << 24) | ((uint32_t)ck[3] << 16)
                | ((uint32_t)ck[4] << 8) | ck[5];
    uint32_t w2 = ((uint32_t)ck[6] << 24) | ((uint32_t)ck[7] << 16)
                | ((uint32_t)ck[8] << 8) | ck[9];
    uint16_t m0 = (uint16_t)(((la & 0x3FFF) << 2) | ((cn & 0xFFF) >> 10));
    uint32_t m1 = ((cn & 0xFFF) << 22) | ((cc & 0x3F) << 16)
                | ((cn & 0xFFF) << 4) | ((cc & 0x3F) >> 2);
    uint32_t m2 = ((cc & 0x3F) << 30) | ((cn & 0xFFF) << 18)
                | ((cc & 0x3F) << 12) | (cn & 0xFFF);
    w0 = (uint16_t)(w0 ^ m0); w1 ^= m1; w2 ^= m2;
    eck[0] = (uint8_t)(w0 >> 8); eck[1] = (uint8_t)w0;
    eck[2] = (uint8_t)(w1 >> 24); eck[3] = (uint8_t)(w1 >> 16);
    eck[4] = (uint8_t)(w1 >> 8); eck[5] = (uint8_t)w1;
    eck[6] = (uint8_t)(w2 >> 24); eck[7] = (uint8_t)(w2 >> 16);
    eck[8] = (uint8_t)(w2 >> 8); eck[9] = (uint8_t)w2;
}

// Bit-serial CRC16-CCITT over unpacked bits (one bit per byte), init
// 0xFFFF, poly 0x1021; batch of n rows of len bits each.
void tetra_crc16_batch(const uint8_t *bits, int n, int len, uint16_t *out)
{
    for (int i = 0; i < n; i++) {
        const uint8_t *row = bits + (size_t)len * i;
        uint16_t crc = 0xFFFF;
        for (int j = 0; j < len; j++) {
            crc = (uint16_t)(crc ^ ((row[j] & 1u) << 15));
            crc = (crc & 0x8000) ? (uint16_t)((crc << 1) ^ 0x1021)
                                 : (uint16_t)(crc << 1);
        }
        out[i] = crc;
    }
}

// FCS-32 over unpacked bits with the TETRA short-frame shift.
void tetra_fcs32_batch(const uint8_t *bits, int n, int len, uint32_t *out)
{
    for (int i = 0; i < n; i++) {
        const uint8_t *row = bits + (size_t)len * i;
        uint32_t crc = 0xFFFFFFFFu;
        if (len < 32)
            crc <<= (32 - len);
        for (int j = 0; j < len; j++) {
            uint32_t bit = (row[j] ^ (crc >> 31)) & 1u;
            crc <<= 1;
            if (bit)
                crc ^= 0x04C11DB7u;
        }
        out[i] = ~crc;
    }
}

}  // extern "C"

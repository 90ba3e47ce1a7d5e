// Native control-plane executor: the upper-MAC / LLC / MLE hot slot
// loop as batch C++ (reference semantics: src/tetra_upper_mac.c:457-547,
// src/tetra_llc.c:111-179, src/tetra_mle.c:20-53 — behaviour mirrored
// from the Python implementation in tetra_tpu/umac/upper_mac.py, which
// stays the semantics reference; differential-tested against it in
// tests/test_native_umac.py).
//
// The Python control plane costs ~100 us/slot (fine per carrier, a
// bottleneck at thousands of carriers x 70.6 slots/s); this executor
// consumes batched device-decoded type-1 bit records and emits compact
// structured events instead of log strings. Decryption runs on this
// hot path like the reference's (src/tetra_crypto.c:211-252): load a
// keystore with tetra_umac_set_keys and encrypted MAC elements are
// decrypted in place — per-carrier crypto state (cc/mcc/mnc from SYNC,
// la/cn/cck-id/hn from SYSINFO), TB5 ECK derivation and the batch TEA
// keystream core from tetra_native.cpp (same shared object).

#include <cstdint>
#include <cstring>
#include <vector>

// TEA keystream + TB5 ECK derivation (native/tetra_native.cpp)
extern "C" void tetra_tea_keystream_batch(int ksg, const uint32_t *ivs,
                                          const uint8_t *ecks, int n,
                                          int nbytes, uint8_t *out);
extern "C" void tetra_tb5(uint32_t cn, uint32_t la, uint32_t cc,
                          const uint8_t *ck, uint8_t *eck);

namespace {

// ---- event kinds (mirrored in tetra_tpu/umac/native_exec.py) ----
enum EvKind {
    EV_TMV = 0,          // a=lchan b=crc_ok c=pdu_type
    EV_AACH = 1,         // a=hdr b=dl_usage c=ul_usage d=acc fields
    EV_SYSINFO = 2,      // a=main_carrier b=band*16+offset c=cck/hn d=(la<<12)|bsd
    EV_RESOURCE = 3,     // a=addr_type b=addr value c=macpdu_length d=(l2len<<1)|enc
    EV_FRAG_START = 4,   // a=slot b=len
    EV_FRAG_CONT = 5,    // a=slot b=added
    EV_FRAG_END = 6,     // a=slot b=added c=total
    EV_FRAG_AGEOUT = 7,  // a=slot
    EV_FRAG_NOSTART = 8, // a=slot b=length_bits
    EV_FRAG_ACTIVE = 9,  // a=slot (WARNING: still active)
    EV_SUPPL = 10,       // a=sdu_len
    EV_TMSDU = 11,       // a=dec type b=(ns<<8)|ss c=fcs(0 none/1 ok/2 bad) d=len
    EV_TLSDU = 12,       // a=pdisc b=pdut(-1 unknown) c=len
    EV_STRANGE_PDU = 13, // a=pdu_type
    EV_STRANGE_LCHAN = 14, // a=lchan
    EV_MISS = 15,        // a=last_ss b=ss
    EV_TMSDU_RUNT = 16,  // a=length
    EV_TRAFFIC = 17,     // a=slot_ref b=1 when NDB half-slot c=usage
    EV_CRC = 18,         // a=block (0 SB1/1 SB2/2 SCHF/3 NDB) b=crc_ok
    EV_GSMTAP = 19,      // a=row b=lchan c=(blk<<20)|(tn<<16)|(fn<<8)|mn
                         // d=bit offset into the block (opt-in via
                         // tetra_umac_set_gsmtap; the host packetises)
};

// logical channels (tetra_tpu/umac/upper_mac.py LogicalChannel)
enum { LCH_UNKNOWN = 0, LCH_SCH_F = 1, LCH_SCH_HD = 2, LCH_AACH = 8,
       LCH_BSCH = 10, LCH_BNCH = 11 };

enum { MACPDU_RESOURCE = 0, MACPDU_FRAG_END = 1, MACPDU_BCAST = 2,
       MACPDU_SUPPL = 3 };
constexpr int LEN_2ND_STOLEN = -2, LEN_START_FRAG = -1;
constexpr int N203 = 6, NR_FRAGSLOTS = 5;

// decoded LLC pdu kinds (llc_pdu.py LlcPduDec)
enum {
    DEC_UNKNOWN = 0, DEC_BL_ADATA = 1, DEC_BL_DATA = 2, DEC_BL_UDATA = 3,
    DEC_BL_ACK = 4, DEC_AL_SETUP = 5, DEC_AL_DATA = 6, DEC_AL_FINAL = 7,
    DEC_AL_UDATA = 8, DEC_AL_UFINAL = 9, DEC_AL_ACK = 10, DEC_AL_RNR = 11,
    DEC_AL_RECONNECT = 12, DEC_AL_DISC = 13,
};

struct Bits {  // a view of unpacked bits (1 byte per bit)
    const uint8_t *p;
    int64_t n;
    int bit(int64_t i) const { return (i >= 0 && i < n) ? (p[i] & 1) : 0; }
    // numpy-slice semantics: bits[pos:pos+w] clamps, value over the
    // bits actually present (matches utils.bits.bits_to_uint on a
    // short slice)
    int64_t u(int64_t pos, int w) const {
        if (pos < 0) pos = 0;
        int64_t end = pos + w;
        if (end > n) end = n;
        int64_t v = 0;
        for (int64_t i = pos; i < end; i++) v = (v << 1) | (p[i] & 1);
        return v;
    }
    Bits slice(int64_t a, int64_t b) const {  // [a:b] with clamping
        if (a < 0) a = 0;
        if (b > n) b = n;
        if (b < a) b = a;
        return Bits{p + a, b - a};
    }
};

// fill bits end at the last '1'; index 0 never checked (upper_mac.py
// _num_fill_bits, reference tetra_upper_mac.c:75-84)
int num_fill_bits(const Bits &b) {
    for (int64_t i = 1; i < b.n; i++)
        if (b.p[b.n - i] & 1) return (int)i;
    return 0;
}

int decode_length(int li) {  // mac_pdu.py _decode_length
    if (li == 0 || li == 0x3B || li == 0x3C) return -22;
    if (li <= 0x12) return li;
    if (li <= 0x3A) return 18 + (li - 18);
    if (li == 0x3E) return LEN_2ND_STOLEN;
    if (li == 0x3F) return LEN_START_FRAG;
    return -22;
}

int decode_nr_slots(int v) {
    static const int tbl[16] = {0, 1, 2, 3, 4, 5, 6, 8,
                                10, 13, 17, 24, 34, 51, 68, 0xFF};
    return tbl[v & 0xF];
}

// channel-allocation element; returns bit length consumed
int decode_chan_alloc(const Bits &b) {
    int64_t pos = 0;
    pos += 2 + 4;                      // type, timeslot
    int ul_dl = (int)b.u(pos, 2); pos += 2;
    pos += 1 + 1 + 12;                 // clch_perm, cell_chg, carrier_nr
    int ext = (int)b.u(pos, 1); pos += 1;
    if (ext) pos += 4 + 2 + 3 + 1;
    int monit = (int)b.u(pos, 2); pos += 2;
    if (monit == 0) pos += 2;
    if (ul_dl == 0) {                  // augmented (QAM) allocation
        pos += 2 + 3 + 3 + 3;          // ul_dl_ass, bw, mod, max_ul_qam
        pos += 3;                      // skip
        pos += 3 + 4 + 5;              // conf_chan_stat, imbalance, tx_rel
        int nap = (int)b.u(pos, 2); pos += 2;
        if (nap == 1) pos += 11;
        pos += 4;
        if (b.u(pos, 1)) { pos += 1 + 16; } else pos += 1;
        if (b.u(pos, 1)) { pos += 1 + 16; } else pos += 1;
        pos += 1;
    }
    return (int)pos;
}

struct ResourceHdr {
    int fill_bits, encryption_mode, is_encrypted, macpdu_length;
    int addr_type;
    int64_t addr_value;  // packed like native_exec.py normalizer
    int slot_granting_pres, chan_alloc_pres;
    int bit_len;         // TM-SDU offset (0 for null PDU)
};

ResourceHdr decode_resource(const Bits &b) {
    ResourceHdr r{};
    int64_t pos = 2;
    r.fill_bits = b.bit(pos); pos += 1;
    pos += 1;                               // grant position
    r.encryption_mode = (int)b.u(pos, 2); pos += 2;
    r.is_encrypted = r.encryption_mode > 0 ? 1 : 0;
    pos += 1;                               // random access flag
    r.macpdu_length = decode_length((int)b.u(pos, 6)); pos += 6;
    r.addr_type = (int)b.u(pos, 3); pos += 3;
    int64_t base = pos;
    static const int addr_len[8] = {0, 24, 10, 24, 24, 34, 30, 34};
    switch (r.addr_type) {
    case 0: r.bit_len = 0; return r;        // null PDU
    case 1: case 3: case 4:                 // SSI / USSI / SMI
        r.addr_value = b.u(base, 24); break;
    case 2:                                 // event label
        r.addr_value = b.u(base, 10); break;
    case 5: case 7:                         // SSI + event label
        r.addr_value = (b.u(base, 24) << 10) | b.u(base + 24, 10); break;
    case 6:                                 // SSI + usage marker
        r.addr_value = (b.u(base, 24) << 6) | b.u(base + 24, 6); break;
    }
    pos += addr_len[r.addr_type];
    int power = b.bit(pos); pos += 1;
    if (power) pos += 4;
    r.slot_granting_pres = b.bit(pos); pos += 1;
    if (r.slot_granting_pres) { decode_nr_slots((int)b.u(pos, 4)); pos += 8; }
    r.chan_alloc_pres = b.bit(pos); pos += 1;
    if (r.chan_alloc_pres && !r.is_encrypted)
        pos += decode_chan_alloc(b.slice(pos, b.n));
    r.bit_len = (int)pos;
    return r;
}

uint32_t fcs32(const Bits &b) {  // ops/crc.py fcs32_np semantics
    uint32_t crc = 0xFFFFFFFFu;
    if (b.n < 32) crc <<= (32 - b.n);
    for (int64_t j = 0; j < b.n; j++) {
        uint32_t bit = (b.p[j] ^ (crc >> 31)) & 1u;
        crc <<= 1;
        if (bit) crc ^= 0x04C11DB7u;
    }
    return ~crc;
}

struct Frag {
    bool active = false;
    int age = 0, num = 0, length = 0;
    bool enc = false;
    int key_idx = -1;  // keystore index captured at FRAG-START
    std::vector<uint8_t> bits;
};

struct Defrag {
    bool present = false;
    int last_ss = 0;
    std::vector<uint8_t> bits;
};

struct Carrier {
    Frag frags[NR_FRAGSLOTS];
    Defrag defrag[256];
    int is_traffic = 0;
    bool blk1_stolen = false, blk2_stolen = false;
    // TDMA clock + cell identity, owned by the walk2 entry point
    // (reference tetra_burst_sync.c:113 clock advance +
    // tetra_lower_mac.c:283-310 SYNC side effects). Counters start at
    // the reference's talloc_zero'd invalid 0s (tetra-rx.c:49).
    int tn = 0, fn = 0, mn = 0;
    int colour = 0, mcc = 0, mnc = 0;
    // crypto state (crypto/crypto.py CryptoState, reference
    // tetra_crypto.h:94-104): cc/mcc/mnc track SYNC, la/cn/cck_id/hn
    // track SYSINFO; net_idx/cck_idx cache the keystore resolution
    int c_mcc = -1, c_mnc = -1, cck_id = -1, hn = -1;
    // cn starts at 0 like the python plane (the reference init skips
    // cn, leaving the zeroed allocation, tetra_crypto.c:92-106) — so
    // both planes' TB5 gating agrees in the pre-SYSINFO window
    int la = -1, cn = 0, cc = -1;
    int net_idx = -1, cck_idx = -1;
    // keystream cache: consecutive MAC elements of one slot (and the
    // slot's voice halves) share (iv, key, ECK inputs); the reference
    // regenerates the stream per element (tetra_crypto.c:211-252) —
    // reusing the identical bytes is bit-exact and skips the KSG
    uint32_t ks_iv = 0;
    int ks_key = -1, ks_cn = -1, ks_la = -1, ks_cc = -1, ks_bytes_n = 0;
    uint8_t ks_bytes[96];   // >= ceil((216 skip + 484) / 8)
};

struct NetRec { int mcc, mnc, ksg_type, security_class; };
struct KeyRec {
    int mcc, mnc, key_type, key_num;
    int ksg_type;        // from the key's own network entry (load-time)
    uint8_t key[10];
};

// one TDMA slot advance, replicating tetra_tpu/tdma.py add_tn(1)
// normalisation exactly (incl. its start-from-zero behaviour)
inline void tdma_add_tn1(Carrier &c) {
    c.tn += 1;
    if (c.tn > 4) { c.fn += c.tn / 4; c.tn %= 4; }
    if (c.fn > 18) { c.mn += c.fn / 18; c.fn %= 18; }
    if (c.mn > 60) c.mn %= 60;
}

struct Ctx {
    std::vector<Carrier> carriers;
    std::vector<NetRec> nets;
    std::vector<KeyRec> keys;
    // event output (set per process call)
    int32_t *ev_car, *ev_kind;
    int64_t *ev_a, *ev_b, *ev_c, *ev_d;
    int64_t ev_max, ev_n, overflow;
    int cur_carrier;
    int cur_slot_tn;
    // current dispatch context for decryption (TmvUnitdata fields)
    int cur_tn = 0, cur_fn = 0, cur_mn = 0;
    int cur_blk_num = 0, cur_lchan = 0;
    // GSMTAP export (reference tetra_upper_mac.c:483-488 hook): when
    // enabled, every CRC-OK TMV dispatch emits an EV_GSMTAP event the
    // host turns into a UDP packet; cur_row locates the block's bits
    // in the caller's packed rows (walk2 only)
    int gsmtap = 0;
    int cur_row = -1;

    void emit(int kind, int64_t a = 0, int64_t b = 0, int64_t c = 0,
              int64_t d = 0) {
        if (ev_n >= ev_max) { overflow = 1; return; }
        ev_car[ev_n] = cur_carrier;
        ev_kind[ev_n] = kind;
        ev_a[ev_n] = a; ev_b[ev_n] = b; ev_c[ev_n] = c; ev_d[ev_n] = d;
        ev_n++;
    }

    // TL-SDU payload arena (walk2 only): reassembled payload ubits are
    // copied here so the host can egress actual bytes (TUN writes for
    // SNDCP IP, SDS sinks) instead of only lengths — the reference
    // writes IP payloads from its one plane (tetra_llc.c:93-101); this
    // gives the scale plane the same capability.
    uint8_t *pay = nullptr;
    int64_t pay_max = 0, pay_n = 0, pay_overflow = 0;

    int64_t pay_put(const Bits &b) {  // arena offset, or -1 (disabled/full)
        if (!pay || pay_n + b.n > pay_max) {
            if (pay) pay_overflow = 1;
            return -1;
        }
        std::memcpy(pay + pay_n, b.p, (size_t)b.n);
        int64_t off = pay_n;
        pay_n += b.n;
        return off;
    }
};

// ---- crypto state (crypto/crypto.py, reference tetra_crypto.c) ----

void update_current_cck(Ctx &cx, Carrier &car) {
    // tetra_crypto.c:438-452 / CryptoState.update_current_cck
    car.cck_idx = -1;
    for (size_t i = 0; i < cx.keys.size(); i++) {
        const KeyRec &k = cx.keys[i];
        if (k.mcc == car.c_mcc && k.mnc == car.c_mnc
            && k.key_num == car.cck_id && k.key_type == 1 /* CCK_SCK */) {
            car.cck_idx = (int)i;
            break;
        }
    }
}

void update_current_network(Ctx &cx, Carrier &car, int mcc, int mnc) {
    // tetra_crypto.c:416-436 / CryptoState.update_current_network
    car.c_mcc = mcc; car.c_mnc = mnc;
    car.net_idx = -1;
    for (size_t i = 0; i < cx.nets.size(); i++)
        if (cx.nets[i].mcc == mcc && cx.nets[i].mnc == mnc) {
            car.net_idx = (int)i;
            break;
        }
    update_current_cck(cx, car);
}

// get_ksg_key (tetra_crypto.c:395-414): current CCK iff a network
// entry matched; -1 otherwise
int get_ksg_key(const Carrier &car) {
    return car.net_idx >= 0 ? car.cck_idx : -1;
}

// Keystream ubits for the current slot time (tetra_crypto.c:158-203 /
// crypto.py generate_keystream). Returns false when crypto state is
// incomplete or the KSG is unsupported — the element stays encrypted,
// exactly like the Python plane.
bool gen_keystream(Ctx &cx, Carrier &car, int key_idx, int nbits,
                   uint8_t *out_bits) {
    if (key_idx < 0 || key_idx >= (int)cx.keys.size()) return false;
    if (car.cn < 0 || car.la < 0 || car.cc < 0) return false;
    int tn = cx.cur_tn, fn = cx.cur_fn, mn = cx.cur_mn;
    if (tn < 1 || tn > 4 || fn < 1 || fn > 18 || mn < 1 || mn > 60)
        return false;  // Python asserts these; guard instead of abort
    const KeyRec &k = cx.keys[key_idx];
    int ksg = k.ksg_type;
    if (ksg < 1 || ksg > 3) return false;  // TEA1/2/3 only
    uint32_t iv = (uint32_t)((tn - 1) | (fn << 2) | (mn << 7)
                             | ((car.hn & 0x7FFF) << 13));
    int nbytes = (nbits + 7) / 8;
    if (nbytes > (int)sizeof(car.ks_bytes)) return false;
    if (!(car.ks_key == key_idx && car.ks_iv == iv
          && car.ks_cn == car.cn && car.ks_la == car.la
          && car.ks_cc == car.cc && car.ks_bytes_n >= nbytes)) {
        uint8_t eck[10];
        tetra_tb5((uint32_t)(car.cn & 0xFFF), (uint32_t)(car.la & 0x3FFF),
                  (uint32_t)(car.cc & 0x3F), k.key, eck);
        tetra_tea_keystream_batch(ksg, &iv, eck, 1, nbytes, car.ks_bytes);
        car.ks_iv = iv; car.ks_key = key_idx;
        car.ks_cn = car.cn; car.ks_la = car.la; car.ks_cc = car.cc;
        car.ks_bytes_n = nbytes;
    }
    for (int i = 0; i < nbits; i++)
        out_bits[i] = (car.ks_bytes[i >> 3] >> (7 - (i & 7))) & 1;
    return true;
}

// XOR-decrypt a MAC element in place (tetra_crypto.c:211-252 /
// crypto.py decrypt_mac_element, incl. the 216-bit keystream skip for
// second-half-slot blocks)
bool decrypt_elem(Ctx &cx, Carrier &car, int key_idx, uint8_t *bits,
                  int64_t n, int64_t tmpdu_offset, bool second_half) {
    int64_t ct_len = n - tmpdu_offset;
    if (key_idx < 0 || ct_len <= 0) return false;
    int skip = second_half ? 216 : 0;
    uint8_t ks[704];
    if (skip + ct_len > (int64_t)sizeof(ks)) return false;
    if (!gen_keystream(cx, car, key_idx, skip + (int)ct_len, ks))
        return false;
    for (int64_t i = 0; i < ct_len; i++)
        bits[tmpdu_offset + i] ^= ks[skip + i];
    return true;
}

// ---- LLC / MLE ----

// d encodes the payload arena ref: -1 when no arena (or full), else
// (arena_bit_offset << 1) | from_defrag — from_defrag marks TL-SDUs
// reassembled by the advanced-link defragmenter, the only ones the
// reference writes to TUN (tetra_llc.c:81-107)
void rx_tl_sdu(Ctx &cx, const Bits &sdu, bool from_defrag = false) {
    int pdisc = (int)sdu.u(0, 3);
    int64_t pdut = -1;
    if (pdisc == 1) pdut = sdu.u(3, 4);        // MM
    else if (pdisc == 2) pdut = sdu.u(3, 5);   // CMCE
    else if (pdisc == 4) pdut = sdu.u(3, 4);   // SNDCP
    else if (pdisc == 5) pdut = sdu.u(3, 3);   // MLE
    int64_t off = cx.pay_put(sdu);
    // no arena (process/walk entries): keep the legacy d=0; arena
    // present: d = (offset << 1) | from_defrag, or -1 when full
    cx.emit(EV_TLSDU, pdisc, pdut, sdu.n,
            cx.pay == nullptr ? 0
            : off < 0 ? -1 : ((off << 1) | (from_defrag ? 1 : 0)));
}

void defrag_out(Ctx &cx, Carrier &car, int ns) {
    Defrag &d = car.defrag[ns & 0xFF];
    if (!d.present) return;
    Bits full{d.bits.data(), (int64_t)d.bits.size()};
    rx_tl_sdu(cx, full, true);
    d.present = false;
    d.last_ss = 0;
    d.bits.clear();
}

void rx_tm_sdu(Ctx &cx, Carrier &car, const Bits &in, int64_t length) {
    if (!length) return;
    if (length < 4) { cx.emit(EV_TMSDU_RUNT, length); return; }
    Bits b = in.slice(0, length);
    int64_t n = b.n;
    int pt = (int)b.u(0, 4);
    int64_t pos = 4;
    static const int min_len[16] = {6, 5, 4, 5, 38, 37, 36, 37,
                                    0, 13, 17, 1, 0, 0, 0, 0};
    int dec = DEC_UNKNOWN;
    int64_t ns = 0, ss = 0, sdu_off = 0, sdu_len = 0;
    int fcs_state = 0;  // 0 none, 1 ok, 2 bad
    if (n < min_len[pt]) {
        cx.emit(EV_TMSDU, DEC_UNKNOWN, 0, 0, 0);
        return;
    }
    auto fcs_tail = [&](int64_t payload_start) {
        sdu_len -= 32;
        int64_t want = b.u(n - 32, 32);
        uint32_t got = fcs32(b.slice(payload_start, payload_start + sdu_len));
        fcs_state = (got == (uint32_t)want) ? 1 : 2;
    };
    switch (pt) {
    case 0: case 4:  // BL-ADATA: N(R) then N(S)
        pos += 1;
        ns = b.bit(pos); pos += 1;
        sdu_off = pos; sdu_len = n - pos; dec = DEC_BL_ADATA;
        if (pt == 4) fcs_tail(pos);
        break;
    case 1: case 5:  // BL-DATA
        ns = b.bit(pos); pos += 1;
        sdu_off = pos; sdu_len = n - pos; dec = DEC_BL_DATA;
        if (pt == 5) fcs_tail(pos);
        break;
    case 2: case 6:  // BL-UDATA
        sdu_off = pos; sdu_len = n - pos; dec = DEC_BL_UDATA;
        if (pt == 6) fcs_tail(pos);
        break;
    case 3: case 7:  // BL-ACK
        pos += 1;
        sdu_off = pos; sdu_len = n - pos; dec = DEC_BL_ACK;
        if (pt == 7) fcs_tail(pos);
        break;
    case 8: dec = DEC_AL_SETUP; sdu_off = pos; sdu_len = 0; break;
    case 9: {        // AL-DATA/FINAL
        int final = b.bit(pos); pos += 1;
        pos += 1;
        ns = b.u(pos, 3); pos += 3;
        ss = b.u(pos, 8); pos += 8;
        sdu_off = pos; sdu_len = n - pos;
        if (final) { dec = DEC_AL_FINAL; fcs_state = 1; }  // have_fcs, not checked
        else dec = DEC_AL_DATA;
        break;
    }
    case 10: {       // AL-UDATA/UFINAL
        int ufinal = b.bit(pos); pos += 1;
        ns = b.u(pos, 8); pos += 8;
        ss = b.u(pos, 8); pos += 8;
        sdu_off = pos; sdu_len = n - pos;
        if (ufinal) { dec = DEC_AL_UFINAL; fcs_state = 1; }
        else dec = DEC_AL_UDATA;
        break;
    }
    case 11: {
        int ack = b.bit(pos); pos += 1;
        dec = ack ? DEC_AL_ACK : DEC_AL_RNR;
        sdu_off = pos; sdu_len = 0;
        break;
    }
    case 12: dec = DEC_AL_RECONNECT; sdu_off = pos; sdu_len = 0; break;
    case 15: dec = DEC_AL_DISC; sdu_off = pos; sdu_len = 0; break;
    default: dec = DEC_UNKNOWN; sdu_off = pos; sdu_len = 0; break;
    }
    if (n < pos) sdu_len = 0;  // truncated PDU guard
    cx.emit(EV_TMSDU, dec, (ns << 8) | ss, fcs_state, sdu_len);
    if (!sdu_len) return;

    Bits sdu = b.slice(sdu_off, sdu_off + sdu_len);
    switch (dec) {
    case DEC_BL_ADATA: case DEC_BL_DATA: case DEC_BL_UDATA: case DEC_BL_ACK:
    case DEC_AL_SETUP: case DEC_AL_ACK: case DEC_AL_RNR:
    case DEC_AL_RECONNECT: case DEC_AL_DISC:
        rx_tl_sdu(cx, sdu);
        break;
    case DEC_AL_DATA: case DEC_AL_UDATA: {
        Defrag &d = car.defrag[ns & 0xFF];
        if (!d.present) { d.present = true; d.last_ss = 0; d.bits.clear(); }
        if (d.last_ss == 0 || d.last_ss == ss - 1) {
            d.last_ss = (int)ss;
            d.bits.insert(d.bits.end(), sdu.p, sdu.p + sdu.n);
        } else {
            cx.emit(EV_MISS, d.last_ss, ss);
        }
        break;
    }
    case DEC_AL_FINAL: case DEC_AL_UFINAL: {
        Defrag &d = car.defrag[ns & 0xFF];
        if (!d.present) { d.present = true; d.last_ss = 0; d.bits.clear(); }
        if (d.last_ss == 0 || d.last_ss == ss - 1) {
            d.last_ss = (int)ss;
            d.bits.insert(d.bits.end(), sdu.p, sdu.p + sdu.n);
        } else {
            cx.emit(EV_MISS, d.last_ss, ss);
        }
        defrag_out(cx, car, (int)ns);
        break;
    }
    default: break;
    }
}

// ---- upper MAC ----

void cleanup_frag(Carrier &car, int slot) { car.frags[slot] = Frag(); }

void age_fragslots(Ctx &cx, Carrier &car) {
    for (int i = 0; i < NR_FRAGSLOTS; i++) {
        Frag &f = car.frags[i];
        if (f.active && ++f.age > N203) {
            cx.emit(EV_FRAG_AGEOUT, i, f.num, f.length);
            cleanup_frag(car, i);
        }
    }
}

void append_frag(Carrier &car, int slot, const Bits &b) {
    Frag &f = car.frags[slot];
    f.bits.insert(f.bits.end(), b.p, b.p + b.n);
    f.length += (int)b.n;
    f.num += 1;
    f.age = 0;
}

int rx_bcast(Ctx &cx, Carrier &car, const Bits &b) {
    int64_t main_carrier = b.u(4, 12);
    int band = (int)b.u(16, 4), off = (int)b.u(20, 2);
    // header(4) + carrier(12) band(4) off(2) dup(3) rev(1) csch(2)
    // txpwr(3) rxlev(4) acc(4) timeout(4) -> cck flag at bit 43
    int cck_valid = b.bit(43);
    int64_t val16 = b.u(44, 16);  // read without advancing (ref quirk)
    int64_t la = b.u(124 - 42, 14);
    int64_t bsd = b.u(124 - 42 + 14 + 16, 12);
    cx.emit(EV_SYSINFO, main_carrier, band * 16 + off,
            (int64_t)cck_valid << 32 | val16, (la << 12) | bsd);
    // crypto state update (tetra_upper_mac.c:119-131 / upper_mac.py
    // rx_bcast): SYSINFO carries la + main carrier, plus either the
    // CCK id (cck_valid) or the hyperframe number
    car.la = (int)la;
    car.cn = (int)main_carrier;
    if (cck_valid) {
        if ((int)val16 != car.cck_id) {
            car.cck_id = (int)val16;
            update_current_cck(cx, car);
        }
    } else {
        car.hn = (int)val16;
    }
    return -1;
}

void rx_aach(Ctx &cx, Carrier &car, const Bits &b, int fn) {
    int hdr = (int)b.u(0, 2);
    int f1 = (int)b.u(2, 6), f2 = (int)b.u(8, 6);
    int dl = -1, ul = -1, a1 = 255, a2 = 255;
    if (fn != 18) {
        if (hdr == 0) { a1 = f1; a2 = f2; }
        else if (hdr == 1 || hdr == 2) { dl = f1; a2 = f2; }
        else { dl = f1; ul = f2; }
    } else {
        if (hdr <= 2) { a1 = f1; a2 = f2; }
        else a2 = f2;
    }
    cx.emit(EV_AACH, hdr, dl, ul, ((int64_t)a1 << 8) | a2);
    car.is_traffic = dl > 3 ? dl : 0;
    car.blk1_stolen = false;
    car.blk2_stolen = false;
}

int rx_resrc(Ctx &cx, Carrier &car, const Bits &in) {
    Bits b = in;
    ResourceHdr r = decode_resource(b);
    int64_t tmpdu = r.bit_len;
    int64_t pdu_bits;
    // eff mirrors msgb_l1len after truncation; a reserved length field
    // (-22) drives the reference's tail below head, so the reported
    // lengths go NEGATIVE (tetra_upper_mac.c:177-178) — replicated
    // signed, matching upper_mac.py and the compiled oracle
    int64_t eff = b.n;
    if (r.macpdu_length == LEN_2ND_STOLEN) {
        pdu_bits = -1;
        car.blk2_stolen = true;
    }
    else if (r.macpdu_length == LEN_START_FRAG) pdu_bits = -1;
    else {
        pdu_bits = (int64_t)r.macpdu_length * 8;
        if (pdu_bits > 0 && pdu_bits <= b.n) {
            b = b.slice(0, pdu_bits);
            eff = pdu_bits;
        } else if (pdu_bits <= 0) {
            b = b.slice(0, 0);
            eff = pdu_bits;
        }
    }
    if (r.fill_bits && eff > 0) {
        int nfb = num_fill_bits(b);
        b = b.slice(0, b.n - nfb);
        eff -= nfb;
    }
    // decrypt on the hot path (tetra_crypto.c:211-252 / upper_mac.py
    // rx_resrc): select the CCK, derive the keystream at the current
    // slot time, XOR, then decode the chan-alloc that was hidden under
    // encryption. A copy of the element lives in `scratch` so decoded
    // SDU bits point at plaintext.
    int key_idx = -1;
    std::vector<uint8_t> scratch;
    if (r.is_encrypted && !cx.keys.empty()) {
        key_idx = get_ksg_key(car);
        if (key_idx >= 0) {
            bool second_half =
                cx.cur_blk_num == 2
                && (cx.cur_lchan == LCH_SCH_HD || cx.cur_lchan == LCH_UNKNOWN);
            scratch.assign(b.p, b.p + b.n);
            if (decrypt_elem(cx, car, key_idx, scratch.data(), b.n,
                             tmpdu, second_half)) {
                b = Bits{scratch.data(), (int64_t)scratch.size()};
                r.is_encrypted = 0;
                if (r.chan_alloc_pres)
                    tmpdu += decode_chan_alloc(b.slice(tmpdu, b.n));
            }
        }
    }
    int64_t l2len = eff - tmpdu;
    cx.emit(EV_RESOURCE, r.addr_type, r.addr_value, r.macpdu_length,
            (l2len << 1) | r.is_encrypted);
    if (r.addr_type == 0) return -1;
    if (l2len <= 0 || r.is_encrypted) return (int)pdu_bits;

    Bits sdu = b.slice(tmpdu, b.n);
    if (r.macpdu_length != LEN_START_FRAG) {
        rx_tm_sdu(cx, car, sdu, sdu.n);
    } else {
        int slot = cx.cur_slot_tn;
        Frag &f0 = car.frags[slot];
        if (f0.active) {
            cx.emit(EV_FRAG_ACTIVE, slot);
            cleanup_frag(car, slot);
        }
        Frag &f = car.frags[slot];
        f.active = true;
        f.enc = r.encryption_mode > 0;
        f.key_idx = key_idx;
        append_frag(car, slot, sdu);
        cx.emit(EV_FRAG_START, slot, sdu.n);
    }
    return (int)pdu_bits;
}

int rx_macfrag(Ctx &cx, Carrier &car, const Bits &b, int slot) {
    Frag &f = car.frags[slot];
    if (!f.active) { cx.emit(EV_FRAG_NOSTART, slot, -1); return -1; }
    int64_t nn = 3;
    int fill = b.bit(nn); nn += 1;
    Bits body = b.slice(nn, b.n);
    if (fill) body = body.slice(0, b.n - num_fill_bits(b) - nn);
    // encrypted continuation fragments decrypt with the key captured at
    // FRAG-START, keystream at THIS slot's time (upper_mac.py
    // rx_macfrag); without a key they append as-is
    std::vector<uint8_t> scratch;
    if (f.enc && f.key_idx >= 0) {
        scratch.assign(b.p, b.p + nn + body.n);
        if (decrypt_elem(cx, car, f.key_idx, scratch.data(),
                         nn + body.n, nn, false))
            body = Bits{scratch.data() + nn, body.n};
    }
    append_frag(car, slot, body);
    cx.emit(EV_FRAG_CONT, slot, body.n);
    return -1;
}

int rx_macend(Ctx &cx, Carrier &car, const Bits &b, int slot) {
    Frag &f = car.frags[slot];
    int64_t nn = 3;
    int fill = b.bit(nn); nn += 1;
    nn += 1;  // grant position
    int64_t length_ind = b.u(nn, 6); nn += 6;
    if (!f.active) {
        cx.emit(EV_FRAG_NOSTART, slot, length_ind * 8);
        cleanup_frag(car, slot);
        return (int)(length_ind * 8);
    }
    int slot_granting = b.bit(nn); nn += 1;
    if (slot_granting) nn += 8;
    int chanalloc = b.bit(nn); nn += 1;
    int64_t body_end = length_ind * 8 < b.n ? length_ind * 8 : b.n;
    Bits work = b.slice(0, body_end);
    if (fill) work = work.slice(0, work.n - num_fill_bits(work));
    // encrypted MAC-END decrypts before the chan-alloc decode
    // (upper_mac.py rx_macend)
    std::vector<uint8_t> scratch;
    if (f.enc && f.key_idx >= 0) {
        scratch.assign(work.p, work.p + work.n);
        decrypt_elem(cx, car, f.key_idx, scratch.data(), work.n, nn,
                     false);
        work = Bits{scratch.data(), work.n};
    }
    if (chanalloc)
        nn += decode_chan_alloc(work.slice(nn, work.n));
    Bits body = work.slice(nn, work.n);
    append_frag(car, slot, body);
    cx.emit(EV_FRAG_END, slot, body.n, f.length);
    if (!f.enc || f.key_idx >= 0) {
        Bits full{f.bits.data(), (int64_t)f.bits.size()};
        rx_tm_sdu(cx, car, full, f.length);
    }
    cleanup_frag(car, slot);
    return (int)(length_ind * 8);
}

int rx_suppl(Ctx &cx, Carrier &car, const Bits &b) {
    int slot_granting = b.bit(17);
    int64_t off = 17 + 1 + (slot_granting ? 8 : 0);
    Bits sdu = b.slice(off, b.n);
    int64_t len = sdu.n < 100 ? sdu.n : 100;
    cx.emit(EV_SUPPL, sdu.n);
    rx_tm_sdu(cx, car, sdu, len);
    return -1;
}

// the multi-PDU slot loop over one type-1 block (upper_mac.py rx_slot)
void process_block(Ctx &cx, Carrier &car, const Bits &all, int lchan,
                   int crc_ok, int fn, int blk_num) {
    cx.cur_lchan = lchan;
    cx.cur_blk_num = blk_num;
    int64_t total = all.n, offset = 0;
    while (true) {
        Bits b = all.slice(offset, total);
        int pdu_type = b.n >= 2 ? (int)b.u(0, 2) : 0;
        cx.emit(EV_TMV, lchan, crc_ok, pdu_type);
        int64_t pdu_bits = -1;
        if (crc_ok) {
            if (cx.gsmtap && cx.cur_row >= 0)
                cx.emit(EV_GSMTAP, cx.cur_row, lchan,
                        ((int64_t)blk_num << 20) | (cx.cur_tn << 16)
                            | (cx.cur_fn << 8) | cx.cur_mn,
                        offset);
            if (fn == 18) age_fragslots(cx, car);
            if (lchan == LCH_AACH) rx_aach(cx, car, b, fn);
            else if (lchan == LCH_BSCH) { /* SYNC handled above MAC */ }
            else if (lchan == LCH_BNCH || lchan == LCH_UNKNOWN ||
                     lchan == LCH_SCH_F || lchan == LCH_SCH_HD) {
                if (pdu_type == MACPDU_BCAST) pdu_bits = rx_bcast(cx, car, b);
                else if (pdu_type == MACPDU_RESOURCE)
                    pdu_bits = rx_resrc(cx, car, b);
                else if (pdu_type == MACPDU_SUPPL)
                    pdu_bits = rx_suppl(cx, car, b);
                else if (pdu_type == MACPDU_FRAG_END) {
                    if (b.bit(2) == 0)
                        pdu_bits = rx_macfrag(cx, car, b, cx.cur_slot_tn);
                    else
                        pdu_bits = rx_macend(cx, car, b, cx.cur_slot_tn);
                } else {
                    cx.emit(EV_STRANGE_PDU, pdu_type);
                }
            } else {
                cx.emit(EV_STRANGE_LCHAN, lchan);
            }
        }
        if (pdu_bits <= 0) break;
        offset += pdu_bits;
        if (offset >= total - 16) break;
    }
}

// one aligned slot's block dispatch (rx.py::_walk_slot semantics:
// tp_sap_udata_ind routing incl. BNCH prediction, traffic gating and
// slot stealing, tetra_lower_mac.c:115-127/178-241); shared by walk
// (caller-supplied time) and walk2 (native TDMA clock)
// Voice keystream for a traffic slot when a cipher key is selected
// (reference tetra_crypto.c:254-282: two half slots, 137 bits each,
// from the slot-time IV; the reference ships the function unwired —
// here the walk generates the keystream at EXACT slot time into the
// payload arena and the host XORs it over the decoded codec frames).
// Returns (arena_offset + 1) << 8 for packing into EV_TRAFFIC's d, or
// 0 when no key / incomplete crypto state / no arena.
int64_t voice_ks_ref(Ctx &cx, Carrier &car) {
    // key selection mirrors decrypt_voice_timeslot: tcs->cck directly
    if (car.cck_idx < 0 || !cx.pay) return 0;
    uint8_t ks[274];
    if (!gen_keystream(cx, car, car.cck_idx, 274, ks)) return 0;
    int64_t off = cx.pay_put(Bits{ks, 274});
    return off < 0 ? 0 : (off + 1) << 8;
}

void walk_slot(Ctx &cx, Carrier &car, const Bits &blkA, const Bits &bbk,
               const Bits &blkB, int kind, int okA, int okB,
               int tn, int fn, int mn, int slot_ref) {
    cx.cur_slot_tn = tn >= 0 && tn < NR_FRAGSLOTS ? tn : 0;
    cx.cur_tn = tn; cx.cur_fn = fn; cx.cur_mn = mn;
    if (kind == 0) {  // SYNC: SB1 -> BSCH, BBK -> AACH, SB2
        if (okA) {
            // crypto view of the SYNC fields (rx.py:_rx_sb1 322-325 /
            // tetra_lower_mac.c:311-317): colour code -> cc, network
            // (re)selection on an mcc/mnc change
            car.cc = (int)blkA.u(4, 6);
            int mcc = (int)blkA.u(31, 10), mnc = (int)blkA.u(41, 14);
            if (car.c_mcc != mcc || car.c_mnc != mnc)
                update_current_network(cx, car, mcc, mnc);
        }
        cx.emit(EV_CRC, 0, okA);
        process_block(cx, car, blkA, LCH_BSCH, okA, fn, 1);
        process_block(cx, car, bbk, LCH_AACH, 1, fn, 0);
        int lchan = (fn == 18 && tn == 4 - ((mn + 3) % 4))
            ? LCH_BNCH : LCH_UNKNOWN;
        cx.emit(EV_CRC, 1, okB);
        process_block(cx, car, blkB, lchan, okB, fn, 2);
    } else if (kind == 1) {  // SCH/F
        process_block(cx, car, bbk, LCH_AACH, 1, fn, 0);
        if (car.is_traffic) {
            cx.emit(EV_TRAFFIC, slot_ref, 0, car.is_traffic,
                    voice_ks_ref(cx, car) | tn);
        } else {
            cx.emit(EV_CRC, 2, okA);
            process_block(cx, car, blkA, LCH_SCH_F, okA, fn, 0);
        }
    } else {  // NDB
        process_block(cx, car, bbk, LCH_AACH, 1, fn, 0);
        if (car.is_traffic) {
            car.blk1_stolen = true;
            cx.emit(EV_CRC, 3, okA);
            process_block(cx, car, blkA, LCH_UNKNOWN, okA, fn, 1);
            if (car.blk2_stolen) {
                cx.emit(EV_CRC, 3, okB);
                process_block(cx, car, blkB, LCH_UNKNOWN, okB, fn, 2);
            } else {
                cx.emit(EV_TRAFFIC, slot_ref, 1, car.is_traffic,
                        voice_ks_ref(cx, car) | tn);
            }
        } else {
            cx.emit(EV_CRC, 3, okA);
            process_block(cx, car, blkA, LCH_UNKNOWN, okA, fn, 1);
            cx.emit(EV_CRC, 3, okB);
            process_block(cx, car, blkB, LCH_UNKNOWN, okB, fn, 2);
        }
    }
}

// walk2 packed-row geometry (rx.py _PACK_* layout, 408-column rows)
constexpr int ROW_STRIDE = 408, OFF_B = 268, OFF_BBK = 392;
constexpr int LEN_A[3] = {60, 268, 124};
constexpr int LEN_B[3] = {124, 0, 124};

}  // namespace

extern "C" {

void *tetra_umac_create(int n_carriers) {
    Ctx *cx = new Ctx();
    cx->carriers.resize(n_carriers);
    return cx;
}

void tetra_umac_destroy(void *p) { delete (Ctx *)p; }

// Load the keystore (reference tetra_crypto.c:284-379 database):
// nets: n_nets x 4 int32 = mcc, mnc, ksg_type, security_class;
// keys: n_keys x 4 int32 = mcc, mnc, key_type, key_num; keybytes:
// n_keys x 10 bytes (80-bit CK each). Each key's KSG comes from its
// own network entry (crypto.py TetraKey.network_info), resolved here.
// Existing per-carrier network/CCK resolutions are refreshed.
void tetra_umac_set_keys(void *p, const int32_t *nets, int64_t n_nets,
                         const int32_t *keys, int64_t n_keys,
                         const uint8_t *keybytes) {
    Ctx &cx = *(Ctx *)p;
    cx.nets.clear();
    cx.keys.clear();
    for (int64_t i = 0; i < n_nets; i++) {
        const int32_t *r = nets + 4 * i;
        cx.nets.push_back(NetRec{r[0], r[1], r[2], r[3]});
    }
    for (int64_t i = 0; i < n_keys; i++) {
        const int32_t *r = keys + 4 * i;
        KeyRec k{r[0], r[1], r[2], r[3], 0, {}};
        for (const NetRec &n : cx.nets)
            if (n.mcc == k.mcc && n.mnc == k.mnc) { k.ksg_type = n.ksg_type; break; }
        std::memcpy(k.key, keybytes + 10 * i, 10);
        cx.keys.push_back(k);
    }
    for (Carrier &car : cx.carriers) {
        car.ks_key = -1; car.ks_bytes_n = 0;  // key bytes may differ
        if (car.c_mcc >= 0)
            update_current_network(cx, car, car.c_mcc, car.c_mnc);
    }
}

// recs: n x 9 int32 = carrier, lchan, crc_ok, blk_num, tn, fn, mn,
// bit offset, bit length (offsets into `bits`, 1 byte per bit).
// Returns events written; sets *overflow when the buffer was too small.
int64_t tetra_umac_process(void *p, const uint8_t *bits,
                           const int32_t *recs, int64_t n_recs,
                           int32_t *ev_car, int32_t *ev_kind,
                           int64_t *ev_a, int64_t *ev_b, int64_t *ev_c,
                           int64_t *ev_d, int64_t max_events,
                           int32_t *overflow) {
    Ctx &cx = *(Ctx *)p;
    cx.ev_car = ev_car; cx.ev_kind = ev_kind;
    cx.ev_a = ev_a; cx.ev_b = ev_b; cx.ev_c = ev_c; cx.ev_d = ev_d;
    cx.ev_max = max_events; cx.ev_n = 0; cx.overflow = 0;

    for (int64_t i = 0; i < n_recs; i++) {
        const int32_t *r = recs + 9 * i;
        int carrier = r[0], lchan = r[1], crc_ok = r[2];
        int tn = r[4], fn = r[5];
        if (carrier < 0 || carrier >= (int)cx.carriers.size()) continue;
        Carrier &car = cx.carriers[carrier];
        cx.cur_carrier = carrier;
        cx.cur_slot_tn = tn >= 0 && tn < NR_FRAGSLOTS ? tn : 0;
        cx.cur_tn = tn; cx.cur_fn = fn; cx.cur_mn = r[6];
        cx.cur_row = -1;  // no packed rows in this entry point
        Bits all{bits + r[7], r[8]};
        process_block(cx, car, all, lchan, crc_ok, fn, r[3]);
    }
    if (overflow) *overflow = (int32_t)cx.overflow;
    return cx.ev_n;
}

// Whole-slot walk: the per-slot upper-MAC dispatch of rx.py::_walk_slot
// (tp_sap_udata_ind block routing incl. BNCH prediction, traffic
// gating and slot stealing, tetra_lower_mac.c:115-127/178-241).
//
// recs: n x 14 int32 = carrier, kind (0 SYNC/1 SCHF/2 NDB), tn, fn,
// mn, okA, okB, offA, lenA, offBBK, lenBBK, offB, lenB, slot_ref.
// Per slot: kind SYNC dispatches blkA=SB1 (BSCH), BBK (AACH),
// blkB=SB2 (BNCH when fn==18 && tn==4-((mn+3)%4) else UNKNOWN);
// SCHF dispatches BBK then either a traffic event or SCH/F; NDB
// dispatches BBK then NDB1/NDB2 with the stealing rules. Traffic
// payloads are the caller's to dump (EV_TRAFFIC carries slot_ref).
int64_t tetra_umac_walk(void *p, const uint8_t *bits,
                        const int32_t *recs, int64_t n_recs,
                        int32_t *ev_car, int32_t *ev_kind,
                        int64_t *ev_a, int64_t *ev_b, int64_t *ev_c,
                        int64_t *ev_d, int64_t max_events,
                        int32_t *overflow) {
    Ctx &cx = *(Ctx *)p;
    cx.ev_car = ev_car; cx.ev_kind = ev_kind;
    cx.ev_a = ev_a; cx.ev_b = ev_b; cx.ev_c = ev_c; cx.ev_d = ev_d;
    cx.ev_max = max_events; cx.ev_n = 0; cx.overflow = 0;

    for (int64_t i = 0; i < n_recs; i++) {
        const int32_t *r = recs + 14 * i;
        int carrier = r[0], kind = r[1], tn = r[2], fn = r[3], mn = r[4];
        int okA = r[5], okB = r[6];
        if (carrier < 0 || carrier >= (int)cx.carriers.size()) continue;
        Carrier &car = cx.carriers[carrier];
        cx.cur_carrier = carrier;
        cx.cur_row = -1;  // no packed rows in this entry point
        Bits blkA{bits + r[7], r[8]};
        Bits bbk{bits + r[9], r[10]};
        Bits blkB{bits + r[11], r[12]};
        walk_slot(cx, car, blkA, bbk, blkB, kind, okA, okB, tn, fn, mn,
                  r[13]);
    }
    if (overflow) *overflow = (int32_t)cx.overflow;
    return cx.ev_n;
}

// Self-clocked whole-slot walk: like tetra_umac_walk, but the TDMA
// clock and the SYNC-PDU side effects live HERE instead of per-slot
// Python (reference tetra_burst_sync.c:113 + tetra_lower_mac.c:283-310;
// the fill from rx.py::_rx_sb1 field offsets).
//
// bits: concatenated 408-column packed-decode rows (ubits), one row per
// record, rx.py _PACK_* layout. recs: n x 7 int32 = carrier, kind
// (0 SYNC/1 SCHF/2 NDB), okA, okB, burst_delta (TDMA slots to advance
// BEFORE dispatch, incl. this slot's own), row, slot_ref. tails:
// per-carrier trailing advances after each carrier's last record.
// pay/pay_max: optional TL-SDU payload arena (ubits out); *pay_n_out
// receives the bits written. Size it with tetra_umac_payload_bound —
// the walk is stateful (TDMA clocks, defragmenters) and cannot be
// re-run on overflow.
int64_t tetra_umac_walk2(void *p, const uint8_t *bits,
                         const int32_t *recs, int64_t n_recs,
                         const int32_t *tails, int64_t n_tails,
                         int32_t *ev_car, int32_t *ev_kind,
                         int64_t *ev_a, int64_t *ev_b, int64_t *ev_c,
                         int64_t *ev_d, int64_t max_events,
                         int32_t *overflow,
                         uint8_t *pay, int64_t pay_max,
                         int64_t *pay_n_out) {
    Ctx &cx = *(Ctx *)p;
    cx.ev_car = ev_car; cx.ev_kind = ev_kind;
    cx.ev_a = ev_a; cx.ev_b = ev_b; cx.ev_c = ev_c; cx.ev_d = ev_d;
    cx.ev_max = max_events; cx.ev_n = 0; cx.overflow = 0;
    cx.pay = pay; cx.pay_max = pay_max; cx.pay_n = 0; cx.pay_overflow = 0;

    for (int64_t i = 0; i < n_recs; i++) {
        const int32_t *r = recs + 7 * i;
        int carrier = r[0], kind = r[1], okA = r[2], okB = r[3];
        if (carrier < 0 || carrier >= (int)cx.carriers.size()) continue;
        Carrier &car = cx.carriers[carrier];
        cx.cur_carrier = carrier;
        for (int k = 0; k < r[4]; k++) tdma_add_tn1(car);
        cx.cur_row = r[5];
        const uint8_t *row = bits + (int64_t)r[5] * ROW_STRIDE;
        Bits blkA{row, LEN_A[kind]};
        Bits bbk{row + OFF_BBK, 14};
        Bits blkB{row + OFF_B, LEN_B[kind]};
        if (kind == 0 && okA) {
            // SYNC PDU side effects (tetra_lower_mac.c:283-310)
            car.colour = (int)blkA.u(4, 6);
            car.tn = (int)blkA.u(10, 2) + 1;
            car.fn = (int)blkA.u(12, 5);
            car.mn = (int)blkA.u(17, 6);
            car.mcc = (int)blkA.u(31, 10);
            car.mnc = (int)blkA.u(41, 14);
        }
        walk_slot(cx, car, blkA, bbk, blkB, kind, okA, okB,
                  car.tn, car.fn, car.mn, r[6]);
    }
    for (int64_t c = 0; c < n_tails && c < (int64_t)cx.carriers.size();
         c++)
        for (int k = 0; k < tails[c]; k++) tdma_add_tn1(cx.carriers[c]);
    if (overflow) *overflow = (int32_t)(cx.overflow | (cx.pay_overflow << 1));
    if (pay_n_out) *pay_n_out = cx.pay_n;
    cx.pay = nullptr; cx.pay_max = 0;
    return cx.ev_n;
}

// Upper bound on the payload bits one walk2 call over `chunk_bits`
// input bits can emit: every TL-SDU bit comes from this chunk's rows
// or from carried reassembly state (advanced-link defragmenters +
// upper-MAC fragslots), none is emitted twice, and a row can add at
// most one 274-bit voice keystream on top of at most (row_bits - 274)
// TL-SDU bits (traffic rows emit no SCH/F TL-SDUs) — so chunk_bits
// still dominates per row; the slack absorbs the stolen-NDB corner.
int64_t tetra_umac_payload_bound(void *p, int64_t chunk_bits) {
    Ctx &cx = *(Ctx *)p;
    int64_t pending = 0;
    for (const Carrier &car : cx.carriers) {
        for (int i = 0; i < NR_FRAGSLOTS; i++)
            pending += (int64_t)car.frags[i].bits.size();
        for (int i = 0; i < 256; i++)
            pending += (int64_t)car.defrag[i].bits.size();
    }
    return chunk_bits + pending + 4096;
}

// toggle GSMTAP event emission (EV_GSMTAP per CRC-OK TMV dispatch in
// the walk2 packed-row path; the host packetises + sends UDP)
void tetra_umac_set_gsmtap(void *p, int on) {
    ((Ctx *)p)->gsmtap = on ? 1 : 0;
}

// per-carrier walk2 state readback: out is [n_carriers, 6] int32 =
// tn, fn, mn, colour, mcc, mnc
void tetra_umac_get_states(void *p, int32_t *out) {
    Ctx &cx = *(Ctx *)p;
    for (size_t c = 0; c < cx.carriers.size(); c++) {
        const Carrier &car = cx.carriers[c];
        int32_t *o = out + 6 * c;
        o[0] = car.tn; o[1] = car.fn; o[2] = car.mn;
        o[3] = car.colour; o[4] = car.mcc; o[5] = car.mnc;
    }
}

}  // extern "C"

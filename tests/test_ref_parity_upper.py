"""Upper-half differential parity vs the COMPILED reference.

tools/ref_rx_full.c links the reference's actual upper MAC
(/root/reference/src/tetra_upper_mac.c:157-385), LLC (tetra_llc.c:111-179
incl. the advanced-link defragmenter), MLE (tetra_mle.c:20-53), the PDU
codecs and crypto suite on top of the same PHY + lower MAC oracle chain
used by tests/test_ref_parity.py.  These tests feed both receivers the
same captures and diff FIELD-LEVEL upper-half decisions: MAC-RESOURCE
headers (encryption mode, length field, L2 length, full address dump),
fragment reassembly (start/cont/end lengths, accumulated totals, N203
age-out), LLC PDU classification + FCS verdicts + TL-SDU lengths, MLE
protocol-discriminator dispatch with PDU names, SYSINFO DL/UL carrier
frequency computation, and ACCESS-ASSIGN field decoding."""
import os
import re
import subprocess

import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import constants as C, tx, testpdu
from tetra_tpu.rx import TetraReceiver
from tetra_tpu.ops.crc import fcs32_np
from tests.test_rx_e2e import MCC, MNC, CC, INIT
from tests.test_ref_parity import REF, REPO, REF_SOURCES

UPPER_SOURCES = REF_SOURCES + [
    "tetra_upper_mac.c", "tetra_llc.c", "tetra_llc_pdu.c",
    "tetra_mle.c", "tetra_mle_pdu.c", "tetra_mm_pdu.c",
    "tetra_cmce_pdu.c", "tetra_sndcp_pdu.c",
    "crypto/tetra_crypto.c", "crypto/tea1.c", "crypto/tea2.c",
    "crypto/tea3.c", "crypto/taa1.c", "crypto/hurdle.c",
]


@pytest.fixture(scope="session")
def ref_rx_full_bin(tmp_path_factory):
    if not os.path.isdir(REF):
        pytest.skip("reference tree not mounted")
    out = str(tmp_path_factory.mktemp("refrxfull") / "ref_rx_full")
    cmd = ["gcc", "-O1", "-o", out,
           os.path.join(REPO, "tools/ref_rx_full.c")]
    cmd += [os.path.join(REF, s) for s in UPPER_SOURCES]
    cmd += ["-I" + os.path.join(REPO, "tools/stubs"), "-I" + REF]
    subprocess.run(cmd, check=True)
    return out


# ---- oracle stdout -> ordered upper-half event list ----

_PATTERNS = [
    ("RESOURCE", re.compile(
        r"RESOURCE Encr=(\d+)( DECRYPTED)? len_field=(-?\d+) "
        r"l1_len=(-?\d+) l2_len=(-?\d+) Addr=(.*?\))"
        r"(?= ChanAlloc| SlotGrant|:|\n)")),
    ("TMSDU", re.compile(
        r"TM-SDU\((unknown\(\d+\)|[^)]+)\)(?: fcs=(OK|BAD) )? "
        r"l3len=(\d+)")),
    ("TLSDU", re.compile(r"TL-SDU\(([A-Za-z]+)\): [01]*( \S+)?")),
    ("FRAG_START", re.compile(r"FRAG-START slot=(\d+) len=(\d+) msgb=([01]*)")),
    ("FRAG_CONT", re.compile(r"FRAG-CONT slot=(\d+) added=(\d+) msgb=([01]*)")),
    ("FRAG_END", re.compile(r"FRAG-END slot=(\d+) added=(\d+) msgb=([01]*)")),
    ("AGEOUT", re.compile(
        r"FRAG: aged out old fragments for slot=(\d+) fragments=(\d+) "
        r"length=(\d+)")),
    ("NOSTART_FRAG", re.compile(
        r"WARNING got fragment without start packet for slot=(\d+)")),
    ("NOSTART_END", re.compile(
        r"FRAG: got end frag with len (\d+) without start packet "
        r"for slot=(\d+)")),
    ("FRAG_ACTIVE", re.compile(r"WARNING: fragment slot still active")),
    ("SYSINFO", re.compile(
        r"BNCH SYSINFO \(DL (\d+) Hz, UL (\d+) Hz\), "
        r"service_details 0x([0-9a-f]+) (CCK ID \d+|Hyperframe \d+)")),
    ("AACH", re.compile(r"ACCESS-ASSIGN PDU: ([^\n]*)")),
    # crypto integration lines (tetra_crypto.c:217-219, 232, 248-249,
    # 438-449): key selection, IV time, keystream offsets
    ("DECRYPT", re.compile(
        r"tetra_crypto: addr +(-?\d+) -> key +(-?\d+), time +(-?\d+)/"
        r"(\d+)/(\d+)/(\d+)/\d+, tmpdu offset (\d+), decrypting "
        r"(\d+) bits")),
    ("SKIP216", re.compile(
        r"tetra_crypto: 2nd half slot; skipping bits")),
    ("NOTB5", re.compile(
        r"can't compute TB5 due to incomplete network info "
        r"\(carr (-?\d+) la (-?\d+) cc (-?\d+)\)")),
    ("CCK_INVOKED", re.compile(
        r"update_current_cck invoked cck (-?\d+) mcc (-?\d+) "
        r"mnc (-?\d+)")),
    ("CCK_SET", re.compile(r"Set new current_cck (\d+) \(type: full\)")),
]


def run_oracle_upper(binary, bits, dumpdir, keystore=None):
    cap = os.path.join(dumpdir, "cap.bits")
    np.asarray(bits, dtype=np.uint8).tofile(cap)
    cmd = [binary, "-d", dumpdir]
    if keystore is not None:
        ks = os.path.join(dumpdir, "keys.txt")
        with open(ks, "w") as f:
            f.write(keystore)
        cmd += ["-k", ks]
    r = subprocess.run(cmd + [cap], capture_output=True,
                       text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    hits = []
    for kind, pat in _PATTERNS:
        for m in pat.finditer(r.stdout):
            hits.append((m.start(), kind, m.groups()))
    hits.sort()
    out = []
    for _, kind, g in hits:
        if kind == "RESOURCE":
            out.append(("RESOURCE", int(g[0]), bool(g[1]), int(g[2]),
                        int(g[4]), g[5]))
        elif kind == "TMSDU":
            out.append(("TMSDU", g[0], g[1] or "", int(g[2])))
        elif kind == "TLSDU":
            out.append(("TLSDU", g[0], (g[1] or "").strip()))
        elif kind in ("FRAG_START", "FRAG_CONT", "FRAG_END"):
            out.append((kind, int(g[0]), int(g[1]), len(g[2])))
        elif kind == "AGEOUT":
            out.append(("AGEOUT", int(g[0]), int(g[1]), int(g[2])))
        elif kind == "NOSTART_FRAG":
            out.append(("NOSTART_FRAG", int(g[0])))
        elif kind == "NOSTART_END":
            out.append(("NOSTART_END", int(g[1]), int(g[0])))
        elif kind == "FRAG_ACTIVE":
            out.append(("FRAG_ACTIVE",))
        elif kind == "SYSINFO":
            out.append(("SYSINFO", int(g[0]), int(g[1]), int(g[2], 16),
                        g[3]))
        elif kind == "AACH":
            out.append(("AACH", g[0].strip()))
        elif kind == "DECRYPT":
            out.append(("DECRYPT", int(g[0]), int(g[1]), int(g[2]),
                        int(g[3]), int(g[4]), int(g[5]), int(g[6]),
                        int(g[7])))
        elif kind == "SKIP216":
            out.append(("SKIP216",))
        elif kind == "NOTB5":
            out.append(("NOTB5", int(g[0]), int(g[1]), int(g[2])))
        elif kind == "CCK_INVOKED":
            out.append(("CCK_INVOKED", int(g[0]), int(g[1]), int(g[2])))
        elif kind == "CCK_SET":
            out.append(("CCK_SET", int(g[0])))
    return out, r.stdout


# ---- our receiver -> the same ordered event list ----

_DEC_NAMES = {0: "unknown(0)", 1: "BL-ADATA", 2: "BL-DATA", 3: "BL-UDATA",
              4: "BL-ACK", 5: "AL-SETUP", 6: "AL-DATA", 7: "AL-FINAL",
              8: "AL-UDATA", 9: "AL-UFINAL", 10: "AL-ACK", 11: "AL-RNR",
              12: "AL-RECONNECT", 13: "AL-DISC"}


def run_ours_upper(bits, keystore=None):
    from tetra_tpu.mle import mle as mle_mod
    events = []
    rx = TetraReceiver(log=lambda *a: None, keystore_path=keystore)
    rx.umac.events = events
    rx.llc.event_cb = events.append
    rx.tcs.event_cb = events.append

    def tl_cb(sdu, n):
        pdisc = int(
            (sdu[0] << 2) | (sdu[1] << 1) | sdu[2]) if n >= 3 else 0
        if pdisc == 1:
            pdut = mle_mod.mm_pdut_name(_u(sdu, 3, 4))
        elif pdisc == 2:
            pdut = mle_mod.cmce_pdut_name(_u(sdu, 3, 5))
        elif pdisc == 4:
            pdut = mle_mod.sndcp_pdut_name(_u(sdu, 3, 4))
        elif pdisc == 5:
            pdut = mle_mod.mle_pdut_name(_u(sdu, 3, 3))
        else:
            pdut = ""
        events.append(("TLSDU_T", mle_mod.mle_pdisc_name(pdisc), pdut))

    rx.llc.tl_sdu_cb = tl_cb
    rx.process_bits(bits)

    out = []
    frag_total = {}
    for e in events:
        tag = e[0]
        if tag == "RESOURCE":
            rsd, l2len = e[1], e[2]
            out.append(("RESOURCE", rsd.encryption_mode,
                        bool(rsd.encryption_mode and not rsd.is_encrypted),
                        rsd.macpdu_length, l2len, rsd.addr.dump()))
        elif tag == "TMSDU":
            dec, fcs, ln = e[1], e[4], e[5]
            out.append(("TMSDU", _DEC_NAMES.get(dec, f"unknown({dec})"),
                        {0: "", 1: "OK", 2: "BAD"}[fcs], ln))
        elif tag == "TLSDU_T":
            out.append(("TLSDU", e[1], e[2]))
        elif tag == "FRAG_START":
            frag_total[e[1]] = e[2]
            out.append(("FRAG_START", e[1], e[2], e[2]))
        elif tag == "FRAG_CONT":
            frag_total[e[1]] = frag_total.get(e[1], 0) + e[2]
            out.append(("FRAG_CONT", e[1], e[2], frag_total[e[1]]))
        elif tag == "FRAG_END":
            out.append(("FRAG_END", e[1], e[2], e[3] ))
            frag_total.pop(e[1], None)
        elif tag == "FRAG_AGEOUT":
            out.append(("AGEOUT", e[1], e[2], e[3]))
        elif tag == "FRAG_NOSTART":
            if e[2] == -1:
                out.append(("NOSTART_FRAG", e[1]))
            else:
                out.append(("NOSTART_END", e[1], e[2]))
        elif tag == "FRAG_ACTIVE":
            out.append(("FRAG_ACTIVE",))
        elif tag == "SYSINFO":
            sid = e[1]
            dl = C.dl_carrier_hz(sid.freq_band, sid.main_carrier,
                                 sid.freq_offset)
            ul = C.ul_carrier_hz(sid.freq_band, sid.main_carrier,
                                 sid.freq_offset, sid.duplex_spacing,
                                 sid.reverse_operation)
            tail = (f"CCK ID {sid.cck_id}" if sid.cck_valid_no_hf
                    else f"Hyperframe {sid.hyperframe_number}")
            out.append(("SYSINFO", dl, ul, sid.mle_si.bs_service_details,
                        tail))
        elif tag in ("DECRYPT", "SKIP216", "CCK_INVOKED", "CCK_SET"):
            out.append(e)
        elif tag == "CRYPTO_NOTB5":
            out.append(("NOTB5", e[1], e[2], e[3]))
        elif tag == "AACH":
            from tetra_tpu.umac.mac_pdu import dl_usage_name, ul_usage_name
            aad = e[1]
            parts = []
            for i, acc in ((1, aad.access1), (2, aad.access2)):
                if acc is not None:
                    parts.append(
                        f"ACCESS{i}: {chr(ord('A') + acc.access_code)}/"
                        f"{acc.base_frame_len}")
            if aad.dl_usage >= 0:
                parts.append(f"DL_USAGE: {dl_usage_name(aad.dl_usage)}")
            if aad.ul_usage >= 0:
                parts.append(f"UL_USAGE: {ul_usage_name(aad.ul_usage)}")
            out.append(("AACH", "".join(p + " " for p in parts).strip()))
    return out


def _u(bits, pos, w):
    v = 0
    for i in range(pos, min(pos + w, len(bits))):
        v = (v << 1) | int(bits[i])
    return v


def assert_upper_parity(bits, binary, tmp_path, min_events=1,
                        keystore=None):
    ref, stdout = run_oracle_upper(binary, np.asarray(bits, np.uint8),
                                   str(tmp_path), keystore=keystore)
    ks_path = (os.path.join(str(tmp_path), "keys.txt")
               if keystore is not None else None)
    ours = run_ours_upper(np.asarray(bits, np.uint8), keystore=ks_path)
    for i, (r, o) in enumerate(zip(ref, ours)):
        assert r == o, (i, r, o, ref[max(0, i - 3): i + 3],
                        ours[max(0, i - 3): i + 3])
    assert len(ref) == len(ours), (len(ref), len(ours), ref[-4:], ours[-4:])
    assert len(ref) >= min_events, stdout[-1500:]
    return ref


def _mk(*slot_pdus, garbage=731, syncs=2, fn0=1, seed=0):
    """garbage + `syncs` SYNC bursts + one SCH/F burst per pdu."""
    rng = np.random.default_rng(seed)
    aach = testpdu.make_access_assign_bits()
    stream = [rng.integers(0, 2, garbage).astype(np.uint8)]
    for k in range(syncs):
        stream.append(np.asarray(tx.make_sync_burst(
            testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC, fn=fn0),
            testpdu.make_sysinfo_pdu(), aach, jnp.uint32(INIT)), np.uint8))
    for pdu in slot_pdus:
        stream.append(np.asarray(tx.make_schf_burst(
            pdu, aach, jnp.uint32(INIT)), np.uint8))
    # trailing lookahead so the synchroniser emits the last slot
    stream.append(np.zeros(640, np.uint8))
    return np.concatenate(stream)


class TestUpperParity:
    def test_resource_llc_mle_chain(self, ref_rx_full_bin, tmp_path):
        """BL-UDATA carrying a CMCE D-SETUP through RESOURCE -> LLC ->
        MLE: address dump, L2 length, LLC classification, TL-SDU name."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdus = [testpdu.make_resource_pdu(ssi=0x401 + i, sdu_bits=sdu)
                for i in range(3)]
        ref = assert_upper_parity(_mk(*pdus), ref_rx_full_bin, tmp_path,
                                  min_events=8)
        assert sum(e[0] == "TLSDU" for e in ref) == 3

    def test_bl_adata_fcs(self, ref_rx_full_bin, tmp_path):
        """BL-ADATA+FCS: the FCS-32 verdict must match the reference,
        both intact (OK) and corrupted (BAD)."""
        from tetra_tpu.utils.bits import uint_to_bits
        payload = testpdu.make_mle_cmce_dsetup()

        def bl_adata_fcs(corrupt):
            body = np.concatenate([
                uint_to_bits(4, 4),       # BL-ADATA + FCS
                [0],                      # N(R)
                [1],                      # N(S)
                payload])
            fcs = fcs32_np(payload)
            fcs_bits = uint_to_bits(int(fcs), 32)
            if corrupt:
                fcs_bits = fcs_bits.copy()
                fcs_bits[5] ^= 1
            return np.concatenate([body, fcs_bits]).astype(np.int8)

        pdus = [testpdu.make_resource_pdu(ssi=0x600, sdu_bits=bl_adata_fcs(False)),
                testpdu.make_resource_pdu(ssi=0x601, sdu_bits=bl_adata_fcs(True))]
        ref = assert_upper_parity(_mk(*pdus), ref_rx_full_bin, tmp_path)
        verdicts = [e[2] for e in ref if e[0] == "TMSDU"
                    and e[1] == "BL-ADATA"]
        assert verdicts == ["OK", "BAD"]

    def test_fragment_reassembly(self, ref_rx_full_bin, tmp_path):
        """START_FRAG + MAC-END across frames (fragslots key on TN, so
        the END must land on the SAME timeslot of the next frame):
        per-fragment lengths, accumulated totals, final reassembled
        TM-SDU, and a no-start END on a different TN."""
        from tests.test_fragmentation import (make_start_frag, make_mac_end,
                                              make_null_schf)
        rng = np.random.default_rng(0)
        tl_sdu = np.concatenate([testpdu.make_mle_cmce_dsetup(),
                                 np.tile([1, 0, 1, 1, 0, 0], 40)])
        llc = testpdu.make_bl_udata(tl_sdu)
        start_slot, _ = make_start_frag(0x777, llc[: 268 - 43])
        end_slot = make_mac_end(llc[268 - 43:])
        aach = testpdu.make_access_assign_bits()
        sync = lambda fn: testpdu.make_sync_pdu(cc=CC, tn=1, fn=fn, mn=1,
                                                mcc=MCC, mnc=MNC)
        schf = lambda p: np.asarray(tx.make_schf_burst(
            p, aach, jnp.uint32(INIT)), np.uint8)
        sb = lambda fn: np.asarray(tx.make_sync_burst(
            sync(fn), testpdu.make_sysinfo_pdu(), aach,
            jnp.uint32(INIT)), np.uint8)
        stream = [rng.integers(0, 2, 97).astype(np.uint8),
                  sb(1),                           # consumed by alignment
                  sb(1), schf(start_slot),         # frame 1: tn1, tn2
                  schf(make_null_schf()), schf(make_null_schf()),
                  sb(2), schf(end_slot),           # frame 2: tn2 = END
                  schf(end_slot),                  # tn3: END w/o start
                  np.zeros(640, np.uint8)]
        ref = assert_upper_parity(np.concatenate(stream), ref_rx_full_bin,
                                  tmp_path)
        kinds = [e[0] for e in ref]
        assert "FRAG_START" in kinds and "FRAG_END" in kinds
        assert "NOSTART_END" in kinds
        assert sum(e[0] == "TLSDU" for e in ref) == 1

    def test_sysinfo_carrier_hz(self, ref_rx_full_bin, tmp_path):
        """SYSINFO DL/UL Hz math (tetra_common.c:41-91) across bands,
        offsets and duplex spacings."""
        rng = np.random.default_rng(7)
        aach = testpdu.make_access_assign_bits()
        stream = [rng.integers(0, 2, 555).astype(np.uint8)]
        for k in range(4):
            si = testpdu.make_sysinfo_pdu(
                main_carrier=int(rng.integers(1, 4000)),
                freq_band=int(rng.integers(0, 10)))
            stream.append(np.asarray(tx.make_sync_burst(
                testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC),
                si, aach, jnp.uint32(INIT)), np.uint8))
        ref = assert_upper_parity(np.concatenate(stream), ref_rx_full_bin,
                                  tmp_path)
        assert sum(e[0] == "SYSINFO" for e in ref) >= 3

    def test_mixed_corruption_soak(self, ref_rx_full_bin, tmp_path):
        """Bit-flipped mixed stream: every upper-half decision must
        still match slot for slot (CRC-failed slots drop out in both)."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdus = [testpdu.make_resource_pdu(ssi=0x500 + i, sdu_bits=sdu)
                for i in range(8)]
        bits = _mk(*pdus, seed=3)
        rng = np.random.default_rng(11)
        idx = rng.choice(len(bits), size=60, replace=False)
        bits = bits.copy()
        bits[idx] ^= 1
        assert_upper_parity(bits, ref_rx_full_bin, tmp_path)


# ---- encrypted captures: TX-side keystream mirror ----------------------

E_SCK = bytes(range(0xA0, 0xAA))        # 80-bit key
E_SCK2 = bytes(range(0x31, 0x3B))
E_CCKID = 7
E_CCKID2 = 9
E_CARRIER = 3710                        # testpdu sysinfo defaults
E_LA = 1234


def _enc_keystore(ksg=1, keys=None):
    keys = keys if keys is not None else [(E_CCKID, E_SCK)]
    lines = [f"network mcc {MCC} mnc {MNC} ksg_type {ksg} "
             f"security_class 2"]
    for num, k in keys:
        lines.append(f"key mcc {MCC} mnc {MNC} addr 0 key_type 1 "
                     f"key_num {num} key {k.hex().upper()}")
    return "\n".join(lines) + "\n"


def _tx_keystream(ksg, key_bytes, time, nbits, hn=-1):
    """The keystream the RX will derive at `time` (TX-side mirror of
    reference generate_keystream, tetra_crypto.c:158-203)."""
    from tetra_tpu.crypto.crypto import (CryptoState, TetraKey,
                                         TetraNetinfo, generate_keystream)
    ni = TetraNetinfo(mcc=MCC, mnc=MNC, ksg_type=ksg, security_class=2)
    key = TetraKey(index=0, mcc=MCC, mnc=MNC, key_type=1, key_num=0,
                   addr=0, key=key_bytes, network_info=ni)
    tcs = CryptoState(mcc=MCC, mnc=MNC, cc=CC, cn=E_CARRIER, la=E_LA,
                      hn=hn)
    ks = generate_keystream(tcs, key, time, nbits)
    assert ks is not None
    return ks


def _encrypt_pdu(pdu, time, ksg, key_bytes, hn=-1, skip=0,
                 enc_at=slice(4, 6), off=None, end=None):
    """Set encryption_mode=1 and XOR the ciphertext range with the
    keystream the RX will generate (incl. a 216-bit skip for
    second-half-slot blocks)."""
    from tetra_tpu.umac import mac_pdu
    pdu = np.array(pdu)
    if enc_at is not None:
        pdu[enc_at] = [0, 1]
    if off is None:
        off = mac_pdu.decode_resource(pdu).bit_len
    if end is None:
        end = mac_pdu.decode_resource(pdu).macpdu_length * 8
    ks = _tx_keystream(ksg, key_bytes, time, skip + (end - off), hn=hn)
    pdu[off:end] ^= ks[skip:]
    return pdu.astype(np.int8)


def _t(tn, fn, mn):
    from tetra_tpu.tdma import TdmaTime
    return TdmaTime(tn=tn, fn=fn, mn=mn)


class TestEncryptedParity:
    """Keystore-fed differential against the compiled reference: IV
    packing from TDMA time, TB5->TEA keystream assembly, MAC-element
    decrypt ordering, CCK/SCK selection on SYSINFO change, the 216-bit
    second-half-slot skip, and wrong-key negatives
    (reference tetra_crypto.c:148-252, 416-452)."""

    def _stream(self, slot_pdus, ksg=1, cck_id=E_CCKID, hyperframe=0,
                syncs=2, garbage=731, fn0=2, mn0=3, seed=0):
        rng = np.random.default_rng(seed)
        aach = testpdu.make_access_assign_bits()
        si = testpdu.make_sysinfo_pdu(cck_id=cck_id,
                                      hyperframe=hyperframe)
        stream = [rng.integers(0, 2, garbage).astype(np.uint8)]
        for _ in range(syncs):
            stream.append(np.asarray(tx.make_sync_burst(
                testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC, tn=1,
                                      fn=fn0, mn=mn0),
                si, aach, jnp.uint32(INIT)), np.uint8))
        for pdu in slot_pdus:
            stream.append(np.asarray(tx.make_schf_burst(
                pdu, aach, jnp.uint32(INIT)), np.uint8))
        stream.append(np.zeros(640, np.uint8))
        return np.concatenate(stream)

    @pytest.mark.parametrize("ksg", [1, 2, 3])
    def test_encrypted_resource_all_ksgs(self, ref_rx_full_bin, tmp_path,
                                         ksg):
        """TEA1/2/3-encrypted MAC-RESOURCE: the oracle and our plane
        must select the same SCK, derive the same IV/ECK, decrypt to
        the same plaintext and parse the same D-SETUP."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdus = [_encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x700 + k, sdu_bits=sdu,
                                      fill=False),
            _t(tn=2 + k, fn=2, mn=3), ksg, E_SCK) for k in range(3)]
        ref = assert_upper_parity(self._stream(pdus, ksg=ksg),
                                  ref_rx_full_bin, tmp_path,
                                  keystore=_enc_keystore(ksg=ksg))
        assert sum(e[0] == "DECRYPT" for e in ref) == 3
        assert sum(e[0] == "RESOURCE" and e[2] for e in ref) == 3
        assert sum(e[0] == "TLSDU" and e[2] == "D-SETUP" for e in ref) == 3
        assert sum(e[0] == "CCK_SET" for e in ref) >= 1

    def test_encrypted_hyperframe_iv(self, ref_rx_full_bin, tmp_path):
        """A SYSINFO carrying the hyperframe number (cck flag 0) sets
        tcs->hn, which enters every subsequent IV (tea_build_iv hn<<13)
        — pinned via the DECRYPT event's hn and the decrypt result."""
        HN = 1234
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        aach = testpdu.make_access_assign_bits()
        rng = np.random.default_rng(5)
        sb = lambda si: np.asarray(tx.make_sync_burst(
            testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC, tn=1, fn=2,
                                  mn=3),
            si, aach, jnp.uint32(INIT)), np.uint8)
        enc = _encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x711, sdu_bits=sdu,
                                      fill=False),
            _t(tn=2, fn=2, mn=3), 1, E_SCK, hn=HN)
        stream = np.concatenate([
            rng.integers(0, 2, 501).astype(np.uint8),
            sb(testpdu.make_sysinfo_pdu(cck_id=E_CCKID)),   # alignment
            sb(testpdu.make_sysinfo_pdu(cck_id=E_CCKID)),   # selects SCK
            sb(testpdu.make_sysinfo_pdu(hyperframe=HN)),    # sets hn
            np.asarray(tx.make_schf_burst(enc, aach, jnp.uint32(INIT)),
                       np.uint8),
            np.zeros(640, np.uint8)])
        ref = assert_upper_parity(stream, ref_rx_full_bin, tmp_path,
                                  keystore=_enc_keystore())
        decs = [e for e in ref if e[0] == "DECRYPT"]
        assert len(decs) == 1 and decs[0][3] == HN
        assert sum(e[0] == "TLSDU" and e[2] == "D-SETUP" for e in ref) == 1

    def test_wrong_key_garbage_parity(self, ref_rx_full_bin, tmp_path):
        """With the wrong key the decrypt 'succeeds' into garbage; the
        garbage must still walk IDENTICALLY through LLC/MLE in both
        receivers (and no D-SETUP may parse out of it)."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdus = [_encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x720 + k, sdu_bits=sdu,
                                      fill=False),
            _t(tn=2 + k, fn=2, mn=3), 1, E_SCK) for k in range(2)]
        ref = assert_upper_parity(
            self._stream(pdus, seed=9), ref_rx_full_bin, tmp_path,
            keystore=_enc_keystore(keys=[(E_CCKID, bytes(10))]))
        assert sum(e[0] == "DECRYPT" for e in ref) == 2
        assert not any(e[0] == "TLSDU" and e[2] == "D-SETUP" for e in ref)

    def test_cck_change_on_sysinfo(self, ref_rx_full_bin, tmp_path):
        """A mid-stream SYSINFO advertising a different CCK id must
        re-select the key (update_current_cck) in both receivers; the
        DECRYPT events pin which key index decrypted which slot."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        aach = testpdu.make_access_assign_bits()
        rng = np.random.default_rng(6)
        sb = lambda cid: np.asarray(tx.make_sync_burst(
            testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC, tn=1, fn=2,
                                  mn=3),
            testpdu.make_sysinfo_pdu(cck_id=cid), aach,
            jnp.uint32(INIT)), np.uint8)
        schf = lambda p: np.asarray(tx.make_schf_burst(
            p, aach, jnp.uint32(INIT)), np.uint8)
        enc1 = _encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x731, sdu_bits=sdu,
                                      fill=False),
            _t(tn=2, fn=2, mn=3), 1, E_SCK)
        # after the third sync re-declares tn=1, the next slot is tn=2
        enc2 = _encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x732, sdu_bits=sdu,
                                      fill=False),
            _t(tn=2, fn=2, mn=3), 1, E_SCK2)
        stream = np.concatenate([
            rng.integers(0, 2, 301).astype(np.uint8),
            sb(E_CCKID), sb(E_CCKID), schf(enc1),
            sb(E_CCKID2), schf(enc2),
            np.zeros(640, np.uint8)])
        ref = assert_upper_parity(
            stream, ref_rx_full_bin, tmp_path,
            keystore=_enc_keystore(keys=[(E_CCKID, E_SCK),
                                         (E_CCKID2, E_SCK2)]))
        decs = [e for e in ref if e[0] == "DECRYPT"]
        assert [d[2] for d in decs] == [0, 1]   # key index changed
        assert sum(e[0] == "CCK_SET" for e in ref) >= 2
        assert sum(e[0] == "TLSDU" and e[2] == "D-SETUP" for e in ref) == 2

    def test_encrypted_frag_chain(self, ref_rx_full_bin, tmp_path):
        """Encrypted FRAG-START + MAC-END: the fragslot stores the key,
        each fragment decrypts with its own slot's IV, and the
        reassembled TL-SDU parses identically."""
        from tests.test_fragmentation import make_start_frag, make_mac_end
        from tests.test_fragmentation import make_null_schf
        rng = np.random.default_rng(0)
        tl_sdu = np.concatenate([testpdu.make_mle_cmce_dsetup(),
                                 np.tile([1, 0, 1, 1, 0, 0], 40)])
        llc = testpdu.make_bl_udata(tl_sdu)
        start_plain, _ = make_start_frag(0x777, llc[: 268 - 43])
        end_plain = make_mac_end(llc[268 - 43:])
        # START at tn=2/fn=1; END on the same TN of the next frame
        start_enc = _encrypt_pdu(start_plain, _t(tn=2, fn=1, mn=1), 1,
                                 E_SCK, end=268)
        end_enc = _encrypt_pdu(end_plain, _t(tn=2, fn=2, mn=1), 1,
                               E_SCK, enc_at=None, off=13)
        aach = testpdu.make_access_assign_bits()
        si = testpdu.make_sysinfo_pdu(cck_id=E_CCKID)
        sync = lambda fn: testpdu.make_sync_pdu(cc=CC, tn=1, fn=fn, mn=1,
                                                mcc=MCC, mnc=MNC)
        schf = lambda p: np.asarray(tx.make_schf_burst(
            p, aach, jnp.uint32(INIT)), np.uint8)
        sb = lambda fn: np.asarray(tx.make_sync_burst(
            sync(fn), si, aach, jnp.uint32(INIT)), np.uint8)
        stream = [np.random.default_rng(0).integers(0, 2, 97)
                  .astype(np.uint8),
                  sb(1), sb(1), schf(start_enc),
                  schf(make_null_schf()), schf(make_null_schf()),
                  sb(2), schf(end_enc),
                  np.zeros(640, np.uint8)]
        ref = assert_upper_parity(np.concatenate(stream), ref_rx_full_bin,
                                  tmp_path, keystore=_enc_keystore())
        kinds = [e[0] for e in ref]
        assert "FRAG_START" in kinds and "FRAG_END" in kinds
        assert sum(e[0] == "DECRYPT" for e in ref) == 2
        assert sum(e[0] == "TLSDU" and e[2] == "D-SETUP" for e in ref) == 1

    def test_second_half_slot_216_skip(self, ref_rx_full_bin, tmp_path):
        """Encrypted RESOURCE PDUs in BOTH half-slot blocks of an NDB
        burst: block 2 must skip 216 keystream bits
        (tetra_crypto.c:228-234); both receivers must emit the skip and
        decrypt to parseable plaintext."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        t = _t(tn=2, fn=2, mn=3)    # both blocks share the slot time
        blk1 = _encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x741, sdu_bits=sdu,
                                      total_len=124, fill=False),
            t, 1, E_SCK)
        blk2 = _encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x742, sdu_bits=sdu,
                                      total_len=124, fill=False),
            t, 1, E_SCK, skip=216)
        aach = testpdu.make_access_assign_bits()
        si = testpdu.make_sysinfo_pdu(cck_id=E_CCKID)
        rng = np.random.default_rng(2)
        sb = np.asarray(tx.make_sync_burst(
            testpdu.make_sync_pdu(mcc=MCC, mnc=MNC, cc=CC, tn=1, fn=2,
                                  mn=3),
            si, aach, jnp.uint32(INIT)), np.uint8)
        stream = np.concatenate([
            rng.integers(0, 2, 431).astype(np.uint8), sb, sb,
            np.asarray(tx.make_ndb_burst(blk1, blk2, aach,
                                         jnp.uint32(INIT)), np.uint8),
            np.zeros(640, np.uint8)])
        ref = assert_upper_parity(stream, ref_rx_full_bin, tmp_path,
                                  keystore=_enc_keystore())
        assert sum(e[0] == "SKIP216" for e in ref) == 1
        assert sum(e[0] == "DECRYPT" for e in ref) == 2
        assert sum(e[0] == "TLSDU" and e[2] == "D-SETUP" for e in ref) == 2

    def test_frame18_aach_parity(self, ref_rx_full_bin, tmp_path):
        """Frame-18 ACCESS-ASSIGN decode variants: slots in FN 18 parse
        the AACH with the frame-18 field layout in both receivers."""
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdus = [testpdu.make_resource_pdu(ssi=0x750 + i, sdu_bits=sdu)
                for i in range(4)]
        ref = assert_upper_parity(
            self._stream(pdus, fn0=18, seed=4), ref_rx_full_bin,
            tmp_path, keystore=None)
        assert sum(e[0] == "AACH" for e in ref) >= 4

    def test_three_way_native_plane_agrees(self, ref_rx_full_bin,
                                           tmp_path):
        """Close the triangle: the SAME encrypted capture that is
        ref-parity-checked above also runs through the NATIVE control
        plane (fastpath + umac_exec.cpp), whose event stream must equal
        the Python plane's — so the native executor's crypto
        integration is transitively pinned to the compiled reference."""
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        from tetra_tpu.rx_multi import MultiCarrierReceiver
        from tetra_tpu.umac.native_exec import EV, normalize_py_events
        ksg = 2
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdus = [_encrypt_pdu(
            testpdu.make_resource_pdu(ssi=0x700 + k, sdu_bits=sdu,
                                      fill=False),
            _t(tn=2 + k, fn=2, mn=3), ksg, E_SCK) for k in range(3)]
        bits = self._stream(pdus, ksg=ksg)
        ks = _enc_keystore(ksg=ksg)
        # leg 1: compiled reference vs Python plane (field-level)
        ref = assert_upper_parity(bits, ref_rx_full_bin, tmp_path,
                                  keystore=ks)
        assert sum(e[0] == "DECRYPT" for e in ref) == 3
        # leg 2: Python plane vs native executor on the same capture
        ks_path = os.path.join(str(tmp_path), "keys.txt")
        batch = bits[None]
        py = MultiCarrierReceiver(np.zeros(1, np.float32), fs=25e3,
                                  keystore_path=ks_path)
        nat = MultiCarrierReceiver(np.zeros(1, np.float32), fs=25e3,
                                   keystore_path=ks_path,
                                   control_plane="native")
        py.process_bits(batch)
        nat.process_bits(batch)
        p, q = py.carriers[0], nat.carriers[0]
        assert (p.stats.bursts, p.stats.crc_ok, p.stats.crc_wrong) == \
            (q.stats.bursts, q.stats.crc_ok, q.stats.crc_wrong)
        skip = (EV.CRC, EV.TRAFFIC, EV.TMV, EV.MISS)
        got = [(k, a, b, c, d)
               for evd in nat.native_events
               for k, a, b, c, d in zip(evd["kind"], evd["a"], evd["b"],
                                        evd["c"], evd["d"])
               if k not in skip]
        want = [(k, a, b, c, d)
                for _, k, a, b, c, d in
                normalize_py_events(0, py.carriers[0].umac.events)
                if k not in skip]
        # the python UMAC event list lacks the LLC/TL events the native
        # stream has inline; compare the RESOURCE/decrypt-bearing subset
        want_res = [t for t in want if t[0] == EV.RESOURCE]
        got_res = [t for t in got if t[0] == EV.RESOURCE]
        assert got_res == want_res
        # decrypted flag cleared on all three encrypted RESOURCEs
        assert sum(1 for t in got_res if (t[4] & 1) == 0 and t[1] == 1) == 3

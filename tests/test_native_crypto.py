"""Native control-plane decryption vs the Python plane (SURVEY §3.4).

The C++ executor decrypts encrypted MAC elements on its hot path
(native/umac_exec.cpp + the batch TEA core in tetra_native.cpp),
mirroring reference src/tetra_crypto.c:211-252: CCK selection from
SYNC/SYSINFO state, TB5 ECK derivation, IV from the walk's own TDMA
clock. These tests run identical encrypted captures through both
planes — full receivers, keystore loaded — and require the event
streams to agree, including the wrong-key negative and encrypted
fragment reassembly (START-FRAG / MAC-FRAG / MAC-END each decrypted
with its own slot-time keystream).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.rx_multi import MultiCarrierReceiver
from tetra_tpu.tdma import TdmaTime
from tetra_tpu.umac import native_exec, mac_pdu
from tetra_tpu.umac.native_exec import EV, normalize_py_events
from tetra_tpu.crypto.crypto import (CryptoState, CryptoDatabase, TetraKey,
                                     TetraNetinfo, decrypt_mac_element)
from tetra_tpu.utils.bits import uint_to_bits
from tests.test_fragmentation import (make_start_frag, make_mac_end,
                                      make_null_schf)
from tests.test_native_umac import make_mac_frag

pytestmark = pytest.mark.skipif(not native_exec.available(),
                                reason="native library unavailable")

MCC, MNC, CC = 262, 42, 1
INIT = scramb_get_init(MCC, MNC, CC)
SCK = bytes(range(0xA0, 0xAA))
CCK_ID = 7
MAIN_CARRIER = 3710
LA = 1234


def _keystore_text(key: bytes = SCK) -> str:
    return (f"network mcc {MCC} mnc {MNC} ksg_type 1 security_class 2\n"
            f"key mcc {MCC} mnc {MNC} addr 0 key_type 1 key_num {CCK_ID} "
            f"key {key.hex().upper()}\n")


def _tx_tcs():
    """TX-side mirror of the receiver's crypto state (used only to
    produce ciphertext; the receivers derive their own)."""
    tcs = CryptoState()
    ni = TetraNetinfo(mcc=MCC, mnc=MNC, ksg_type=1, security_class=2)
    key = TetraKey(index=0, mcc=MCC, mnc=MNC, key_type=1, key_num=CCK_ID,
                   addr=0, key=SCK, network_info=ni)
    tcs.db = CryptoDatabase(keys=[key], nets=[ni])
    tcs.mcc, tcs.mnc, tcs.cc = MCC, MNC, CC
    tcs.cn, tcs.la = MAIN_CARRIER, LA
    tcs.cck_id = CCK_ID
    tcs.hn = -1
    return tcs, key


def _cck_sysinfo():
    si = np.array(testpdu.make_sysinfo_pdu(main_carrier=MAIN_CARRIER, la=LA))
    si[43] = 1                       # CCK flag
    si[44:60] = uint_to_bits(CCK_ID, 16)
    return si


def _encrypt(pdu, time, offset):
    """XOR-encrypt pdu[offset:] with the slot keystream (TEA XOR is an
    involution, so the receiver-side decryptor doubles as encryptor)."""
    tcs, key = _tx_tcs()
    enc, ok = decrypt_mac_element(tcs, key, np.array(pdu), time, offset)
    assert ok
    return enc.astype(np.int8)


def _sync_burst(fn, mn=3):
    sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=fn, mn=mn, mcc=MCC, mnc=MNC)
    return np.asarray(tx.make_sync_burst(sync, _cck_sysinfo(),
                                         testpdu.make_access_assign_bits(),
                                         jnp.uint32(INIT)), np.uint8)


def _schf(pdu):
    return np.asarray(tx.make_schf_burst(np.asarray(pdu, np.int8),
                                         testpdu.make_access_assign_bits(),
                                         jnp.uint32(INIT)), np.uint8)


def _enc_resource_stream(ssi, seed):
    """garbage | SYNC fn=2 | SYNC fn=2 | SCH/F(encrypted RESOURCE)."""
    rng = np.random.default_rng(seed)
    pdu = np.array(testpdu.make_resource_pdu(
        ssi=ssi, sdu_bits=testpdu.make_bl_udata(
            testpdu.make_mle_cmce_dsetup()), fill=False))
    pdu[4:6] = [0, 1]                # encryption_mode = 1
    rsd = mac_pdu.decode_resource(pdu)
    enc = np.array(pdu)
    # ciphertext spans [bit_len, macpdu_length*8) at slot time tn=2
    enc[: rsd.macpdu_length * 8] = _encrypt(
        pdu[: rsd.macpdu_length * 8], TdmaTime(tn=2, fn=2, mn=3),
        rsd.bit_len)
    # trailing null bursts: the batched synchroniser confirms a slot
    # when it sees the NEXT training sequence, so the burst under test
    # needs successors in the stream
    return np.concatenate([rng.integers(0, 2, 113).astype(np.uint8),
                           _sync_burst(2), _sync_burst(2), _schf(enc),
                           _schf(make_null_schf()), _schf(make_null_schf())])


def _enc_frag_stream(seed):
    """Encrypted fragmentation: START-FRAG (frame 1 tn=2), MAC-FRAG
    (frame 2 tn=2), MAC-END (frame 3 tn=2), each encrypted with its own
    slot-time keystream."""
    rng = np.random.default_rng(seed)
    tl_sdu = np.concatenate([testpdu.make_mle_cmce_dsetup(),
                             rng.integers(0, 2, 300).astype(np.int8)])
    llc = testpdu.make_bl_udata(tl_sdu)
    first = 268 - 43                 # SDU bits in the START-FRAG slot
    mid = 100                        # SDU bits in the MAC-FRAG slot
    sf, hdr_len = make_start_frag(0x777, llc[:first])
    assert hdr_len == 43
    sf = np.array(sf)
    sf[4:6] = [0, 1]                 # encryption_mode = 1
    sf = _encrypt(sf, TdmaTime(tn=2, fn=1, mn=1), hdr_len)

    frag = np.array(make_mac_frag(llc[first:first + mid]))
    # MAC-FRAG decrypts from offset 4 (upper_mac.py rx_macfrag)
    frag = _encrypt(frag, TdmaTime(tn=2, fn=2, mn=1), 4)

    end = np.array(make_mac_end(llc[first + mid:]))
    # MAC-END: headers = 2+1+1+1+6+1+1 = 13 bits (no grant), decrypt
    # runs over the length-trimmed body only (upper_mac.py rx_macend)
    li8 = -(-(13 + len(llc) - first - mid) // 8) * 8
    end[:li8] = _encrypt(end[:li8], TdmaTime(tn=2, fn=3, mn=1), 13)

    def frame(fn, tn2_pdu):
        sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=fn, mn=1,
                                     mcc=MCC, mnc=MNC)
        return [np.asarray(tx.make_sync_burst(
                    sync, _cck_sysinfo(), testpdu.make_access_assign_bits(),
                    jnp.uint32(INIT)), np.uint8),
                _schf(tn2_pdu), _schf(make_null_schf()),
                _schf(make_null_schf())]

    # a throwaway leading SYNC burst absorbs the misaligned slots the
    # initial acquisition can emit (same shape as test_fragmentation's
    # stream), so frame 1's slots decode cleanly
    parts = [rng.integers(0, 2, 97).astype(np.uint8),
             _sync_burst(1, mn=1)]
    parts += frame(1, sf)
    parts += frame(2, frag)
    parts += frame(3, end)
    # successors so the last frame's slots all get confirmed
    parts += [_schf(make_null_schf()), _schf(make_null_schf())]
    return np.concatenate(parts)


def _run_both(batch, keystore_path):
    """Run identical batches through the Python and native planes with
    the same keystore; return (python receiver, native receiver)."""
    B = batch.shape[0]
    py = MultiCarrierReceiver(np.zeros(B, np.float32), fs=25e3 * B,
                              keystore_path=keystore_path)
    # route the per-carrier LLC events into UpperMac.events so the
    # Python stream interleaves MAC + LLC events in dispatch order,
    # exactly like the native executor's single stream
    for rx in py.carriers:
        sink = rx.umac.events
        rx.llc.event_cb = sink.append

        def tl_cb(bits, length, _sink=sink):
            from tests.test_native_umac import _mle_pdut
            pdisc, pdut = _mle_pdut(np.asarray(bits[:length]))
            _sink.append(("TLSDU", pdisc, pdut, length))

        rx.llc.tl_sdu_cb = tl_cb
    nat = MultiCarrierReceiver(np.zeros(B, np.float32), fs=25e3 * B,
                               keystore_path=keystore_path,
                               control_plane="native")
    py.process_bits(batch)
    nat.process_bits(batch)
    return py, nat


def _diff_events(py, nat, B):
    """Full-stream differential: every event kind the Python plane can
    express (MAC + LLC + MLE) must match the native stream."""
    # TMV/CRC/TRAFFIC are lower-MAC bookkeeping the Python UpperMac
    # event list does not carry; everything else must match exactly.
    skip = (EV.TMV, EV.CRC, EV.TRAFFIC)
    got = {c: [] for c in range(B)}
    for evd in nat.native_events:
        for i in range(len(evd["kind"])):
            k = int(evd["kind"][i])
            if k in skip:
                continue
            got[int(evd["carrier"][i])].append(
                (int(evd["carrier"][i]), k, int(evd["a"][i]),
                 int(evd["b"][i]), int(evd["c"][i]),
                 # TLSDU d is a per-chunk payload-arena ref on the
                 # native plane (no Python counterpart); the payload
                 # BYTES are differential-tested in test_rx_multi
                 0 if k == EV.TLSDU else int(evd["d"][i])))
    for c in range(B):
        want = [t for t in normalize_py_events(c, py.carriers[c].umac.events)
                if t[1] not in skip]
        assert got[c] == want, (c, got[c][:8], want[:8])
    return got


class TestNativeDecryption:
    def test_encrypted_resource_differential(self, tmp_path):
        ks = tmp_path / "keys.txt"
        ks.write_text(_keystore_text())
        rows = [_enc_resource_stream(0x1234, 3),
                _enc_resource_stream(0x4321, 4)]
        n = min(len(r) for r in rows)
        batch = np.stack([r[:n] for r in rows])
        py, nat = _run_both(batch, str(ks))
        got = _diff_events(py, nat, 2)
        # the RESOURCE decrypted on the native plane: encrypted flag
        # cleared (d bit 0) and the CMCE D-SETUP payload parsed
        for c, ssi in ((0, 0x1234), (1, 0x4321)):
            res = [t for t in got[c] if t[1] == EV.RESOURCE and t[2] == 1]
            assert any(t[3] == ssi and (t[5] & 1) == 0 for t in res), res
            assert any(t[1] == EV.TLSDU and t[2] == 2 for t in got[c])

    def test_wrong_key_differential(self, tmp_path):
        """Wrong key: both planes decrypt to the same garbage and agree
        event for event; no CMCE D-SETUP parse emerges."""
        ks = tmp_path / "keys.txt"
        ks.write_text(_keystore_text(bytes(10)))
        batch = _enc_resource_stream(0x1234, 5)[None]
        py, nat = _run_both(batch, str(ks))
        got = _diff_events(py, nat, 1)
        dsetups = [t for t in got[0]
                   if t[1] == EV.TLSDU and t[2] == 2 and t[3] == 0]
        assert dsetups == []

    def test_no_keystore_stays_encrypted(self):
        """Without a keystore the native plane reports the element
        encrypted (d bit 0 set) and skips the payload, like before."""
        batch = _enc_resource_stream(0x1234, 6)[None]
        py, nat = _run_both(batch, None)
        got = _diff_events(py, nat, 1)
        res = [t for t in got[0] if t[1] == EV.RESOURCE and t[2] == 1]
        assert res and all((t[5] & 1) == 1 for t in res), res
        assert not any(t[1] == EV.TLSDU for t in got[0])

    def test_second_half_216_skip_differential(self):
        """Encrypted RESOURCE in a second-half block (blk_num=2, lchan
        UNKNOWN/SCH_HD) uses the 216-bit keystream skip
        (tetra_crypto.c:211-252). Record-level differential: Python
        UpperMac with a prepopulated crypto state vs the native plane
        bootstrapped through one SYNC walk slot — same SB2/NDB2
        records, same decisions, correct plaintext."""
        from tests.test_native_umac import _mle_pdut
        from tetra_tpu.llc.llc import LlcState
        from tetra_tpu.umac.upper_mac import UpperMac, LogicalChannel

        tcs, key = _tx_tcs()
        # build the second-half ciphertext: skip=216 via the encryptor
        pdu = np.array(testpdu.make_resource_pdu(
            ssi=0x2222, sdu_bits=testpdu.make_bl_udata(
                testpdu.make_mle_cmce_dsetup()), fill=False, total_len=124))
        pdu[4:6] = [0, 1]
        rsd = mac_pdu.decode_resource(pdu)
        t = TdmaTime(tn=2, fn=2, mn=3)
        enc, ok = decrypt_mac_element(
            tcs, key, pdu[: rsd.macpdu_length * 8], t, rsd.bit_len,
            lchan_second_half=True)
        assert ok
        full = np.array(pdu, np.uint8)
        full[: rsd.macpdu_length * 8] = enc

        # python plane: UpperMac with the same crypto state
        sink = []

        def tl_cb(bits, length, _s=sink):
            pdisc, pdut = _mle_pdut(np.asarray(bits[:length]))
            _s.append(("TLSDU", pdisc, pdut, length))

        llc = LlcState(log=lambda *a, **k: None, tl_sdu_cb=tl_cb)
        llc.event_cb = sink.append
        # resolve network + CCK like the receiver's SYNC handling would
        tcs.update_current_network(MCC, MNC)
        um = UpperMac(crypto_state=tcs, llc=llc, log=lambda *a, **k: None)
        um.events = sink
        um.rx_slot(full, LogicalChannel.UNKNOWN, True, t, blk_num=2)
        py = normalize_py_events(0, sink)

        # native plane: keystore + crypto state via one SYNC walk slot
        # whose SB2 carries the CCK SYSINFO, then the same record
        cp = native_exec.NativeControlPlane(1)
        cp.set_keys(tcs.db)
        sb1 = np.asarray(testpdu.make_sync_pdu(
            cc=CC, tn=1, fn=2, mn=3, mcc=MCC, mnc=MNC), np.uint8)
        bbk = np.asarray(testpdu.make_access_assign_bits(), np.uint8)
        boot = np.concatenate([sb1, bbk, _cck_sysinfo()]).astype(np.uint8)
        wrec = np.asarray([[0, 0, 1, 2, 3, 1, 1, 0, len(sb1), len(sb1),
                            14, len(sb1) + 14, 124, 0]], np.int32)
        cp.walk(boot, wrec)
        rec = np.asarray([[0, LogicalChannel.UNKNOWN, 1, 2, t.tn, t.fn,
                           t.mn, 0, len(full)]], np.int32)
        ev = cp.process(full, rec)
        nat = cp.events_as_tuples(ev)
        cp.close()

        # decrypted: CMCE D-SETUP parses on both planes identically
        assert any(k == EV.TLSDU and a == 2 for _, k, a, b, c, d in nat)
        res = [t_ for t_ in nat if t_[1] == EV.RESOURCE]
        assert res and (res[0][5] & 1) == 0, res
        assert py == nat, (py, nat)

    def test_encrypted_fragment_differential(self, tmp_path):
        """START-FRAG/MAC-FRAG/MAC-END each decrypt with their own
        slot-time keystream; the reassembled TL-SDU parses as CMCE."""
        ks = tmp_path / "keys.txt"
        ks.write_text(_keystore_text())
        batch = _enc_frag_stream(7)[None]
        py, nat = _run_both(batch, str(ks))
        got = _diff_events(py, nat, 1)
        kinds = [t[1] for t in got[0]]
        assert EV.FRAG_START in kinds
        assert EV.FRAG_CONT in kinds
        assert EV.FRAG_END in kinds
        assert any(t[1] == EV.TLSDU and t[2] == 2 for t in got[0])


class TestKeystreamCache:
    def test_cache_invalidates_on_la_change(self, tmp_path):
        """Two encrypted slots with the SAME TDMA time but a SYSINFO
        LA change between them: the second ECK differs, so the native
        plane's per-carrier keystream cache must regenerate (a stale
        hit would decrypt slot 2 into garbage)."""
        LA2 = 777
        rng = np.random.default_rng(31)

        def enc_slot(ssi, la):
            pdu = np.array(testpdu.make_resource_pdu(
                ssi=ssi, sdu_bits=testpdu.make_bl_udata(
                    testpdu.make_mle_cmce_dsetup()), fill=False))
            pdu[4:6] = [0, 1]
            rsd = mac_pdu.decode_resource(pdu)
            tcs, key = _tx_tcs()
            tcs.la = la
            enc = np.array(pdu)
            enc[: rsd.macpdu_length * 8], ok = decrypt_mac_element(
                tcs, key, pdu[: rsd.macpdu_length * 8],
                TdmaTime(tn=2, fn=2, mn=3), rsd.bit_len)
            assert ok
            return enc.astype(np.int8)

        def sb(la):
            si = np.array(testpdu.make_sysinfo_pdu(
                main_carrier=MAIN_CARRIER, la=la))
            si[43] = 1
            si[44:60] = uint_to_bits(CCK_ID, 16)
            sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=2, mn=3,
                                         mcc=MCC, mnc=MNC)
            return np.asarray(tx.make_sync_burst(
                sync, si, testpdu.make_access_assign_bits(),
                jnp.uint32(INIT)), np.uint8)

        # both enc slots sit at tn=2/fn=2/mn=3 (each sync re-declares
        # the same time), with only LA differing
        stream = np.concatenate([
            rng.integers(0, 2, 113).astype(np.uint8),
            sb(LA), sb(LA), _schf(enc_slot(0x801, LA)),
            sb(LA2), _schf(enc_slot(0x802, LA2)),
            _schf(make_null_schf()), _schf(make_null_schf())])
        ks = tmp_path / "keys.txt"
        ks.write_text(_keystore_text())
        py, nat = _run_both(stream[None], str(ks))
        got = _diff_events(py, nat, 1)
        dsetups = [t for t in got[0] if t[1] == EV.TLSDU and t[2] == 2]
        assert len(dsetups) == 2    # BOTH slots decrypted and parsed

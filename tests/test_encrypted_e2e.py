"""Encrypted-traffic path end to end (SURVEY §3.4).

A class-2 network capture with a TEA1-encrypted MAC-RESOURCE: the
receiver must select the SCK from the keystore via SYSINFO's CCK id,
derive ECK with TB5 from SYNC/SYSINFO state, build the IV from TDMA
time, generate the TEA1 keystream and decrypt the MAC element before
LLC/MLE parsing."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.rx import TetraReceiver
from tetra_tpu.tdma import TdmaTime
from tetra_tpu.crypto.crypto import (CryptoState, CryptoDatabase, TetraKey,
                                     TetraNetinfo, generate_keystream,
                                     load_keystore)
from tetra_tpu.umac import mac_pdu

MCC, MNC, CC = 262, 42, 1
INIT = scramb_get_init(MCC, MNC, CC)
SCK = bytes(range(0xA0, 0xAA))          # 80-bit key
CCK_ID = 7
MAIN_CARRIER = 3710
LA = 1234


def _keystore_text():
    return (f"# test keystore\n"
            f"network mcc {MCC} mnc {MNC} ksg_type 1 security_class 2\n"
            f"key mcc {MCC} mnc {MNC} addr 0 key_type 1 key_num {CCK_ID} "
            f"key {SCK.hex().upper()}\n")


def _tx_crypto_state():
    """Mirror of the receiver's crypto state at the encrypted slot."""
    tcs = CryptoState()
    ni = TetraNetinfo(mcc=MCC, mnc=MNC, ksg_type=1, security_class=2)
    key = TetraKey(index=0, mcc=MCC, mnc=MNC, key_type=1, key_num=CCK_ID,
                   addr=0, key=SCK, network_info=ni)
    tcs.db = CryptoDatabase(keys=[key], nets=[ni])
    tcs.mcc, tcs.mnc, tcs.cc = MCC, MNC, CC
    tcs.cn, tcs.la = MAIN_CARRIER, LA
    tcs.cck_id = CCK_ID
    tcs.hn = -1          # SYSINFO carries cck_id, so hn stays unset
    return tcs, key


class TestEncryptedPath:
    def test_decrypts_resource(self, tmp_path):
        ks_file = tmp_path / "keys.txt"
        ks_file.write_text(_keystore_text())

        # plaintext MAC-RESOURCE with encryption_mode=1 and a CMCE payload
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdu = testpdu.make_resource_pdu(ssi=0x1234, sdu_bits=sdu, fill=False)
        # set encryption_mode = 1 (bits 4:6 of the header)
        pdu = np.array(pdu)
        pdu[4:6] = [0, 1]
        rsd = mac_pdu.decode_resource(pdu)
        offset = rsd.bit_len
        pdu_bits = rsd.macpdu_length * 8

        # encrypt [offset, pdu_bits) with the keystream the rx will derive;
        # time at the SCH/F slot: SYNC declares tn=1/fn=2/mn=3 for its own
        # slot, the next slot is tn=2 (tetra_burst_sync.c add_tn)
        tcs, key = _tx_crypto_state()
        slot_time = TdmaTime(tn=2, fn=2, mn=3)
        ks = generate_keystream(tcs, key, slot_time, pdu_bits - offset)
        assert ks is not None
        enc = pdu.copy()
        enc[offset:pdu_bits] ^= ks

        sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=2, mn=3, mcc=MCC, mnc=MNC)
        sysinfo = testpdu.make_sysinfo_pdu(main_carrier=MAIN_CARRIER, la=LA)
        # SYSINFO must advertise the CCK id (cck_valid_no_hf = 1)
        sysinfo = np.array(sysinfo)
        sysinfo[43] = 1                       # CCK flag (bit 43 of the PDU)
        from tetra_tpu.utils.bits import uint_to_bits
        sysinfo[44:60] = uint_to_bits(CCK_ID, 16)
        aach = testpdu.make_access_assign_bits()

        rng = np.random.default_rng(3)
        stream = [rng.integers(0, 2, 113).astype(np.uint8)]
        stream.append(tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(INIT)))
        stream.append(tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(INIT)))
        stream.append(tx.make_schf_burst(enc.astype(np.int8), aach, jnp.uint32(INIT)))
        bits = np.concatenate(stream)

        lines = []
        rx = TetraReceiver(keystore_path=str(ks_file),
                           log=lambda *a: lines.append(" ".join(str(x) for x in a)))
        rx.process_bits(bits)

        # keystore + SYSINFO selected the SCK
        assert rx.tcs.cck is not None and rx.tcs.cck.key_num == CCK_ID
        assert rx.tcs.cck_id == CCK_ID
        # the RESOURCE decrypted and the payload parsed through LLC/MLE
        assert any("DECRYPTED" in ln for ln in lines)
        ssis = [e[1].addr.ssi for e in rx.umac.events
                if e[0] == "RESOURCE" and e[1].addr.type == 1]
        assert 0x1234 in ssis
        assert any("D-SETUP" in ln for ln in lines)

    def test_wrong_key_stays_encrypted(self, tmp_path):
        ks_file = tmp_path / "keys.txt"
        wrong = bytes(10)
        ks_file.write_text(_keystore_text().replace(SCK.hex().upper(),
                                                    wrong.hex().upper()))
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        pdu = np.array(testpdu.make_resource_pdu(ssi=0x1234, sdu_bits=sdu,
                                                 fill=False))
        pdu[4:6] = [0, 1]
        rsd = mac_pdu.decode_resource(pdu)
        tcs, key = _tx_crypto_state()
        ks = generate_keystream(tcs, key, TdmaTime(tn=2, fn=2, mn=3),
                                rsd.macpdu_length * 8 - rsd.bit_len)
        enc = pdu.copy()
        enc[rsd.bit_len:rsd.macpdu_length * 8] ^= ks

        sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=2, mn=3, mcc=MCC, mnc=MNC)
        sysinfo = np.array(testpdu.make_sysinfo_pdu(main_carrier=MAIN_CARRIER,
                                                    la=LA))
        sysinfo[43] = 1
        from tetra_tpu.utils.bits import uint_to_bits
        sysinfo[44:60] = uint_to_bits(CCK_ID, 16)
        aach = testpdu.make_access_assign_bits()
        rng = np.random.default_rng(4)
        stream = [rng.integers(0, 2, 113).astype(np.uint8),
                  tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(INIT)),
                  tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(INIT)),
                  tx.make_schf_burst(enc.astype(np.int8), aach, jnp.uint32(INIT))]
        lines = []
        rx = TetraReceiver(keystore_path=str(ks_file),
                           log=lambda *a: lines.append(" ".join(str(x) for x in a)))
        rx.process_bits(np.concatenate(stream))
        # decrypt ran with the wrong key -> garbage payload, but the D-SETUP
        # line must not appear from a correct parse
        assert not any("D-SETUP" in ln and "TL-SDU(CMCE)" in ln for ln in lines)

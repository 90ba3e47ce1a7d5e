"""Coverage for the remaining receive paths: NDB half-slot bursts through
the receiver, SCH/HU block FEC, and the MAC-SUPPL (D-BLCK) branch."""
import numpy as np
import jax.numpy as jnp

from tetra_tpu import tx, testpdu
from tetra_tpu.testpdu import BitBuilder
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.lmac import pipeline
from tetra_tpu.rx import TetraReceiver
from tetra_tpu.umac.upper_mac import UpperMac, LogicalChannel
from tetra_tpu.tdma import TdmaTime

MCC, MNC, CC = 262, 42, 1
INIT = scramb_get_init(MCC, MNC, CC)


class TestNdbThroughReceiver:
    def test_half_slot_resources_decoded(self):
        """A NORM-2 (p training sequence) burst carries two independent
        124-bit blocks; both MAC-RESOURCEs must decode
        (tetra_burst.c:354-361 path)."""
        rng = np.random.default_rng(0)
        blk1 = testpdu.make_resource_pdu(ssi=0xAAA, total_len=124)
        blk2 = testpdu.make_resource_pdu(ssi=0xBBB, total_len=124)
        aach = testpdu.make_access_assign_bits()
        sync = testpdu.make_sync_pdu(cc=CC, tn=1, fn=1, mn=1, mcc=MCC, mnc=MNC)
        stream = [rng.integers(0, 2, 119).astype(np.uint8),
                  tx.make_sync_burst(sync, testpdu.make_sysinfo_pdu(), aach,
                                     jnp.uint32(INIT)),
                  tx.make_sync_burst(sync, testpdu.make_sysinfo_pdu(), aach,
                                     jnp.uint32(INIT)),
                  tx.make_ndb_burst(blk1, blk2, aach, jnp.uint32(INIT))]
        rx = TetraReceiver(log=lambda *a: None)
        rx.process_bits(np.concatenate(stream))
        ssis = [e[1].addr.ssi for e in rx.umac.events
                if e[0] == "RESOURCE" and e[1].addr.type == 1]
        assert 0xAAA in ssis and 0xBBB in ssis
        assert rx.stats.crc_wrong == 0


class TestSchHu:
    def test_block_fec_loopback(self):
        """SCH/HU (uplink half-slot) block FEC: 92 type-1 bits through the
        112/168 chain (block params tetra_lower_mac.c:82-89)."""
        rng = np.random.default_rng(1)
        type1 = rng.integers(0, 2, size=(6, 92)).astype(np.int8)
        t5 = tx.encode_block("SCH_HU", jnp.asarray(type1), jnp.uint32(INIT))
        assert t5.shape == (6, 168)
        res = pipeline.decode_block("SCH_HU", t5, jnp.uint32(INIT))
        assert np.asarray(res.crc_ok).all()
        np.testing.assert_array_equal(np.asarray(res.type1), type1)


class TestSuppl:
    def test_mac_d_blck(self):
        """MAC-SUPPL (D-BLCK) dispatch (tetra_upper_mac.c:388-415): header
        is 18 bits (+8 if slot granting), then the TM-SDU."""
        got = []
        umac = UpperMac(log=lambda *a: None)
        umac.llc.tl_sdu_cb = lambda b, n: got.append(np.asarray(b)[:n])
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        bits = (BitBuilder()
                .u(3, 2)       # MAC PDU type: SUPPL
                .u(0, 15)      # header fields (opaque to the reference too)
                .u(0, 1)       # slot granting absent (bit 17)
                .raw(sdu)
                .pad_to(124, 0).array(124))
        umac.rx_slot(bits, LogicalChannel.SCH_F, True, TdmaTime(mn=1, fn=1, tn=1))
        assert len(got) == 1
        # BL-UDATA strips its 4-bit header; payload follows
        expect = sdu[4:]
        np.testing.assert_array_equal(got[0][:len(expect)], expect)

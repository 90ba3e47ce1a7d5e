"""MAC fragment reassembly end to end (reference tetra_upper_mac.c:286-385).

A TM-SDU too long for one slot is sent as MAC-RESOURCE(START_FRAG) in
timeslot 2 of frame N and completed by MAC-END in timeslot 2 of frame
N+1 (fragslots are keyed by timeslot number); the reassembled TL-SDU
must reach the MLE.
"""
import numpy as np
import jax.numpy as jnp

from tetra_tpu import tx, testpdu
from tetra_tpu.testpdu import BitBuilder
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.rx import TetraReceiver

MCC, MNC, CC = 262, 42, 1
INIT = scramb_get_init(MCC, MNC, CC)


def make_start_frag(ssi, sdu_first, total_len=268):
    """MAC-RESOURCE with length indicator 0x3F (start of fragmentation);
    the SDU fills the remainder of the slot (reference rx_resrc
    MACPDU_LEN_START_FRAG path)."""
    b = (BitBuilder()
         .u(0, 2)      # RESOURCE
         .u(0, 1)      # no fill bits
         .u(0, 1).u(0, 2).u(0, 1)
         .u(0x3F, 6)   # length: start frag
         .u(1, 3)      # addr type SSI
         .u(ssi, 24)
         .u(0, 1).u(0, 1).u(0, 1)
         .raw(sdu_first))
    return b.pad_to(total_len, 0).array(total_len), len(b.bits) - len(sdu_first)


def make_mac_end(sdu_rest, total_len=268):
    """MAC-END carrying the final fragment (tetra_upper_mac.c:323-385)."""
    hdr_bits = 2 + 1 + 1 + 1 + 6 + 1 + 1
    body_len = hdr_bits + len(sdu_rest)
    li = -(-body_len // 8)
    b = (BitBuilder()
         .u(1, 2)      # FRAG/END discriminator (01 -> value 1)
         .u(1, 1)      # MAC-END
         .u(0, 1)      # no fill bits
         .u(0, 1)      # grant position
         .u(li, 6)     # length indicator (octets)
         .u(0, 1)      # slot granting absent
         .u(0, 1)      # chan alloc absent
         .raw(sdu_rest))
    b.pad_to(li * 8, 0)
    # terminate the slot with a null resource PDU
    b.u(0, 2).u(0, 1).u(0, 1).u(0, 2).u(0, 1).u(0, 6).u(0, 3)
    return b.pad_to(total_len, 0).array(total_len)


def make_null_schf(total_len=268):
    return (BitBuilder().u(0, 2).u(0, 1).u(0, 1).u(0, 2).u(0, 1)
            .u(0, 6).u(0, 3).pad_to(total_len, 0).array(total_len))


class TestFragmentation:
    def test_reassembly_across_frames(self):
        # long TL-SDU: CMCE D-SETUP + payload, wrapped in BL-UDATA
        rng = np.random.default_rng(0)
        tl_sdu = np.concatenate([testpdu.make_mle_cmce_dsetup(),
                                 rng.integers(0, 2, 320).astype(np.int8)])
        llc = testpdu.make_bl_udata(tl_sdu)
        # split: first chunk fills the start-frag slot's SDU space
        start_slot, hdr_len = make_start_frag(0x777, llc[: 268 - 43])
        first_len = 268 - 43
        end_slot = make_mac_end(llc[first_len:])

        aach = testpdu.make_access_assign_bits()
        sync1 = testpdu.make_sync_pdu(cc=CC, tn=1, fn=1, mn=1, mcc=MCC, mnc=MNC)
        sync2 = testpdu.make_sync_pdu(cc=CC, tn=1, fn=2, mn=1, mcc=MCC, mnc=MNC)
        stream = [rng.integers(0, 2, 97).astype(np.uint8)]
        stream.append(tx.make_sync_burst(sync1, testpdu.make_sysinfo_pdu(),
                                         aach, jnp.uint32(INIT)))
        # frame 1: tn1 sync, tn2 start-frag, tn3/tn4 nulls
        stream.append(tx.make_sync_burst(sync1, testpdu.make_sysinfo_pdu(),
                                         aach, jnp.uint32(INIT)))
        stream.append(tx.make_schf_burst(start_slot, aach, jnp.uint32(INIT)))
        stream.append(tx.make_schf_burst(make_null_schf(), aach, jnp.uint32(INIT)))
        stream.append(tx.make_schf_burst(make_null_schf(), aach, jnp.uint32(INIT)))
        # frame 2: tn1 sync, tn2 MAC-END
        stream.append(tx.make_sync_burst(sync2, testpdu.make_sysinfo_pdu(),
                                         aach, jnp.uint32(INIT)))
        stream.append(tx.make_schf_burst(end_slot, aach, jnp.uint32(INIT)))
        bits = np.concatenate(stream)

        lines = []
        rx = TetraReceiver(log=lambda *a: lines.append(" ".join(str(x) for x in a)))
        rx.process_bits(bits)

        assert any("FRAG-START slot=2" in ln for ln in lines), lines[-20:]
        assert any("FRAG-END slot=2" in ln for ln in lines)
        # the reassembled TL-SDU reached the MLE as one piece
        assert any("TM-SDU(BL-UDATA)" in ln for ln in lines)
        dsetup = [ln for ln in lines if "D-SETUP" in ln]
        assert dsetup, "reassembled CMCE PDU not decoded"
        # payload length: full TL-SDU made it through
        tl_lines = [ln for ln in lines if "TL-SDU(CMCE)" in ln]
        assert tl_lines and str(len(tl_sdu)) not in ("",)
        bits_str = "".join(str(int(b)) for b in tl_sdu)
        assert any(bits_str in ln for ln in tl_lines), "TL-SDU bits mismatch"

"""Native control-plane executor vs the Python semantics reference.

Both planes consume identical per-slot type-1 bit records; their
structured event streams must match exactly — including fragment
reassembly, age-out, LLC defrag misses, FCS verdicts and the multi-PDU
slot loop (reference tetra_upper_mac.c:457-547 semantics).
"""
import numpy as np
import pytest

from tetra_tpu import testpdu
from tetra_tpu.testpdu import BitBuilder
from tetra_tpu.tdma import TdmaTime
from tetra_tpu.umac.upper_mac import UpperMac, LogicalChannel
from tetra_tpu.umac import native_exec
from tetra_tpu.llc.llc import LlcState
from tetra_tpu.utils.bits import bits_to_uint

pytestmark = pytest.mark.skipif(not native_exec.available(),
                                reason="native library unavailable")


def make_mac_frag(body, total_len=268):
    """MAC-FRAG continuation (tetra_upper_mac.c:286-321)."""
    return (BitBuilder().u(1, 2).u(0, 1).u(0, 1).raw(body)
            .pad_to(total_len, 0).array(total_len))


def make_suppl(sdu, total_len=268):
    """MAC-D-BLCK: 17 header bits, slot-granting flag at 17."""
    return (BitBuilder().u(3, 2).u(0, 15).u(0, 1).raw(sdu)
            .pad_to(total_len, 0).array(total_len))


def make_al_udata(ufinal, ns, ss, payload):
    return (BitBuilder().u(10, 4).u(1 if ufinal else 0, 1)
            .u(ns, 8).u(ss, 8).raw(payload).array())


def _mle_pdut(bits):
    pdisc = bits_to_uint(bits[0:3])
    if pdisc == 1:
        return pdisc, bits_to_uint(bits[3:7])
    if pdisc == 2:
        return pdisc, bits_to_uint(bits[3:8])
    if pdisc == 4:
        return pdisc, bits_to_uint(bits[3:7])
    if pdisc == 5:
        return pdisc, bits_to_uint(bits[3:6])
    return pdisc, -1


def _mixed_records(n_carriers=3):
    """(records, per-record bits) covering every control-plane path."""
    rng = np.random.default_rng(11)
    recs = []  # (carrier, lchan, crc_ok, blk_num, tn, fn, mn, bits)
    SCHF = LogicalChannel.SCH_F

    def add(c, lchan, bits, crc=1, tn=1, fn=1, mn=1, blk=0):
        recs.append((c, lchan, crc, blk, tn, fn, mn,
                     np.asarray(bits, np.uint8)))

    for c in range(n_carriers):
        # AACH variants incl. frame-18
        add(c, LogicalChannel.AACH, testpdu.make_access_assign_bits(0, 5, 9))
        add(c, LogicalChannel.AACH, testpdu.make_access_assign_bits(3, 7, 1))
        add(c, LogicalChannel.AACH, testpdu.make_access_assign_bits(1, 2, 3),
            fn=18)
        # SYSINFO broadcast
        add(c, LogicalChannel.BNCH, testpdu.make_sysinfo_pdu(
            main_carrier=1000 + c, la=100 + c), tn=1, fn=2)
        # RESOURCE with a BL-UDATA MLE payload (multi-PDU: null PDU after)
        add(c, SCHF, testpdu.make_resource_pdu(
            ssi=0x1000 + c,
            sdu_bits=testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())))
        # RESOURCE whose stripped SDU is a runt (fill-bit marker only)
        add(c, SCHF, testpdu.make_resource_pdu(ssi=0x2000 + c,
                                               sdu_bits=[1], fill=True))
        # CRC-failed slot (logged, not parsed)
        add(c, SCHF, rng.integers(0, 2, 268), crc=0)
        # fragmentation: START in tn=2, CONT, END (tn=2)
        from tests.test_fragmentation import make_start_frag, make_mac_end
        part1 = rng.integers(0, 2, 80).astype(np.uint8)
        part2 = rng.integers(0, 2, 60).astype(np.uint8)
        bl = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        sf, _ = make_start_frag(0x3000 + c, np.concatenate([bl[:40]]))
        add(c, SCHF, sf, tn=2, fn=3)
        add(c, SCHF, make_mac_frag(part1), tn=2, fn=4)
        add(c, SCHF, make_mac_end(np.concatenate([bl[40:], part2[:0]])),
            tn=2, fn=5)
        # MAC-END without a start (cleanup path)
        add(c, SCHF, make_mac_end(part2), tn=3, fn=5)
        # start a fragment, then age it out over 7 frame-18 AACHs
        sf2, _ = make_start_frag(0x4000 + c, part1)
        add(c, SCHF, sf2, tn=4, fn=6)
        for k in range(7):
            add(c, LogicalChannel.AACH,
                testpdu.make_access_assign_bits(0, 0, 0), tn=1, fn=18,
                mn=7 + k)
        # advanced-link defrag: UDATA chain + UFINAL, then an SS miss
        p1 = rng.integers(0, 2, 24).astype(np.uint8)
        p2 = rng.integers(0, 2, 24).astype(np.uint8)
        mle = testpdu.make_mle_cmce_dsetup()
        add(c, SCHF, testpdu.make_resource_pdu(
            ssi=0x5000 + c, sdu_bits=make_al_udata(0, ns=5, ss=1, payload=p1)))
        add(c, SCHF, testpdu.make_resource_pdu(
            ssi=0x5000 + c, sdu_bits=make_al_udata(0, ns=5, ss=2, payload=p2)))
        add(c, SCHF, testpdu.make_resource_pdu(
            ssi=0x5000 + c, sdu_bits=make_al_udata(1, ns=5, ss=4, payload=mle)))
        # SUPPLEMENTARY MAC-D-BLCK
        add(c, SCHF, make_suppl(testpdu.make_bl_udata(mle)))
        # strange lchan
        add(c, LogicalChannel.TCH, rng.integers(0, 2, 268), tn=2)
    # interleave carriers (keeping each carrier's own order) to
    # exercise per-carrier state isolation
    per_c = {}
    for r in recs:
        per_c.setdefault(r[0], []).append(r)
    seq = [c for c in per_c for _ in per_c[c]]
    rng.shuffle(seq)
    inter = []
    idx = {c: 0 for c in per_c}
    for c in seq:
        inter.append(per_c[c][idx[c]])
        idx[c] += 1
    return inter


def _run_python(records, n_carriers):
    events = []
    sinks = []
    for c in range(n_carriers):
        sink = []
        sinks.append(sink)

        def tl_cb(bits, length, _sink=sink):
            pdisc, pdut = _mle_pdut(np.asarray(bits[:length]))
            _sink.append(("TLSDU", pdisc, pdut, length))

        llc = LlcState(log=lambda *a, **k: None, tl_sdu_cb=tl_cb)
        llc.event_cb = sink.append
        um = UpperMac(llc=llc, log=lambda *a, **k: None)
        um.events = sink
        sinks[c] = sink
        events.append((um, sink))
    out = []
    for (c, lchan, crc, blk, tn, fn, mn, bits) in records:
        um, sink = events[c]
        t = TdmaTime(tn=tn, fn=fn, mn=mn)
        um.rx_slot(bits, lchan, bool(crc), t, blk_num=blk)
        out.extend(native_exec.normalize_py_events(c, sink))
        sink.clear()
    return out


def _run_native(records, n_carriers):
    cp = native_exec.NativeControlPlane(n_carriers)
    all_bits = np.concatenate([r[7] for r in records]).astype(np.uint8)
    recs = np.zeros((len(records), 9), np.int32)
    off = 0
    for i, (c, lchan, crc, blk, tn, fn, mn, bits) in enumerate(records):
        recs[i] = (c, lchan, crc, blk, tn, fn, mn, off, len(bits))
        off += len(bits)
    ev = cp.process(all_bits, recs)
    out = cp.events_as_tuples(ev)
    cp.close()
    return out


class TestNativeControlPlane:
    def test_differential_mixed_stream(self):
        records = _mixed_records(n_carriers=3)
        py = _run_python(records, 3)
        nat = _run_native(records, 3)
        assert len(py) == len(nat), (len(py), len(nat), py[:5], nat[:5])
        for i, (p, n) in enumerate(zip(py, nat)):
            assert p == n, (i, native_exec.EV.NAMES.get(p[1]), p, n,
                            py[max(0, i - 3):i + 2], nat[max(0, i - 3):i + 2])

    def test_differential_random_garbage(self):
        """Arbitrary garbage slots: both planes must agree (and not
        crash) on undefined inputs."""
        rng = np.random.default_rng(99)
        records = []
        for i in range(120):
            c = i % 2
            lchan = int(rng.choice([LogicalChannel.SCH_F,
                                    LogicalChannel.UNKNOWN,
                                    LogicalChannel.SCH_HD,
                                    LogicalChannel.AACH]))
            nbits = 14 if lchan == LogicalChannel.AACH else int(
                rng.choice([124, 268]))
            records.append((c, lchan, 1, 0, int(rng.integers(0, 5)),
                            int(rng.integers(1, 19)), 1,
                            rng.integers(0, 2, nbits).astype(np.uint8)))
        py = _run_python(records, 2)
        nat = _run_native(records, 2)
        assert len(py) == len(nat), (len(py), len(nat))
        for i, (p, n) in enumerate(zip(py, nat)):
            assert p == n, (i, native_exec.EV.NAMES.get(p[1]), p, n)

    def test_state_isolation_across_batches(self):
        """Carrier state (fragslots) persists across process() calls."""
        from tests.test_fragmentation import make_start_frag, make_mac_end
        rng = np.random.default_rng(5)
        bl = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        sf, _ = make_start_frag(0x77, bl[:40])
        end = make_mac_end(bl[40:])
        cp = native_exec.NativeControlPlane(1)
        r1 = np.asarray([[0, LogicalChannel.SCH_F, 1, 0, 2, 3, 1, 0,
                          len(sf)]], np.int32)
        ev1 = cp.process(np.asarray(sf, np.uint8), r1)
        r2 = np.asarray([[0, LogicalChannel.SCH_F, 1, 0, 2, 4, 1, 0,
                          len(end)]], np.int32)
        ev2 = cp.process(np.asarray(end, np.uint8), r2)
        kinds2 = list(ev2["kind"])
        assert native_exec.EV.FRAG_END in kinds2
        assert native_exec.EV.TLSDU in kinds2
        cp.close()

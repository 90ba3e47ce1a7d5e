"""Fast native chunk pipeline vs the Python control plane.

The fused single-fetch path (tetra_tpu/fastpath.py + walk2 in
native/umac_exec.cpp) must reproduce the Python plane's per-carrier
stats, TDMA clocks, cell identity and scrambling state on hostile
streams — corrupted bits, relocks, uneven chunking, one-deep
pipelining (final=False) — exactly like the per-slot host bookkeeping
it replaces (reference loop: src/tetra-rx.c:82-95)."""
import numpy as np
import pytest

from tetra_tpu.rx_multi import MultiCarrierReceiver
from tetra_tpu.umac import native_exec
from tests.test_sync_vec import make_stream

pytestmark = pytest.mark.skipif(not native_exec.available(),
                                reason="native library unavailable")


def _feed(mrx, batch, cuts, final_each):
    for k in range(len(cuts) - 1):
        last = k == len(cuts) - 2
        mrx.process_bits(batch[:, cuts[k]:cuts[k + 1]],
                         final=final_each or last)
    return mrx


def _compare(batch, cuts):
    B = batch.shape[0]
    py = MultiCarrierReceiver(np.zeros(B, np.float32), fs=25e3 * B)
    nat = MultiCarrierReceiver(np.zeros(B, np.float32), fs=25e3 * B,
                               control_plane="native")
    _feed(py, batch, cuts, final_each=True)
    _feed(nat, batch, cuts, final_each=False)   # exercise pipelining
    for c in range(B):
        p, q = py.carriers[c], nat.carriers[c]
        assert (p.stats.bursts, p.stats.slots, p.stats.crc_ok,
                p.stats.crc_wrong) == \
            (q.stats.bursts, q.stats.slots, q.stats.crc_ok,
             q.stats.crc_wrong), f"carrier {c} stats"
        assert (p.time.tn, p.time.fn, p.time.mn) == \
            (q.time.tn, q.time.fn, q.time.mn), f"carrier {c} time"
        assert (p.colour_code, p.mcc, p.mnc, p.scramb_init) == \
            (q.colour_code, q.mcc, q.mnc, q.scramb_init), f"carrier {c}"
    return py, nat


class TestFastPathDifferential:
    def test_corrupted_streams_chunked(self):
        """Relocking, bit-flipped streams over uneven chunk cuts."""
        B = 8
        streams = [make_stream(7000 + b, n_frames=4) for b in range(B)]
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])
        rng = np.random.default_rng(3)
        cuts = np.sort(rng.choice(np.arange(1, L), size=5, replace=False))
        cuts = np.concatenate([[0], cuts, [L]])
        _compare(batch, cuts)

    def test_event_stream_matches_python_umac(self):
        """The walk2 event stream (RESOURCE/TMSDU/TLSDU/...) equals the
        normalised Python UpperMac events per carrier on clean frames
        with LLC payloads."""
        from tests.test_rx_multi import _capture_bits
        from tetra_tpu.umac.native_exec import EV, normalize_py_events
        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b))
        batch = np.stack([bits_a[:n], bits_b[:n]])
        cuts = [0, n // 3, n]
        py, nat = _compare(batch, cuts)
        # UpperMac.events records MAC-layer events; the LLC/MLE-level
        # kinds (TMSDU/TLSDU/...) are differential-tested against the
        # instrumented plane in tests/test_native_umac.py
        skip = (EV.CRC, EV.TRAFFIC, EV.TMV, EV.TMSDU, EV.TMSDU_RUNT,
                EV.TLSDU, EV.MISS)
        got = {c: [] for c in range(2)}
        for evd in nat.native_events:
            for i in range(len(evd["kind"])):
                k = int(evd["kind"][i])
                if k in skip:
                    continue
                got[int(evd["carrier"][i])].append(
                    (int(evd["carrier"][i]), k, int(evd["a"][i]),
                     int(evd["b"][i]), int(evd["c"][i]),
                     int(evd["d"][i])))
        for c in range(2):
            want = [t for t in
                    normalize_py_events(c, py.carriers[c].umac.events)
                    if t[1] not in skip]
            assert got[c] == want, f"carrier {c}"
            assert sum(t[1] == EV.RESOURCE for t in want) >= 4

    def test_budget_overflow_falls_back(self, monkeypatch):
        """When a chunk emits more slots than the global row budget G,
        collect must transparently re-run it with the sufficient
        B*maxs budget — same decisions, no drops. Forced here by
        shrinking the budget slack below the real emit rate."""
        from tetra_tpu import fastpath
        monkeypatch.setattr(fastpath, "G_SLACK", -2)
        B = 4
        streams = [make_stream(9100 + b, n_frames=3) for b in range(B)]
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])
        cuts = [0, L // 2, L]
        py, nat = _compare(batch, cuts)
        assert sum(p.stats.crc_ok for p in py.carriers) > 0

    def test_single_vs_many_chunks_identical(self):
        """Chunking must not change native decode results."""
        B = 4
        streams = [make_stream(8100 + b, n_frames=3) for b in range(B)]
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])

        one = MultiCarrierReceiver(np.zeros(B, np.float32), fs=25e3 * B,
                                   control_plane="native")
        one.process_bits(batch)
        many = MultiCarrierReceiver(np.zeros(B, np.float32), fs=25e3 * B,
                                    control_plane="native")
        _feed(many, batch, [0, 100, 101, 1000, 2500, L], final_each=False)
        for c in range(B):
            a, b = one.carriers[c], many.carriers[c]
            assert (a.stats.bursts, a.stats.crc_ok, a.stats.crc_wrong) \
                == (b.stats.bursts, b.stats.crc_ok, b.stats.crc_wrong), c
            assert (a.time.tn, a.time.fn, a.time.mn) \
                == (b.time.tn, b.time.fn, b.time.mn), c
        def flat(events):
            # TRAFFIC's `a` is a per-chunk device row index (it only
            # keys the t4 gather), so it is chunking-dependent by design
            from tetra_tpu.umac.native_exec import EV
            return [(int(c), int(k), -1 if k == EV.TRAFFIC else int(a),
                     int(b))
                    for e in events
                    for c, k, a, b in zip(e["carrier"], e["kind"],
                                          e["a"], e["b"])]
        ev_one = flat(one.native_events)
        ev_many = flat(many.native_events)
        # same multiset of events per carrier (chunk boundaries only
        # reorder ACROSS carriers, never within one)
        for c in range(B):
            assert [t for t in ev_one if t[0] == c] == \
                [t for t in ev_many if t[0] == c], c

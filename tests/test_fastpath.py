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

    def test_budget_overflow_with_traffic(self, monkeypatch, tmp_path):
        """An overflowed chunk containing traffic slots must dump the
        SAME payload bytes as the Python plane: after the re-run the
        returned slot_refs must index the re-run's wider t4 arrays
        (regression: collect used to discard them, so _collect_walk
        gathered traffic payloads from the truncated originals with
        silently clamped indices)."""
        import jax.numpy as jnp
        from tetra_tpu import fastpath, tx, testpdu
        from tetra_tpu.ops.scramble import scramb_get_init
        from tetra_tpu.phy.burst import build_norm_c_d_burst
        monkeypatch.setattr(fastpath, "G_SLACK", -4)
        reran = []
        orig = fastpath.FastChunkPipeline._overflow_rerun
        monkeypatch.setattr(
            fastpath.FastChunkPipeline, "_overflow_rerun",
            lambda self, h: (reran.append(1), orig(self, h))[1])

        init = scramb_get_init(262, 42, 1)
        sync = testpdu.make_sync_pdu(cc=1, mcc=262, mnc=42)
        sysinfo = testpdu.make_sysinfo_pdu()
        aach = testpdu.make_access_assign_bits()
        aach_t = testpdu.make_access_assign_bits(hdr=3, f1=5, f2=0)
        bb_t5 = np.asarray(tx.encode_bbk(jnp.asarray(aach_t),
                                         jnp.uint32(init)))
        sync_b = np.asarray(tx.make_sync_burst(
            sync, sysinfo, aach, jnp.uint32(init)), np.uint8)

        def schf(ssi):
            sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
            pdu = testpdu.make_resource_pdu(ssi=ssi, sdu_bits=sdu)
            return np.asarray(tx.make_schf_burst(pdu, aach,
                                                 jnp.uint32(init)),
                              np.uint8)

        from tetra_tpu.ops.scramble import scramb_bits

        def traffic(rng):
            t5 = np.asarray(scramb_bits(
                jnp.uint32(init),
                jnp.asarray(rng.integers(0, 2, 432).astype(np.int8))))
            return np.asarray(build_norm_c_d_burst(
                t5[:216], bb_t5, t5[216:], False), np.uint8)

        # carriers 0..2 lock immediately and eat the shared global
        # budget; carrier 3's SYNC + traffic slot emit at the very end
        # of chunk 1, so its rows sit LAST in the carrier-major
        # compaction — beyond the truncated budget and therefore
        # beyond the original t4 arrays' G rows.
        cut1 = 12 * 510
        B = 4
        streams = []
        for b in range(3):
            rng = np.random.default_rng(4200 + b)
            parts = [np.zeros(127, np.uint8), sync_b, sync_b,
                     traffic(rng)]
            parts += [schf(0x100 * b + k) for k in range(14)]
            parts.append(np.zeros(640, np.uint8))
            streams.append(np.concatenate(parts))
        rng = np.random.default_rng(4203)
        prefix = cut1 - 3 * 510 - 700   # SYNCx2+traffic end 700 b early
        parts = [rng.integers(0, 2, prefix).astype(np.uint8),
                 sync_b, sync_b, traffic(rng)]
        parts += [schf(0x900 + k) for k in range(8)]
        parts.append(np.zeros(640, np.uint8))
        streams.append(np.concatenate(parts))
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])
        offs = np.zeros(B, np.float32)
        d_py, d_nat = tmp_path / "py", tmp_path / "nat"
        d_py.mkdir(); d_nat.mkdir()
        py = MultiCarrierReceiver(offs, fs=25e3 * B, dumpdir=str(d_py))
        nat = MultiCarrierReceiver(offs, fs=25e3 * B, dumpdir=str(d_nat),
                                   control_plane="native")
        cuts = [0, cut1, L]
        _feed(py, batch, cuts, final_each=True)
        _feed(nat, batch, cuts, final_each=False)
        assert reran, "stream no longer forces a budget overflow"
        for c in range(B):
            py_fs = sorted((d_py / f"carrier{c}").glob("traffic_*.out"))
            nat_fs = sorted((d_nat / f"carrier{c}").glob("traffic_*.out"))
            assert [f.name for f in py_fs] == [f.name for f in nat_fs], c
            assert py_fs, f"carrier {c}: no traffic dumps"
            for a, b in zip(py_fs, nat_fs):
                assert a.read_bytes() == b.read_bytes(), (c, a.name)

    def test_overflow_truncated_sync_corrects_carry(self, monkeypatch):
        """A scrambling-code-bearing SYNC row that lands BEYOND the
        global row budget must still update the carry consumed by an
        already-dispatched later chunk: collect's overflow re-run
        re-commits the corrected carry through that chunk (regression:
        the re-run's carry was discarded, so the dependent carrier
        descrambled the next chunk with a stale code and lost every
        slot to CRC failures)."""
        import jax.numpy as jnp
        from tetra_tpu import fastpath, tx, testpdu
        from tetra_tpu.ops.scramble import scramb_get_init
        monkeypatch.setattr(fastpath, "G_SLACK", -4)
        redispatched = []
        orig = fastpath.FastChunkPipeline._dispatch
        def spy(self, h, g_rows, scr_override=None):
            if scr_override is not None:
                redispatched.append(1)
            return orig(self, h, g_rows, scr_override)
        monkeypatch.setattr(fastpath.FastChunkPipeline, "_dispatch", spy)

        init = scramb_get_init(262, 42, 1)
        sync = testpdu.make_sync_pdu(cc=1, mcc=262, mnc=42)
        sysinfo = testpdu.make_sysinfo_pdu()
        aach = testpdu.make_access_assign_bits()
        sync_b = np.asarray(tx.make_sync_burst(
            sync, sysinfo, aach, jnp.uint32(init)), np.uint8)

        def schf(ssi):
            sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
            pdu = testpdu.make_resource_pdu(ssi=ssi, sdu_bits=sdu)
            return np.asarray(tx.make_schf_burst(pdu, aach,
                                                 jnp.uint32(init)),
                              np.uint8)

        # carriers 0..2 lock immediately and eat the shared global
        # budget; carrier 3's SYNC arrives at the very end of chunk 1,
        # so its rows sit LAST in the carrier-major compaction — beyond
        # the truncated budget. Chunk 2 is pure SCH/F for carrier 3,
        # decodable only with the cell code that SYNC carries.
        cut1 = 11 * 510          # chunk-1 length in bits
        B = 4
        n_schf = 16
        streams = []
        for b in range(3):
            parts = [np.zeros(127, np.uint8), sync_b, sync_b]
            parts += [schf(0x100 * b + k) for k in range(n_schf)]
            parts.append(np.zeros(640, np.uint8))
            streams.append(np.concatenate(parts))
        prefix = cut1 - 2 * 510 - 700    # SYNCs end 700 bits before cut
        parts = [np.random.default_rng(7).integers(0, 2, prefix)
                 .astype(np.uint8), sync_b, sync_b]
        parts += [schf(0x900 + k) for k in range(8)]
        parts.append(np.zeros(640, np.uint8))
        streams.append(np.concatenate(parts))
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])
        py, nat = _compare(batch, [0, cut1, L])
        assert redispatched, \
            "overflow no longer truncates a SYNC ahead of a dispatched chunk"
        assert py.carriers[3].stats.crc_ok >= 6

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


class TestMixedProtocolParity:
    def test_mixed_capture_native_matches_python(self, tmp_path):
        """The integrated benchmark's FULL protocol mix (NDB/SCH_HD
        pairs, stolen/STCH, traffic + voice slots, FRAG/END chains, a
        mid-stream relock, TEA1-encrypted carriers) must decode
        identically on both planes with ZERO CRC errors — the workload
        the mc_e2e_mixed number is recorded on."""
        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                             .parent.parent / "tools"))
        import bench_mc_e2e as B
        bits, n_enc = B.mixed_batch(8, 8, enc_frac=0.25)
        assert n_enc == 2
        ksf = tmp_path / "keys.txt"
        ksf.write_text(B.KEYSTORE)
        T = bits.shape[1]
        cuts = [0, T // 3, 2 * T // 3, T]

        def run(plane):
            mrx = MultiCarrierReceiver(
                np.zeros(8, np.float32), fs=2e5, control_plane=plane,
                keystore_path=str(ksf))
            _feed(mrx, bits, cuts, final_each=plane == "python")
            return mrx

        py, nat = run("python"), run("native")
        for c in range(8):
            p, q = py.carriers[c], nat.carriers[c]
            assert (p.stats.bursts, p.stats.slots, p.stats.crc_ok,
                    p.stats.crc_wrong) == \
                (q.stats.bursts, q.stats.slots, q.stats.crc_ok,
                 q.stats.crc_wrong), f"carrier {c}"
            assert p.stats.crc_wrong == 0, f"carrier {c}"
            assert (p.time.tn, p.time.fn, p.time.mn) == \
                (q.time.tn, q.time.fn, q.time.mn), f"carrier {c}"
            assert (p.colour_code, p.mcc, p.mnc, p.scramb_init) == \
                (q.colour_code, q.mcc, q.mnc, q.scramb_init), c
        # the mix actually exercised the protocol paths on both planes
        from tetra_tpu.umac.native_exec import EV
        kinds = np.concatenate([e["kind"] for e in nat.native_events])
        assert (kinds == EV.TRAFFIC).sum() > 0
        assert (kinds == EV.FRAG_END).sum() > 0
        assert (kinds == EV.TLSDU).sum() > 0
        # encrypted carriers decrypted: their RESOURCEs parse with the
        # encrypted flag cleared
        enc_cars = set(range(6, 8))
        res = [(int(c), int(d)) for e in nat.native_events
               for c, k, d in zip(e["carrier"], e["kind"], e["d"])
               if k == EV.RESOURCE and int(c) in enc_cars]
        assert res and all((d & 1) == 0 for _, d in res)


class TestShardedFastpath:
    """Carrier-sharded fused chunk program (fastpath._sharded_fused_chunk)
    vs the unsharded pipeline on the SAME capture: per-shard compaction
    with global carrier ids must reproduce the event stream bit for bit
    (the reference scales by one process chain per carrier,
    src/receiver1:8 — here one mesh shard per carrier group)."""

    def _events(self, mrx):
        from tetra_tpu.umac.native_exec import EV
        out = []
        for e in mrx.native_events:
            # EV_TRAFFIC's `a` is the slot_ref into the fetched t4
            # arrays — shard-stacked indexing differs by construction
            # (each ref is only meaningful against its own t4 layout),
            # so normalise it; everything else must be identical
            a = np.where(e["kind"] == EV.TRAFFIC, -1, e["a"])
            out.append(tuple(np.asarray(x).tolist() for x in
                             (e["kind"], e["carrier"], a, e["b"],
                              e["c"], e["d"])))
        return out

    def test_sharded_matches_unsharded_events(self):
        import jax
        from jax.sharding import Mesh
        B = 16
        streams = [make_stream(9100 + b, n_frames=4) for b in range(B)]
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])
        rng = np.random.default_rng(5)
        cuts = np.sort(rng.choice(np.arange(1, L), size=4, replace=False))
        cuts = np.concatenate([[0], cuts, [L]])
        mesh = Mesh(np.asarray(jax.devices()[:8]), ("car",))

        def run(m):
            mrx = MultiCarrierReceiver(np.zeros(B, np.float32),
                                       fs=25e3 * B,
                                       control_plane="native", mesh=m)
            _feed(mrx, batch, cuts, final_each=False)
            return mrx

        ref, shd = run(None), run(mesh)
        assert shd._fast.shards == 8
        assert self._events(ref) == self._events(shd)
        for c in range(B):
            p, q = ref.carriers[c], shd.carriers[c]
            assert (p.stats.crc_ok, p.stats.crc_wrong, p.stats.bursts) \
                == (q.stats.crc_ok, q.stats.crc_wrong, q.stats.bursts), c
            assert (p.time.tn, p.time.fn, p.time.mn, p.scramb_init) == \
                (q.time.tn, q.time.fn, q.time.mn, q.scramb_init), c
        assert sum(r.stats.crc_ok for r in ref.carriers) > 0

    def test_sharded_overflow_rerun(self, monkeypatch):
        """A shard-local budget overflow must transparently re-run with
        the sufficient budget and still match the unsharded events."""
        import jax
        from tetra_tpu import fastpath
        from jax.sharding import Mesh
        B = 8
        streams = [make_stream(9400 + b, n_frames=3) for b in range(B)]
        L = min(len(s) for s in streams)
        batch = np.stack([s[:L] for s in streams])
        monkeypatch.setattr(fastpath, "G_SLACK", 0)
        mesh = Mesh(np.asarray(jax.devices()[:4]), ("car",))

        def run(m):
            mrx = MultiCarrierReceiver(np.zeros(B, np.float32),
                                       fs=25e3 * B,
                                       control_plane="native", mesh=m)
            # one giant chunk after a tiny one: the backlog drain makes
            # emitted slots exceed the mean-rate budget
            mrx.process_bits(batch[:, :700], final=False)
            mrx.process_bits(batch[:, 700:], final=True)
            return mrx

        ref, shd = run(None), run(mesh)
        assert self._events(ref) == self._events(shd)


class TestProdConfig:
    def test_prod_wideband_mixed_encrypted(self, tmp_path):
        """THE production configuration at CI scale: the FULL protocol
        mix (incl. TEA1-encrypted carriers) synthesized into ONE
        companded 4+4-bit wideband RF capture (iq4c, 1 byte per complex
        sample), channelized on device through the PFB and decoded by
        the native plane — the workload the mc_e2e_prod number is
        recorded on. Per-carrier stats must MATCH the pre-demodulated
        bits path exactly (the capture starts and ends in noise, so
        demod edge transients never clip a burst) with zero CRC
        errors."""
        import sys, pathlib
        sys.path.insert(0, str(pathlib.Path(__file__).resolve()
                             .parent.parent / "tools"))
        import bench_mc_e2e as B
        from tetra_tpu.phy import dqpsk, channelizer
        from tetra_tpu.io import stream as stream_mod
        bits, n_enc = B.mixed_batch(8, 8, enc_frac=0.25)
        assert n_enc == 2
        ksf = tmp_path / "keys.txt"
        ksf.write_text(B.KEYSTORE)
        base = dqpsk.modulate(bits, sps=2)
        wide = channelizer.synthesize_wideband_fft(base, np.arange(8), 8)
        packed = stream_mod.quantize_iq4c(wide.real, wide.imag)

        mrx = MultiCarrierReceiver(
            [], fs=2e5, pfb_channels=np.arange(8, dtype=np.int32),
            n_chan=8, control_plane="native", keystore_path=str(ksf))
        half = len(packed) // 2
        mrx.process_iq4c(packed[:half], final=False)
        mrx.process_iq4c(packed[half:], final=True)

        ref = MultiCarrierReceiver(np.zeros(8, np.float32), fs=2e5,
                                   control_plane="native",
                                   keystore_path=str(ksf))
        T = bits.shape[1]
        ref.process_bits(bits[:, :T // 2], final=False)
        ref.process_bits(bits[:, T // 2:], final=True)

        for c in range(8):
            p, q = ref.carriers[c], mrx.carriers[c]
            assert (p.stats.bursts, p.stats.crc_ok, p.stats.crc_wrong) \
                == (q.stats.bursts, q.stats.crc_ok, q.stats.crc_wrong), c
            assert q.stats.crc_wrong == 0 and q.stats.crc_ok > 0, c
        from tetra_tpu.umac.native_exec import EV
        kinds = np.concatenate([e["kind"] for e in mrx.native_events])
        assert (kinds == EV.TRAFFIC).sum() > 0
        assert (kinds == EV.FRAG_END).sum() > 0
        assert (kinds == EV.TLSDU).sum() > 0

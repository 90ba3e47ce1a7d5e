"""Multi-carrier end-to-end: wideband IQ with two cells -> both decoded."""
import numpy as np
import jax.numpy as jnp

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.phy import dqpsk, channelizer
from tetra_tpu.rx_multi import MultiCarrierReceiver


def _capture_bits(mcc, mnc, cc, ssi_base, n_schf=3, seed=0):
    init = scramb_get_init(mcc, mnc, cc)
    rng = np.random.default_rng(seed)
    stream = [rng.integers(0, 2, size=127).astype(np.uint8)]
    sync = testpdu.make_sync_pdu(cc=cc, tn=1, fn=2, mn=3, mcc=mcc, mnc=mnc)
    sysinfo = testpdu.make_sysinfo_pdu()
    aach = testpdu.make_access_assign_bits()
    # two sync bursts: first is consumed by alignment
    stream.append(tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(init)))
    stream.append(tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(init)))
    for k in range(n_schf):
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        schf = testpdu.make_resource_pdu(ssi=ssi_base + k, sdu_bits=sdu)
        stream.append(tx.make_schf_burst(schf, aach, jnp.uint32(init)))
    # tail padding so modem edge transients don't clip the last burst
    stream.append(rng.integers(0, 2, size=128).astype(np.uint8))
    return np.concatenate(stream)


class TestMultiCarrier:
    def test_two_carriers_via_iq(self):
        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b)) & ~1  # whole dibit symbols
        bits = np.stack([bits_a[:n], bits_b[:n]])
        base = dqpsk.modulate(bits, sps=2)
        offsets = np.array([-25_000.0, 25_000.0], np.float32)
        wide = channelizer.synthesize_wideband(base, offsets, fs=144_000.0)

        mrx = MultiCarrierReceiver(offsets, fs=144_000.0)
        stats = mrx.process_iq(wide)

        assert len(stats) == 2
        rx_a, rx_b = mrx.carriers
        assert (rx_a.mcc, rx_a.mnc, rx_a.colour_code) == (262, 42, 1)
        assert (rx_b.mcc, rx_b.mnc, rx_b.colour_code) == (901, 7, 5)
        for rx, base_ssi in ((rx_a, 0x200), (rx_b, 0x300)):
            ssis = [e[1].addr.ssi for e in rx.umac.events
                    if e[0] == "RESOURCE" and e[1].addr.type == 1]
            assert ssis == [base_ssi, base_ssi + 1, base_ssi + 2]
        assert all(s.crc_wrong == 0 for s in stats)


class TestPfbMultiCarrier:
    def test_two_carriers_via_pfb(self):
        """Same two-cell scenario routed through the polyphase filterbank
        front end (channels on the PFB grid)."""
        from tetra_tpu.rx_multi import MultiCarrierReceiver
        n_chan = 8
        fs = n_chan * 25_000.0
        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b)) & ~1
        bits = np.stack([bits_a[:n], bits_b[:n]])
        base = dqpsk.modulate(bits, sps=2)
        chans = [1, 6]   # channel 6 ≡ -2 (negative frequency side)
        offsets = np.array([c * fs / n_chan for c in chans], np.float32)
        offsets = np.where(offsets > fs / 2, offsets - fs, offsets)
        wide = channelizer.synthesize_wideband(base, offsets, fs=fs)

        mrx = MultiCarrierReceiver([], fs=fs, pfb_channels=chans, n_chan=n_chan)
        stats = mrx.process_iq(wide)
        rx_a, rx_b = mrx.carriers
        assert (rx_a.mcc, rx_a.mnc, rx_a.colour_code) == (262, 42, 1)
        assert (rx_b.mcc, rx_b.mnc, rx_b.colour_code) == (901, 7, 5)
        for rx, base_ssi in ((rx_a, 0x200), (rx_b, 0x300)):
            ssis = [e[1].addr.ssi for e in rx.umac.events
                    if e[0] == "RESOURCE" and e[1].addr.type == 1]
            assert ssis == [base_ssi, base_ssi + 1, base_ssi + 2]
        assert all(s.crc_wrong == 0 for s in stats)


class TestMultiVsSingle:
    def test_equivalence_on_corrupted_streams(self):
        """The vectorised multi-carrier path (sync_vec + cross-carrier
        batched decode) produces exactly the per-carrier TetraReceiver
        results — logs, stats, upper-MAC events — on damaged streams."""
        from tetra_tpu.rx import TetraReceiver
        from tests.test_sync_vec import make_stream

        B = 12
        streams = [make_stream(5000 + b, n_frames=3) for b in range(B)]
        L = (min(len(s) for s in streams) // 64) * 64
        batch = np.stack([s[:L] for s in streams])

        logs_multi = [[] for _ in range(B)]
        loggers = [
            (lambda *a, _l=logs_multi[c]: _l.append(
                " ".join(str(x) for x in a))) for c in range(B)]
        mrx = MultiCarrierReceiver(np.zeros(B, np.float32),
                                   fs=25_000.0 * B, log=loggers)
        stats_multi = mrx.process_bits(batch)

        for c in range(B):
            lines = []
            rx = TetraReceiver(log=lambda *a, _l=lines: _l.append(
                " ".join(str(x) for x in a)))
            rx.process_bits(batch[c], final=False)
            assert lines == logs_multi[c], f"carrier {c} logs diverged"
            assert rx.stats == stats_multi[c], f"carrier {c} stats diverged"
            assert (len(rx.umac.events)
                    == len(mrx.carriers[c].umac.events)), c


class TestNativeControlPlane:
    def test_native_matches_python_plane(self):
        """control_plane="native" must produce identical stats, TDMA
        time, scrambling state and traffic dumps to the Python plane,
        and its RESOURCE events must carry the same SSIs."""
        import pytest
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        import tempfile
        from tetra_tpu.umac.native_exec import EV

        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b)) & ~1
        bits = np.stack([bits_a[:n], bits_b[:n]])
        offsets = np.array([-25_000.0, 25_000.0], np.float32)

        with tempfile.TemporaryDirectory() as d_py, \
                tempfile.TemporaryDirectory() as d_nat:
            mrx_py = MultiCarrierReceiver(offsets, fs=144_000.0,
                                          dumpdir=d_py)
            mrx_nat = MultiCarrierReceiver(offsets, fs=144_000.0,
                                           dumpdir=d_nat,
                                           control_plane="native")
            # feed hard bits in two chunks to exercise carried state
            half = (bits.shape[1] // 2) & ~511
            for mrx in (mrx_py, mrx_nat):
                mrx.process_bits(bits[:, :half])
                mrx.process_bits(bits[:, half:])

            for c in range(2):
                py, nat = mrx_py.carriers[c], mrx_nat.carriers[c]
                assert (py.stats.bursts, py.stats.crc_ok,
                        py.stats.crc_wrong) == \
                    (nat.stats.bursts, nat.stats.crc_ok,
                     nat.stats.crc_wrong), c
                assert (py.time.tn, py.time.fn, py.time.mn) == \
                    (nat.time.tn, nat.time.fn, nat.time.mn), c
                assert py.scramb_init == nat.scramb_init
                assert (py.mcc, py.mnc) == (nat.mcc, nat.mnc)

            # RESOURCE SSIs per carrier from the native event stream
            got = {0: [], 1: []}
            for evd in mrx_nat.native_events:
                for i in range(len(evd["kind"])):
                    if (evd["kind"][i] == EV.RESOURCE
                            and evd["a"][i] == 1):  # addr type SSI
                        got[int(evd["carrier"][i])].append(int(evd["b"][i]))
            for c, base in ((0, 0x200), (1, 0x300)):
                want = [e[1].addr.ssi for e in
                        mrx_py.carriers[c].umac.events
                        if e[0] == "RESOURCE" and e[1].addr.type == 1]
                assert got[c] == want, c

    def test_native_traffic_dumps_match(self, tmp_path):
        """Traffic slots route to identical dump files in both planes."""
        import pytest
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        rng = np.random.default_rng(9)
        init = scramb_get_init(262, 42, 1)
        sync = testpdu.make_sync_pdu(cc=1, mcc=262, mnc=42)
        aach_t = testpdu.make_access_assign_bits(hdr=3, f1=5, f2=0)
        voice_t5 = rng.integers(0, 2, 432).astype(np.int8)
        from tetra_tpu.phy.burst import build_norm_c_d_burst
        bb_t5 = np.asarray(tx.encode_bbk(jnp.asarray(aach_t),
                                         jnp.uint32(init)))
        stream = np.concatenate([
            np.zeros(63, np.uint8),
            np.asarray(tx.make_sync_burst(sync, testpdu.make_sysinfo_pdu(),
                                          testpdu.make_access_assign_bits(),
                                          jnp.uint32(init)), np.uint8),
            np.asarray(tx.make_sync_burst(sync, testpdu.make_sysinfo_pdu(),
                                          testpdu.make_access_assign_bits(),
                                          jnp.uint32(init)), np.uint8),
            np.asarray(build_norm_c_d_burst(
                np.asarray(scrambled(voice_t5, init))[:216], bb_t5,
                np.asarray(scrambled(voice_t5, init))[216:], False),
                np.uint8),
            # trailing lookahead so the synchroniser emits the last slot
            np.zeros(640, np.uint8)])
        bits = np.stack([stream, stream])
        offsets = np.array([-25_000.0, 25_000.0], np.float32)
        d_py, d_nat = tmp_path / "py", tmp_path / "nat"
        d_py.mkdir(); d_nat.mkdir()
        MultiCarrierReceiver(offsets, fs=144_000.0, dumpdir=str(d_py),
                             decode_voice=True).process_bits(bits)
        MultiCarrierReceiver(offsets, fs=144_000.0, dumpdir=str(d_nat),
                             control_plane="native",
                             decode_voice=True).process_bits(bits)
        for c in range(2):
            py_fs = sorted((d_py / f"carrier{c}").glob("traffic_*.out"))
            nat_fs = sorted((d_nat / f"carrier{c}").glob("traffic_*.out"))
            assert len(py_fs) == 1 and len(nat_fs) == 1, c
            assert py_fs[0].name == nat_fs[0].name, c
            assert py_fs[0].read_bytes() == nat_fs[0].read_bytes(), c
            # --voice in multi-carrier mode: the TCH/S decode runs off
            # the same routed t4 payloads, so the .cod codec-frame dumps
            # must be byte-identical across planes too
            py_cod = sorted((d_py / f"carrier{c}").glob("voice_*.cod"))
            nat_cod = sorted((d_nat / f"carrier{c}").glob("voice_*.cod"))
            assert len(py_cod) == 1 and len(nat_cod) == 1, c
            assert py_cod[0].name == nat_cod[0].name, c
            assert py_cod[0].read_bytes() == nat_cod[0].read_bytes(), c


def scrambled(t3, init):
    from tetra_tpu.ops.scramble import scramb_bits
    return scramb_bits(jnp.uint32(init), jnp.asarray(t3))


class TestNativePayloadEgress:
    def test_ip_and_tlsdu_egress_match_python_plane(self, monkeypatch):
        """Defrag-heavy capture: SNDCP IP packet bytes written to TUN
        and the generic TL-SDU sink output must be byte-identical from
        both planes — the native plane egresses real payloads through
        the walk2 event arena, not just lengths (reference TUN write:
        tetra_llc.c:81-107)."""
        import pytest
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        from tests.test_native_umac import make_al_udata
        from tetra_tpu.utils.bits import uint_to_bits
        from tetra_tpu.rx import TetraReceiver

        rng = np.random.default_rng(17)
        init = scramb_get_init(262, 42, 1)
        aach = testpdu.make_access_assign_bits()
        sync = testpdu.make_sync_pdu(cc=1, mcc=262, mnc=42)
        sb = np.asarray(tx.make_sync_burst(
            sync, testpdu.make_sysinfo_pdu(), aach, jnp.uint32(init)),
            np.uint8)
        schf = lambda p: np.asarray(tx.make_schf_burst(
            p, aach, jnp.uint32(init)), np.uint8)

        def stream(c):
            # SNDCP TL-SDU: pdisc 4 + 16 header bits + IP payload bytes
            ip = bytes([0x45, 0, 0, 32, c]) + bytes(
                rng.integers(0, 256, 27).astype(np.uint8))
            ip_bits = np.unpackbits(np.frombuffer(ip, np.uint8))
            tl = np.concatenate([uint_to_bits(4, 3), uint_to_bits(0, 16),
                                 ip_bits]).astype(np.int8)
            cuts = [0, 70, 140, 210, len(tl)]
            frags = [make_al_udata(k == 3, ns=5, ss=k + 1,
                                   payload=tl[cuts[k]:cuts[k + 1]])
                     for k in range(4)]
            # plus a BL-UDATA CMCE slot so the sink sees both paths
            bl = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
            parts = [rng.integers(0, 2, 40 + 11 * c).astype(np.uint8),
                     sb, sb]
            parts += [schf(testpdu.make_resource_pdu(
                ssi=0x600 + c, sdu_bits=f)) for f in frags]
            parts.append(schf(testpdu.make_resource_pdu(
                ssi=0x700 + c, sdu_bits=bl)))
            parts.append(np.zeros(640, np.uint8))
            return np.concatenate(parts), ip

        B = 3
        built = [stream(c) for c in range(B)]
        n = min(len(s) for s, _ in built)
        batch = np.stack([s[:n] for s, _ in built])
        want_ips = [ip for _, ip in built]
        # a cut INSIDE the fragment chain exercises cross-chunk defrag
        # state and the payload-arena bound with pending bits
        cut = (len(built[0][0]) // 2) & ~63

        def run(plane):
            ips = {c: [] for c in range(B)}
            tls = []
            rx_of = {}
            monkeypatch.setattr(
                TetraReceiver, "_ip_out",
                lambda self, pkt: ips[rx_of[id(self)]].append(pkt))
            mrx = MultiCarrierReceiver(
                np.zeros(B, np.float32), fs=25e3 * B,
                control_plane=plane,
                tl_sdu_sink=lambda c, pd, pt, bits: tls.append(
                    (c, pd, pt, bits.tobytes())))
            for c, rx in enumerate(mrx.carriers):
                rx_of[id(rx)] = c
            mrx.process_bits(batch[:, :cut], final=False)
            mrx.process_bits(batch[:, cut:], final=True)
            return ips, tls

        py_ips, py_tls = run("python")
        nat_ips, nat_tls = run("native")
        for c in range(B):
            assert py_ips[c], f"carrier {c}: python plane wrote no IP"
            assert py_ips[c] == nat_ips[c], c
            # the reassembled packet is the original IP bytes
            assert py_ips[c] == [want_ips[c]]
        # same TL-SDU multiset per carrier (chunking only reorders
        # across carriers)
        for c in range(B):
            assert [t for t in py_tls if t[0] == c] == \
                [t for t in nat_tls if t[0] == c], c
        assert sum(t[1] == 4 for t in py_tls) == B        # SNDCP
        assert sum(t[1] == 2 for t in py_tls) == B        # CMCE


class TestEncryptedVoice:
    def test_voice_decrypt_matches_across_planes(self, tmp_path):
        """Encrypted voice through the scale path: with a keystore
        loaded, BOTH planes decrypt the two 137-bit codec frames with
        the slot-time keystream (the native walk generates it into the
        payload arena; reference tetra_crypto.c:254-282, shipped
        unwired there) — .cod dumps must be byte-identical across
        planes and differ from the undecrypted run."""
        import pytest
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        from tetra_tpu.phy.burst import build_norm_c_d_burst
        from tetra_tpu.utils.bits import uint_to_bits

        rng = np.random.default_rng(23)
        init = scramb_get_init(262, 42, 1)
        sync = testpdu.make_sync_pdu(cc=1, mcc=262, mnc=42)
        sysinfo = np.array(testpdu.make_sysinfo_pdu(cck_id=7))
        aach = testpdu.make_access_assign_bits()
        aach_t = testpdu.make_access_assign_bits(hdr=3, f1=5, f2=0)
        voice_t5 = rng.integers(0, 2, 432).astype(np.int8)
        bb_t5 = np.asarray(tx.encode_bbk(jnp.asarray(aach_t),
                                         jnp.uint32(init)))
        sb = np.asarray(tx.make_sync_burst(sync, sysinfo, aach,
                                           jnp.uint32(init)), np.uint8)
        stream = np.concatenate([
            np.zeros(63, np.uint8), sb, sb,
            np.asarray(build_norm_c_d_burst(
                np.asarray(scrambled(voice_t5, init))[:216], bb_t5,
                np.asarray(scrambled(voice_t5, init))[216:], False),
                np.uint8),
            np.zeros(640, np.uint8)])
        bits = np.stack([stream, stream])
        offsets = np.array([-25_000.0, 25_000.0], np.float32)
        ks_file = tmp_path / "keys.txt"
        ks_file.write_text(
            "network mcc 262 mnc 42 ksg_type 1 security_class 2\n"
            "key mcc 262 mnc 42 addr 0 key_type 1 key_num 7 "
            "key A0A1A2A3A4A5A6A7A8A9\n")

        def run(name, plane, keystore):
            d = tmp_path / name
            d.mkdir()
            MultiCarrierReceiver(offsets, fs=144_000.0, dumpdir=str(d),
                                 control_plane=plane,
                                 keystore_path=keystore,
                                 decode_voice=True).process_bits(bits)
            return {c: sorted((d / f"carrier{c}").glob("voice_*.cod"))
                    for c in range(2)}

        py = run("py", "python", str(ks_file))
        nat = run("nat", "native", str(ks_file))
        plain = run("plain", "python", None)
        for c in range(2):
            assert len(py[c]) == len(nat[c]) == 1, c
            assert py[c][0].name == nat[c][0].name, c
            enc_bytes = py[c][0].read_bytes()
            assert enc_bytes == nat[c][0].read_bytes(), c
            # the keystream was actually applied
            assert enc_bytes != plain[c][0].read_bytes(), c


class TestWidebandIq4:
    def test_fft_synth_iq4_pfb_parity(self):
        """Wideband-ingest path: FFT-synthesized multi-carrier capture,
        packed 4+4-bit IQ (1 byte/sample on the h2d link), on-device
        PFB channelization — both cells decode, and the native plane
        matches the Python plane exactly on the same packed input."""
        import pytest
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        from tetra_tpu.io import stream
        n_chan = 8
        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b)) & ~1
        bits = np.stack([bits_a[:n], bits_b[:n]])
        base = dqpsk.modulate(bits, sps=2)
        chans = [1, 6]
        wide = channelizer.synthesize_wideband_fft(base, chans, n_chan)
        packed = stream.quantize_iq4(wide.real * 0.5, wide.imag * 0.5)

        def run(plane):
            mrx = MultiCarrierReceiver([], fs=n_chan * 25e3,
                                       pfb_channels=chans, n_chan=n_chan,
                                       control_plane=plane)
            half = len(packed) // 2
            mrx.process_iq4(packed[:half], final=False)
            mrx.process_iq4(packed[half:], final=True)
            return mrx

        nat, py = run("native"), run("python")
        # the int8 interleaved format (full-occupancy scale) decodes
        # identically through the same chain
        iq8 = np.empty(len(wide) * 2, np.int8)
        iq8[0::2] = np.clip(np.round(wide.real * 0.5 * 127), -127, 127)
        iq8[1::2] = np.clip(np.round(wide.imag * 0.5 * 127), -127, 127)
        m8 = MultiCarrierReceiver([], fs=n_chan * 25e3,
                                  pfb_channels=chans, n_chan=n_chan,
                                  control_plane="native")
        m8.process_iq8(iq8)   # demod is scale-invariant: no gain needed
        for rx, (mcc, mnc, cc) in zip(m8.carriers,
                                      ((262, 42, 1), (901, 7, 5))):
            assert (rx.mcc, rx.mnc, rx.colour_code) == (mcc, mnc, cc)
            assert rx.stats.crc_ok > 0 and rx.stats.crc_wrong == 0
        for rx, (mcc, mnc, cc) in zip(nat.carriers,
                                      ((262, 42, 1), (901, 7, 5))):
            assert (rx.mcc, rx.mnc, rx.colour_code) == (mcc, mnc, cc)
            assert rx.stats.crc_ok > 0 and rx.stats.crc_wrong == 0
        for p, q in zip(py.carriers, nat.carriers):
            assert (p.stats.bursts, p.stats.crc_ok, p.stats.crc_wrong) \
                == (q.stats.bursts, q.stats.crc_ok, q.stats.crc_wrong)

    def test_overlap_save_streaming_bit_exact(self):
        """Chunked wideband ingest must be BIT-EXACT vs a single-shot
        run: the PFB/resampler/demod filter state is re-fed through the
        hop-aligned overlap, so chunk boundaries cost no slots (without
        it every boundary forces a relock)."""
        import pytest
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        n_chan = 8
        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b)) & ~1
        base = dqpsk.modulate(np.stack([bits_a[:n], bits_b[:n]]), sps=2)
        chans = [1, 6]
        wide = channelizer.synthesize_wideband_fft(base, chans, n_chan)
        q = 127.0 / (6 * wide.real.std())
        iq8 = np.empty(2 * len(wide), np.int8)
        iq8[0::2] = np.clip(np.round(wide.real * q), -127, 127)
        iq8[1::2] = np.clip(np.round(wide.imag * q), -127, 127)

        def run(cuts):
            # the fused native path never materialises bits on host;
            # record the exact chunk bits each dispatch will consume by
            # replaying its front end (same jit, same static slice)
            import jax.numpy as jnp
            from tetra_tpu import fastpath
            got = []
            mrx = MultiCarrierReceiver([], fs=n_chan * 25e3,
                                       pfb_channels=chans, n_chan=n_chan,
                                       control_plane="native")
            orig_iq = mrx._fast.submit_iq

            def rec_submit(raw, fmt, keep, ci, nc, fs, sps=2):
                got.append(np.asarray(fastpath._iq_frontend_bits(
                    jnp.asarray(raw), ci, fmt, nc, fs, sps, keep),
                    np.uint8))
                return orig_iq(raw, fmt, keep, ci, nc, fs, sps=sps)

            mrx._fast.submit_iq = rec_submit
            for i in range(len(cuts) - 1):
                mrx.process_iq8(iq8[2 * cuts[i]: 2 * cuts[i + 1]],
                                final=i == len(cuts) - 2)
            return (np.concatenate([g for g in got if g.size], axis=1),
                    [(r.stats.crc_ok, r.stats.crc_wrong)
                     for r in mrx.carriers])

        S = len(wide)
        one_bits, one_stats = run([0, S])
        assert all(ok > 0 and bad == 0 for ok, bad in one_stats)
        for cuts in ([0, S // 2, S], [0, 5000, 5100, S // 3, S]):
            m_bits, m_stats = run(cuts)
            assert np.array_equal(one_bits, m_bits), cuts
            assert one_stats == m_stats, cuts


class TestOffGridStreaming:
    def test_mixer_chunked_equals_whole_off_grid(self):
        """Off-grid carriers through the mixer-bank fallback: feeding
        the capture in arbitrary chunks is bit-identical to one call
        (overlap-save carry + absolute-index oscillator,
        rx_multi._mixer_stream). Previously this path was stateless per
        call and lost ~a slot per carrier per chunk boundary (reference
        xlating FIR: src/demod/osmosdr-tetra_demod_fft.py:74-80)."""
        fs = 144_000.0                     # fs/36k = 4 (rational)
        bits_a = _capture_bits(262, 42, 1, 0x200, seed=1)
        bits_b = _capture_bits(901, 7, 5, 0x300, seed=2)
        n = min(len(bits_a), len(bits_b)) & ~1
        bits = np.stack([bits_a[:n], bits_b[:n]])
        base = dqpsk.modulate(bits, sps=2)
        # NON-grid offsets (nothing near a 25 kHz multiple)
        offsets = np.array([-31_400.0, 13_700.0], np.float32)
        wide = channelizer.synthesize_wideband(base, offsets, fs=fs)

        def run(cuts=None):
            mrx = MultiCarrierReceiver(offsets, fs=fs)
            if cuts is None:
                mrx.process_iq(wide, final=True)
            else:
                edges = [0] + cuts + [len(wide)]
                for i in range(len(edges) - 1):
                    mrx.process_iq(wide[edges[i]:edges[i + 1]],
                                   final=i == len(edges) - 2)
            return mrx

        whole = run()
        # unaligned cuts: neither a BLOCK multiple nor symbol-aligned
        chunked = run(cuts=[4097, 11_003, 23_456])
        for p, q in zip(whole.carriers, chunked.carriers):
            assert (p.stats.bursts, p.stats.slots, p.stats.crc_ok,
                    p.stats.crc_wrong) == \
                (q.stats.bursts, q.stats.slots, q.stats.crc_ok,
                 q.stats.crc_wrong)
            assert p.stats.crc_ok > 0 and p.stats.crc_wrong == 0
        for rx in chunked.carriers[:1]:
            ssis = [e[1].addr.ssi for e in rx.umac.events
                    if e[0] == "RESOURCE" and e[1].addr.type == 1]
            assert ssis == [0x200, 0x201, 0x202]

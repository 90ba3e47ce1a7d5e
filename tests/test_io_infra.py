"""IO and infrastructure: GSMTAP packets, UDP transport, capture ingest,
trace taps, benchmark harness."""
import json
import struct

import numpy as np
import pytest

from tetra_tpu.tdma import TdmaTime
from tetra_tpu.io.gsmtap import make_gsmtap_packet, GsmtapSink, GSMTAP_PORT
from tetra_tpu.io.udp import UdpSource, UdpSink
from tetra_tpu.io import inputs
from tetra_tpu.utils import trace
from tetra_tpu.utils.bits import pack_bits, unpack_bits, bits_to_uint, uint_to_bits


class TestGsmtap:
    def test_packet_layout(self):
        tm = TdmaTime(hn=2, mn=3, fn=4, tn=1, sn=1)
        bits = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1, 1], dtype=np.uint8)
        pkt = make_gsmtap_packet(tm, lchan=10, ts=0, ss=0,
                                 signal_dbm=-60, snr=10, bits=bits)
        ver, hdr_len, typ, ts = struct.unpack("!BBBB", pkt[:4])
        assert (ver, hdr_len, typ) == (2, 4, 0x05)
        fn = struct.unpack("!I", pkt[8:12])[0]
        assert fn == tm.time2fn()
        subtype = pkt[12]
        assert subtype == 0x01  # BSCH
        assert pkt[16:] == pack_bits(bits)

    def test_udp_roundtrip(self):
        sink = GsmtapSink("127.0.0.1", 0)
        src_sock = None
        import socket
        src_sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        src_sock.bind(("127.0.0.1", 0))
        sink.addr = src_sock.getsockname()
        tm = TdmaTime(mn=1, fn=1, tn=1)
        n = sink.send(tm, 10, 0, np.ones(16, dtype=np.uint8))
        assert n > 0
        data, _ = src_sock.recvfrom(4096)
        assert data[2] == 0x05
        src_sock.close()
        sink.close()


class TestUdpTransport:
    def test_iq_roundtrip(self):
        src = UdpSource(0, host="127.0.0.1", dtype=np.complex64, timeout=2.0)
        port = src.sock.getsockname()[1]
        sink = UdpSink("127.0.0.1", port)
        payload = (np.arange(64) + 1j * np.arange(64)).astype(np.complex64)
        sink.send(payload)
        got = src.recv()
        np.testing.assert_array_equal(got, payload)
        src.close()
        sink.close()


class TestCaptureIngest:
    def test_bits_file(self, tmp_path):
        p = tmp_path / "x.bits"
        bits = np.random.default_rng(0).integers(0, 2, 100).astype(np.uint8)
        bits.tofile(p)
        kind, data = inputs.load_capture(str(p))
        assert kind == "bits"
        np.testing.assert_array_equal(data, bits)

    def test_float_file(self, tmp_path):
        p = tmp_path / "x.fl"
        syms = np.array([1, 3, -1, -3], dtype=np.float32)
        syms.tofile(p)
        kind, data = inputs.load_capture(str(p))
        assert kind == "float"
        out = inputs.capture_to_bits(kind, data)
        assert out.tolist() == [0, 0, 0, 1, 1, 0, 1, 1]

    def test_cfile(self, tmp_path):
        p = tmp_path / "x.cfile"
        iq = (np.ones(8) + 1j).astype(np.complex64)
        iq.tofile(p)
        kind, data = inputs.load_capture(str(p))
        assert kind == "iq" and data.dtype == np.complex64


class TestBitsHelpers:
    def test_pack_unpack(self):
        bits = np.array([1, 0, 1, 1, 0, 0, 1, 0, 1], dtype=np.uint8)
        packed = pack_bits(bits)
        assert packed == bytes([0b10110010, 0b10000000])
        np.testing.assert_array_equal(unpack_bits(packed, 9), bits)

    def test_uint_roundtrip(self):
        assert bits_to_uint(uint_to_bits(0x2A5, 12)) == 0x2A5


class TestTrace:
    def test_taps_and_timer(self):
        trace.set_level(2)
        try:
            trace.tap("type4", np.arange(4))
            with trace.timer("stage"):
                pass
            assert len(trace.taps("type4")) == 1
            assert trace.timings()["stage"]["n"] == 1
        finally:
            trace.set_level(0)
            trace.clear_taps()


class TestHarness:
    def test_runs_capture(self, tmp_path, monkeypatch):
        import benchmarks.harness as hz
        monkeypatch.setattr(hz, "RESULTS", tmp_path)
        from tests.test_rx_e2e import build_capture
        bits, _ = build_capture(n_frames=1)
        p = tmp_path / "cap.bits"
        bits.astype(np.uint8).tofile(p)
        result = hz.run_capture(str(p))
        assert result["frames_ok"] >= 2
        saved = json.loads(next(tmp_path.glob("*/*.json")).read_text())
        assert saved["frames_ok"] == result["frames_ok"]


class TestLiveReceiver:
    def test_udp_bits_pipeline(self):
        """receiver1udp analogue: bits over UDP -> streaming decode."""
        import threading
        import socket as socketmod
        from tetra_tpu import receiver as receiver_mod
        from tetra_tpu.rx import TetraReceiver
        from tests.test_rx_e2e import build_capture

        bits, _ = build_capture(n_frames=1)
        rx = TetraReceiver(log=lambda *a: None)

        # pick a free port by binding first inside run_udp via UdpSource(0)
        from tetra_tpu.io.udp import UdpSource, UdpSink
        src = UdpSource(0, host="127.0.0.1", dtype=np.uint8, timeout=1.0)
        port = src.sock.getsockname()[1]
        src.close()

        def feed():
            sink = UdpSink("127.0.0.1", port)
            for i in range(0, len(bits), 1024):
                sink.send(bits[i:i + 1024].astype(np.uint8))
            sink.close()

        t = threading.Timer(0.3, feed)
        t.start()
        receiver_mod.run_udp(rx, port, "bits", sps=2, chunk_symbols=2048,
                             timeout=1.5)
        t.join()
        assert rx.stats.bursts >= 3
        assert rx.stats.crc_ok >= 4


class TestRxTracing:
    def test_stage_taps_from_receiver(self):
        from tests.test_rx_e2e import build_capture
        from tetra_tpu.rx import TetraReceiver
        bits, _ = build_capture(n_frames=1)
        trace.set_level(2)
        try:
            rx = TetraReceiver(log=lambda *a: None)
            rx.process_bits(bits)
            assert trace.taps("aligned_slots")
            assert trace.taps("type1_SB1")
            assert trace.taps("type1_SCH/F")
        finally:
            trace.set_level(0)
            trace.clear_taps()


class TestNameTableLint:
    """The jenkins.sh value_string-termination linter analogue: every
    enum has a complete name table (contrib/jenkins.sh:22)."""

    def test_llc_names_cover_enum(self):
        from tetra_tpu.llc.llc_pdu import LlcPduDec, PDU_DEC_NAMES
        for v in LlcPduDec:
            assert v in PDU_DEC_NAMES, v

    def test_lchan_names_cover_ids(self):
        from tetra_tpu.umac.upper_mac import LogicalChannel
        for v in range(12):
            assert v in LogicalChannel.NAMES, v

    def test_macpdu_and_addr_names(self):
        from tetra_tpu.umac import mac_pdu
        for v in range(4):
            assert v in mac_pdu.MACPDU_NAMES
        for v in range(8):
            assert v in mac_pdu.ADDR_TYPE_NAMES
        for v in range(4):
            assert v in mac_pdu.ALLOC_TYPE_NAMES
            assert v in mac_pdu.UL_DL_NAMES

    def test_mle_name_tables(self):
        from tetra_tpu.mle import mle
        assert all(mle.mm_pdut_name(v) for v in (0, 5, 12))
        assert all(mle.cmce_pdut_name(v) for v in (1, 8, 16))
        assert all(mle.sndcp_pdut_name(v) for v in (0, 4, 13))
        assert all(mle.mle_pdisc_name(v) for v in (1, 2, 4, 5))

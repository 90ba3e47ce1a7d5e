"""Live SDR source (rtl_tcp protocol) + spectrum scan.

A mock rtl_tcp server (thread, real TCP socket) stands in for the
hardware: it speaks the exact wire protocol (RTL0 banner, 5-byte
set-parameter commands, u8 interleaved I/Q stream), so these tests
exercise the same code path a real rtl-sdr dongle would.
"""
import socket
import struct
import threading

import numpy as np
import pytest

from tetra_tpu.io.sdr import (RtlTcpSource, CMD_FREQ, CMD_SAMPLE_RATE,
                              CMD_GAIN, CMD_GAIN_MODE, CMD_AGC_MODE,
                              CMD_FREQ_CORRECTION)
from tetra_tpu import scan as scanner


class MockRtlTcp(threading.Thread):
    """Minimal rtl_tcp daemon: one client, records commands, streams a
    fixed u8 payload."""

    def __init__(self, payload_u8: np.ndarray, tuner_type=5, gains=29):
        super().__init__(daemon=True)
        self.payload = np.asarray(payload_u8, np.uint8).tobytes()
        self.header = b"RTL0" + struct.pack(">II", tuner_type, gains)
        self.commands = []
        self._cmdbuf = b""
        self.lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.lsock.bind(("127.0.0.1", 0))
        self.lsock.listen(1)
        self.port = self.lsock.getsockname()[1]

    def run(self):
        conn, _ = self.lsock.accept()
        conn.sendall(self.header)
        conn.setblocking(False)
        sent = 0
        while sent < len(self.payload):
            self._drain_cmds(conn)
            try:
                n = conn.send(self.payload[sent: sent + 65536])
                sent += n
            except BlockingIOError:
                pass
            except (BrokenPipeError, ConnectionResetError):
                break
        # payload exhausted: keep draining commands until the client
        # hangs up (or 5 s safety timeout)
        conn.setblocking(True)
        conn.settimeout(5.0)
        try:
            while True:
                data = conn.recv(4096)
                if not data:
                    break
                self._cmdbuf += data
        except (socket.timeout, ConnectionResetError, OSError):
            pass
        while len(self._cmdbuf) >= 5:
            cmd, param = struct.unpack(">BI", self._cmdbuf[:5])
            self.commands.append((cmd, param))
            self._cmdbuf = self._cmdbuf[5:]
        conn.close()
        self.lsock.close()

    def _drain_cmds(self, conn):
        try:
            while True:
                data = conn.recv(4096)
                if not data:
                    return
                self._cmdbuf += data
        except (BlockingIOError, ConnectionResetError):
            pass
        while len(self._cmdbuf) >= 5:
            cmd, param = struct.unpack(">BI", self._cmdbuf[:5])
            self.commands.append((cmd, param))
            self._cmdbuf = self._cmdbuf[5:]


def make_wideband(fs: float, offsets_khz=(-25.0, 25.0), seeds=(1, 2),
                  cells=((262, 42, 1, 0x200), (901, 7, 5, 0x300)),
                  noise=3e-3, seed=9):
    """Two-cell synthetic wideband capture as u8 I/Q + the cell specs."""
    import jax.numpy as jnp
    from tetra_tpu import tx, testpdu
    from tetra_tpu.ops.scramble import scramb_get_init
    from tetra_tpu.phy import dqpsk, channelizer

    def cell_bits(mcc, mnc, cc, ssi, seed):
        init = scramb_get_init(mcc, mnc, cc)
        rng = np.random.default_rng(seed)
        sync = testpdu.make_sync_pdu(cc=cc, tn=1, fn=2, mn=3, mcc=mcc, mnc=mnc)
        sysinfo = testpdu.make_sysinfo_pdu()
        aach = testpdu.make_access_assign_bits()
        stream = [rng.integers(0, 2, size=127).astype(np.uint8),
                  tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(init)),
                  tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(init))]
        sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
        schf = testpdu.make_resource_pdu(ssi=ssi, sdu_bits=sdu)
        stream.append(tx.make_schf_burst(schf, aach, jnp.uint32(init)))
        stream.append(rng.integers(0, 2, size=128).astype(np.uint8))
        return np.concatenate(stream)

    streams = [cell_bits(*cell, seed=s) for cell, s in zip(cells, seeds)]
    n = min(map(len, streams)) & ~1
    base = dqpsk.modulate(np.stack([b[:n] for b in streams]), sps=2)
    offsets = np.asarray(offsets_khz, np.float32) * 1e3
    wide = channelizer.synthesize_wideband(base, offsets, fs=fs)
    rng = np.random.default_rng(seed)
    wide = wide + noise * (rng.standard_normal(len(wide))
                           + 1j * rng.standard_normal(len(wide))).astype(np.complex64)
    wide /= np.abs(wide).max() * 1.05
    u8 = np.empty(2 * len(wide), np.uint8)
    u8[0::2] = np.round(wide.real * 127.5 + 127.5).astype(np.uint8)
    u8[1::2] = np.round(wide.imag * 127.5 + 127.5).astype(np.uint8)
    return u8, offsets


class TestRtlTcpSource:
    def test_protocol_and_samples(self):
        rng = np.random.default_rng(0)
        payload = rng.integers(0, 256, size=8192, dtype=np.uint8)
        srv = MockRtlTcp(payload)
        srv.start()
        src = RtlTcpSource("127.0.0.1", srv.port, timeout=5.0)
        assert src.tuner_name == "R820T"
        assert src.tuner_gain_count == 29
        src.configure(freq_hz=392.5e6, rate_hz=1.8e6, gain_db=38.0, ppm=-2)
        iq = src.read(1024)
        re, im = src.read_ri(1024)
        src.close()
        srv.join(timeout=5.0)

        # sample conversion: u8 -> (x - 127.5)/127.5, I even / Q odd
        f = (payload.astype(np.float32) - 127.5) / 127.5
        np.testing.assert_allclose(iq.real, f[0:2048:2], rtol=1e-6)
        np.testing.assert_allclose(iq.imag, f[1:2048:2], rtol=1e-6)
        np.testing.assert_allclose(re, f[2048:4096:2], rtol=1e-6)
        np.testing.assert_allclose(im, f[2049:4096:2], rtol=1e-6)

        # command wire format (sample rate, freq, ppm, manual gain mode,
        # gain in tenths of dB)
        cmds = dict(srv.commands)
        assert cmds[CMD_SAMPLE_RATE] == 1_800_000
        assert cmds[CMD_FREQ] == 392_500_000
        assert cmds[CMD_FREQ_CORRECTION] == (-2) & 0xFFFFFFFF
        assert cmds[CMD_GAIN_MODE] == 1
        assert cmds[CMD_GAIN] == 380

    def test_agc_default(self):
        srv = MockRtlTcp(np.zeros(64, np.uint8))
        srv.start()
        src = RtlTcpSource("127.0.0.1", srv.port, timeout=5.0)
        src.configure(freq_hz=1e6, rate_hz=250_000)  # no gain -> AGC
        src.read(32)
        src.close()
        srv.join(timeout=5.0)
        cmds = dict(srv.commands)
        assert cmds[CMD_GAIN_MODE] == 0
        assert cmds[CMD_AGC_MODE] == 1

    def test_bad_banner_rejected(self):
        lsock = socket.socket()
        lsock.bind(("127.0.0.1", 0))
        lsock.listen(1)

        def serve():
            conn, _ = lsock.accept()
            conn.sendall(b"HTTP/1.1 400\r\n")
            conn.close()

        t = threading.Thread(target=serve, daemon=True)
        t.start()
        with pytest.raises(IOError):
            RtlTcpSource("127.0.0.1", lsock.getsockname()[1], timeout=5.0)
        lsock.close()


class TestScan:
    FS = 400_000.0

    def test_detect_and_confirm(self):
        u8, offsets = make_wideband(self.FS)
        iq = RtlTcpSource._to_complex(u8)
        results, (centers, power, floor) = scanner.scan(iq, self.FS,
                                                        confirm=True)
        found = sorted(r["offset_hz"] for r in results if r["confirmed"])
        assert found == [-25_000.0, 25_000.0]
        by_off = {r["offset_hz"]: r for r in results}
        a = by_off[-25_000.0]
        assert (a["mcc"], a["mnc"], a["colour_code"]) == (262, 42, 1)
        b = by_off[25_000.0]
        assert (b["mcc"], b["mnc"], b["colour_code"]) == (901, 7, 5)
        assert all(r["crc_ok"] > 0 for r in results if r["confirmed"])
        # the plot renders and marks the confirmed carriers
        txt = scanner.render_spectrum(centers, power, floor,
                                      marks=[r["offset_hz"] for r in results])
        assert txt.count("<== carrier") == 2

    def test_power_only(self):
        u8, _ = make_wideband(self.FS)
        iq = RtlTcpSource._to_complex(u8)
        offsets, snr, _ = scanner.detect_carriers(iq, self.FS)
        assert set(np.round(offsets).astype(int)) == {-25_000, 25_000}
        assert (snr > 8.0).all()


class TestReceiverRtlTcp:
    def test_live_e2e(self, capsys):
        """Full CLI path: mock rtl_tcp server -> RtlTcpSource ->
        channelizer -> demod -> sync -> FEC -> upper MAC; both cells'
        identities decoded."""
        fs = 400_000.0
        u8, _ = make_wideband(fs)
        secs = len(u8) / 2 / fs
        srv = MockRtlTcp(u8)
        srv.start()
        from tetra_tpu import receiver
        mrx = receiver.main([
            "--rtltcp", f"127.0.0.1:{srv.port}",
            "--freq", "392500000", "--rate", str(fs),
            "--carriers=-25000,25000", "--secs", str(secs),
        ])
        srv.join(timeout=5.0)
        rx_a, rx_b = mrx.carriers
        assert (rx_a.mcc, rx_a.mnc, rx_a.colour_code) == (262, 42, 1)
        assert (rx_b.mcc, rx_b.mnc, rx_b.colour_code) == (901, 7, 5)
        assert all(rx.stats.crc_ok > 0 for rx in mrx.carriers)
        err = capsys.readouterr().err
        assert "CRC ok/wrong" in err
        cmds = dict(srv.commands)
        assert cmds[CMD_FREQ] == 392_500_000


class TestScanToNativePlane:
    def test_scan_confirm_native_plane_e2e(self, capsys):
        """The PRODUCTION configuration: mock rtl_tcp server ->
        `--carriers auto` (spectrum scan + confirm decode) -> native
        control plane. The scan must hand the confirmed offsets to the
        fastpath plane, and the decode must match the Python plane on
        the same server payload."""
        from tetra_tpu.umac import native_exec
        if not native_exec.available():
            pytest.skip("native library unavailable")
        from tetra_tpu import receiver
        fs = 400_000.0
        u8, _ = make_wideband(fs)
        # scan eats 1 s of samples before streaming; serve scan capture
        # + the decode payload back to back
        reps = -(-int(2 * fs) // len(u8))   # scan eats 1 s of samples
        payload = np.concatenate([np.tile(u8, reps)[: int(2 * fs)], u8,
                                  np.full(int(fs), 127, np.uint8)])
        secs = len(u8) / 2 / fs

        def run(plane):
            srv = MockRtlTcp(payload)
            srv.start()
            mrx = receiver.main([
                "--rtltcp", f"127.0.0.1:{srv.port}",
                "--freq", "392500000", "--rate", str(fs),
                "--carriers", "auto", "--secs", str(secs),
                "--control-plane", plane,
            ])
            srv.join(timeout=5.0)
            return mrx

        nat = run("native")
        py = run("python")
        assert len(nat.carriers) == len(py.carriers) == 2
        # grid-aligned confirmed carriers route through the PFB (the
        # overlap-save streaming front end), not the stateless mixer
        assert nat.pfb_channels is not None
        ids = sorted((rx.mcc, rx.mnc, rx.colour_code)
                     for rx in nat.carriers)
        assert ids == [(262, 42, 1), (901, 7, 5)]
        for p, q in zip(py.carriers, nat.carriers):
            assert (p.mcc, p.mnc, p.colour_code) == \
                (q.mcc, q.mnc, q.colour_code)
            assert q.stats.crc_ok > 0
            assert (p.stats.crc_ok, p.stats.crc_wrong) == \
                (q.stats.crc_ok, q.stats.crc_wrong)
        err = capsys.readouterr().err
        assert "confirmed carrier" in err

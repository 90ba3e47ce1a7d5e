"""GSMTAP export from the native control plane vs the Python plane.

The reference hooks GSMTAP at every CRC-OK TMV dispatch
(tetra_upper_mac.c:483-488). The native executor emits EV_GSMTAP
events (opt-in) that rx_multi packetises host-side from the fetched
decode rows; the UDP datagrams must be byte-identical to the Python
plane's per-PDU export over the same capture.
"""
import socket

import numpy as np
import pytest

from tetra_tpu.rx import TetraReceiver
from tetra_tpu.rx_multi import MultiCarrierReceiver
from tetra_tpu.umac import native_exec

pytestmark = pytest.mark.skipif(not native_exec.available(),
                                reason="native library unavailable")


def _recv_all(sock):
    pkts = []
    sock.settimeout(0.3)
    try:
        while True:
            data, _ = sock.recvfrom(65536)
            pkts.append(data)
    except socket.timeout:
        pass
    return pkts


def _bound_sock():
    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    return s


class TestNativeGsmtap:
    def test_packets_match_python_plane(self):
        from tests.test_rx_multi import _capture_bits
        bits = _capture_bits(262, 42, 1, 0x200, seed=3)

        s_py = _bound_sock()
        rx = TetraReceiver(gsmtap_host="127.0.0.1",
                           log=lambda *a, **k: None)
        rx.gsmtap.addr = s_py.getsockname()
        rx.process_bits(bits)
        py_pkts = _recv_all(s_py)
        s_py.close()

        s_nat = _bound_sock()
        mc = MultiCarrierReceiver(np.zeros(1, np.float32), fs=25e3,
                                  control_plane="native",
                                  gsmtap_host="127.0.0.1")
        mc.gsmtap.addr = s_nat.getsockname()
        mc.process_bits(bits[None])
        nat_pkts = _recv_all(s_nat)
        s_nat.close()

        assert len(py_pkts) >= 10, len(py_pkts)
        assert len(nat_pkts) == len(py_pkts), (len(nat_pkts), len(py_pkts))
        assert nat_pkts == py_pkts

    def test_off_by_default(self):
        """Without gsmtap_host the executor emits no GSMTAP events."""
        from tests.test_rx_multi import _capture_bits
        from tetra_tpu.umac.native_exec import EV
        bits = _capture_bits(262, 42, 1, 0x200, seed=3)
        mc = MultiCarrierReceiver(np.zeros(1, np.float32), fs=25e3,
                                  control_plane="native")
        mc.process_bits(bits[None])
        for evd in mc.native_events:
            assert not (evd["kind"] == EV.GSMTAP).any()

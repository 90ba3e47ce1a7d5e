"""Fuzz robustness: every parser and the full receiver must survive
arbitrary garbage without raising (the reference guards with min-length
tables, tetra_llc_pdu.c:86-103/300-304; we must be at least as robust)."""
import numpy as np
import pytest

from tetra_tpu.umac import mac_pdu
from tetra_tpu.llc.llc_pdu import parse_llc_pdu
from tetra_tpu.llc.llc import LlcState, rx_tm_sdu
from tetra_tpu.mle.mle import rx_tl_sdu
from tetra_tpu.rx import TetraReceiver
from tetra_tpu.umac.upper_mac import UpperMac, LogicalChannel
from tetra_tpu.tdma import TdmaTime


class TestFuzzParsers:
    def test_llc_pdu_random(self):
        rng = np.random.default_rng(0)
        for _ in range(300):
            n = int(rng.integers(0, 300))
            bits = rng.integers(0, 2, size=max(n, 4)).astype(np.uint8)
            parse_llc_pdu(bits, n if n >= 4 else 4)

    def test_mac_resource_random(self):
        rng = np.random.default_rng(1)
        for _ in range(300):
            bits = rng.integers(0, 2, size=268).astype(np.uint8)
            mac_pdu.decode_resource(bits)

    def test_sysinfo_random(self):
        rng = np.random.default_rng(2)
        for _ in range(100):
            mac_pdu.decode_sysinfo(rng.integers(0, 2, size=124).astype(np.uint8))

    def test_access_assign_random(self):
        rng = np.random.default_rng(3)
        for _ in range(100):
            bits = rng.integers(0, 2, size=14).astype(np.uint8)
            mac_pdu.decode_access_assign(bits, bool(rng.integers(0, 2)))

    def test_chan_alloc_random(self):
        rng = np.random.default_rng(4)
        for _ in range(200):
            mac_pdu.decode_chan_alloc(rng.integers(0, 2, size=268).astype(np.uint8))

    def test_mle_random(self):
        rng = np.random.default_rng(5)
        for _ in range(200):
            n = int(rng.integers(3, 200))
            rx_tl_sdu(rng.integers(0, 2, size=n).astype(np.uint8), n,
                      log=lambda *a: None)

    def test_llc_layer_random(self):
        llcs = LlcState(log=lambda *a, **k: None)
        rng = np.random.default_rng(6)
        for _ in range(200):
            n = int(rng.integers(0, 200))
            rx_tm_sdu(llcs, rng.integers(0, 2, size=max(n, 1)).astype(np.uint8), n)

    def test_upper_mac_random_slots(self):
        umac = UpperMac(log=lambda *a: None)
        rng = np.random.default_rng(7)
        t = TdmaTime(mn=1, fn=1, tn=1)
        for i in range(150):
            n = int(rng.integers(14, 269))
            bits = rng.integers(0, 2, size=n).astype(np.uint8)
            lchan = int(rng.integers(0, 12))
            umac.rx_slot(bits, lchan, True, t)
            t.add_tn(1)

    def test_receiver_random_stream(self):
        rx = TetraReceiver(log=lambda *a: None)
        rng = np.random.default_rng(8)
        for _ in range(4):
            rx.process_bits(rng.integers(0, 2, size=7000).astype(np.uint8))

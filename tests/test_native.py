"""Native C++ hot-path library vs the Python reference implementations."""
import numpy as np
import pytest

from tetra_tpu.crypto import native, tea, taa1
from tetra_tpu.ops.crc import crc16_bits_np, fcs32_np

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


class TestNativeCrypto:
    def test_tea_batch_matches_python(self):
        rng = np.random.default_rng(0)
        n = 8
        ivs = rng.integers(0, 1 << 29, size=n).astype(np.uint32)
        ecks = rng.integers(0, 256, size=(n, 10)).astype(np.uint8)
        for ksg, fn in ((1, tea.tea1), (2, tea.tea2), (3, tea.tea3)):
            out = native.tea_keystream_batch(ksg, ivs, ecks, 32)
            for i in range(n):
                expect = np.frombuffer(fn(int(ivs[i]), bytes(ecks[i]), 32),
                                       np.uint8)
                np.testing.assert_array_equal(out[i], expect)

    def test_tea_golden(self, golden):
        for ksg in (1, 2, 3):
            e = golden[f"tea{ksg}_1"]
            out = native.tea_keystream_batch(
                ksg, np.asarray([e["iv"]], np.uint32),
                np.asarray([e["key"]], np.uint8), 64)
            np.testing.assert_array_equal(out[0], np.asarray(e["ks"], np.uint8))

    def test_tb5(self, golden):
        e = golden["tb5"]
        cn = int.from_bytes(bytes(e["cn"]), "big")
        la = int.from_bytes(bytes(e["la"]), "big")
        assert native.tb5(cn, la, e["cc"][0], bytes(e["ck"])) == bytes(e["eck"])

    def test_crc16_batch(self):
        rng = np.random.default_rng(1)
        bits = rng.integers(0, 2, size=(6, 76)).astype(np.uint8)
        out = native.crc16_batch(bits)
        for i in range(6):
            assert out[i] == crc16_bits_np(bits[i])

    def test_fcs32_batch(self):
        rng = np.random.default_rng(2)
        for L in (8, 31, 64):
            bits = rng.integers(0, 2, size=(4, L)).astype(np.uint8)
            out = native.fcs32_batch(bits)
            for i in range(4):
                assert out[i] == fcs32_np(bits[i])

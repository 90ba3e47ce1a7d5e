"""Crypto suite parity against reference-generated golden vectors."""
import numpy as np
import pytest

from tetra_tpu.crypto import tea, hurdle, taa1


def b(e, k):
    return bytes(e[k])


class TestTEA:
    @pytest.mark.parametrize("v", range(3))
    def test_tea1(self, golden, v):
        e = golden[f"tea1_{v}"]
        assert tea.tea1(e["iv"], b(e, "key"), 64) == b(e, "ks")

    @pytest.mark.parametrize("v", range(3))
    def test_tea2(self, golden, v):
        e = golden[f"tea2_{v}"]
        assert tea.tea2(e["iv"], b(e, "key"), 64) == b(e, "ks")

    @pytest.mark.parametrize("v", range(3))
    def test_tea3(self, golden, v):
        e = golden[f"tea3_{v}"]
        assert tea.tea3(e["iv"], b(e, "key"), 64) == b(e, "ks")


class TestHurdle:
    def test_cbc(self, golden):
        e = golden["hurdle_cbc"]
        assert hurdle.enc_cbc(b(e, "pt"), b(e, "key")) == b(e, "ct")

    def test_cts(self, golden):
        e = golden["hurdle_cts"]
        assert hurdle.dec_cts(b(e, "sealed"), b(e, "key")) == b(e, "pt")


class TestTAA1:
    def test_ta11(self, golden):
        e = golden["ta11"]
        assert taa1.ta11_ta41(b(e, "k"), b(e, "rs")) == b(e, "ks")

    def test_ta12(self, golden):
        e = golden["ta12"]
        res, dck = taa1.ta12_ta22(b(e, "ks"), b(e, "rand"))
        assert res == b(e, "res") and dck == b(e, "dck")

    def test_ta21(self, golden):
        e = golden["ta21"]
        assert taa1.ta21(b(e, "k"), b(e, "rs")) == b(e, "ksp")

    def test_ta31_32(self, golden):
        e = golden["ta31_32"]
        sealed = taa1.ta31(b(e, "cck"), b(e, "cckid"), b(e, "dck"))
        assert sealed == b(e, "sealed")
        un, mf = taa1.ta32(sealed, b(e, "cckid"), b(e, "dck"))
        assert un == b(e, "unsealed") and mf == e["mf"]

    def test_ta51_52(self, golden):
        e = golden["ta51_52"]
        sealed = taa1.ta51(b(e, "sck"), b(e, "vn"), b(e, "key"), e["keyn"])
        assert sealed == b(e, "sealed")
        un, mf, keyn = taa1.ta52(sealed, b(e, "key"), b(e, "vn"))
        assert un == b(e, "unsealed") and mf == e["mf"] and keyn == e["keyn_out"]

    def test_ta71(self, golden):
        e = golden["ta71"]
        assert taa1.ta71(b(e, "gck"), b(e, "cck")) == b(e, "mgck")

    def test_ta81_82(self, golden):
        e = golden["ta81_82"]
        sealed = taa1.ta81(b(e, "gck"), b(e, "gckvn"), b(e, "gckn"), b(e, "key"))
        assert sealed == b(e, "sealed")
        un, mf, gckn = taa1.ta82(sealed, b(e, "gckvn"), b(e, "key"))
        assert un == b(e, "unsealed") and mf == e["mf"] and gckn == b(e, "gckn_out")

    def test_ta91_92(self, golden):
        e = golden["ta91_92"]
        sealed = taa1.ta91(b(e, "gsko"), b(e, "vn"), b(e, "key"))
        assert sealed == b(e, "sealed")
        un, mf = taa1.ta92(sealed, b(e, "vn"), b(e, "key"))
        assert un == b(e, "unsealed") and mf == e["mf"]

    def test_tb4(self, golden):
        e = golden["tb4"]
        assert taa1.tb4(b(e, "dck1"), b(e, "dck2")) == b(e, "dck")

    def test_tb5(self, golden):
        e = golden["tb5"]
        cn = int.from_bytes(b(e, "cn"), "big")
        la = int.from_bytes(b(e, "la"), "big")
        cc = e["cc"][0]
        assert taa1.tb5(cn, la, cc, b(e, "ck")) == b(e, "eck")

    def test_tb6(self, golden):
        e = golden["tb6"]
        cn = int.from_bytes(b(e, "cn"), "big")
        ssi_b = b(e, "ssi")
        ssi = (int.from_bytes(ssi_b[0:2], "big") << 8) | ssi_b[2]
        assert taa1.tb6(b(e, "sck"), cn, ssi) == b(e, "eck")

    def test_tb7(self, golden):
        e = golden["tb7"]
        assert taa1.tb7(b(e, "gsko")) == b(e, "egsko")

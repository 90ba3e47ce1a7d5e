"""The self-test CLI (conv_enc_test analogue) must pass end-to-end.

Reference behaviour: src/conv_enc_test.c runs the puncture/depuncture
self-test over all 9 channel configurations and a randomized
encode->decode soak, exiting non-zero on any failure.
"""
import pytest

from tetra_tpu import selftest


class TestSelftest:
    def test_puncture_configs_all_pass(self):
        assert selftest.punct_test() == 0

    def test_loopback_soak_zero_crc_errors(self):
        assert selftest.loopback_soak(iterations=32, seed=7) == 0

    def test_main_exits_zero(self, capsys):
        with pytest.raises(SystemExit) as e:
            selftest.main([])
        assert e.value.code == 0
        out = capsys.readouterr().out
        assert "total number of CRC Errors: 0" in out

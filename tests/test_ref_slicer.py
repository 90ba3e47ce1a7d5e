"""Slicer parity vs the COMPILED REFERENCE float_to_bits program.

reference src/float_to_bits.c is self-contained (thresholds at ±2/0,
the dibit map, and the optional one-pole pseudo-AFC with its ±5.0
update guard), so it compiles unmodified as an oracle binary. These
tests run it over random float symbol streams — uniform, threshold-
straddling, DC-drift ramps, out-of-guard spikes — and require
bit-exact agreement from both of our slicers:

  * dqpsk.float_to_bits   (device jit, no AFC)
  * dqpsk.phase_to_bits   (host, incl. -a / -f / -F pseudo-AFC modes,
                           float32-exact filter arithmetic)
"""
import os
import subprocess

import numpy as np
import pytest

from tetra_tpu.phy import dqpsk

REF_SRC = "/root/reference/src/float_to_bits.c"


@pytest.fixture(scope="session")
def slicer_bin(tmp_path_factory):
    if not os.path.isfile(REF_SRC):
        pytest.skip("reference tree not mounted")
    out = str(tmp_path_factory.mktemp("slicer") / "float_to_bits")
    try:
        subprocess.run(["gcc", "-O1", "-o", out, REF_SRC], check=True,
                       capture_output=True, timeout=120)
    except Exception as e:  # pragma: no cover
        pytest.skip(f"cannot compile reference slicer: {e}")
    return out


def run_oracle(binary, symbols, tmp_path, args=()):
    inf = tmp_path / "syms.f32"
    outf = tmp_path / "bits.out"
    np.asarray(symbols, np.float32).tofile(inf)
    subprocess.run([binary, *args, str(inf), str(outf)], check=True,
                   capture_output=True, timeout=120)
    return np.fromfile(outf, np.uint8)


def _streams():
    rng = np.random.default_rng(42)
    yield "uniform", rng.uniform(-4, 4, 20000).astype(np.float32)
    # values dense around every decision threshold (+2, 0, -2) incl.
    # exact threshold hits — the strict-inequality semantics must match
    base = rng.choice(np.asarray([2.0, 0.0, -2.0], np.float32), 20000)
    jit = rng.uniform(-1e-3, 1e-3, 20000).astype(np.float32)
    yield "thresholds", (base + jit * rng.integers(0, 2, 20000)).astype(
        np.float32)
    # ideal π/4-DQPSK symbols ±1/±3 with AWGN
    ideal = rng.choice(np.asarray([-3, -1, 1, 3], np.float32), 20000)
    yield "awgn", (ideal + rng.normal(0, 0.7, 20000)).astype(np.float32)
    # DC drift ramp: what the pseudo-AFC exists to remove
    ramp = np.linspace(0, 1.8, 20000).astype(np.float32)
    yield "ramp", (ideal + ramp + rng.normal(0, 0.3, 20000)).astype(
        np.float32)
    # spikes beyond the ±5 AFC update guard (filter must NOT move)
    spiky = (ideal + rng.normal(0, 0.3, 20000)).astype(np.float32)
    spiky[::37] = 7.5
    spiky[5::41] = -9.0
    yield "spikes", spiky


class TestSlicerParity:
    def test_no_afc_bit_exact(self, slicer_bin, tmp_path):
        for name, syms in _streams():
            want = run_oracle(slicer_bin, syms, tmp_path)
            got_dev = np.asarray(dqpsk.float_to_bits(syms)).astype(np.uint8)
            got_host = dqpsk.phase_to_bits(syms)
            assert np.array_equal(got_dev, want), name
            assert np.array_equal(got_host, want), name

    def test_afc_default_bit_exact(self, slicer_bin, tmp_path):
        for name, syms in _streams():
            want = run_oracle(slicer_bin, syms, tmp_path, args=("-a",))
            got = dqpsk.phase_to_bits(syms, afc=True)
            assert np.array_equal(got, want), name

    def test_afc_custom_filter_bit_exact(self, slicer_bin, tmp_path):
        for name, syms in _streams():
            want = run_oracle(slicer_bin, syms, tmp_path,
                              args=("-a", "-f", "0.01", "-F", "0.25"))
            got = dqpsk.phase_to_bits(syms, afc=True, filter_val=0.01,
                                      filter_goal=0.25)
            assert np.array_equal(got, want), name

    def test_afc_corrects_ramp(self, slicer_bin, tmp_path):
        """Sanity that -a is behaviourally meaningful, not a no-op: on
        the drift ramp the AFC slicer must disagree with the plain one
        (and we match both, per the tests above)."""
        syms = dict(_streams())["ramp"]
        plain = run_oracle(slicer_bin, syms, tmp_path)
        afc = run_oracle(slicer_bin, syms, tmp_path, args=("-a", "-f",
                                                           "0.01"))
        assert not np.array_equal(plain, afc)

"""Degraded-signal robustness: CFO ramps, sample-clock offset, static
phase, multipath — the slotwise demod (per-slot timing re-pick + blind
quadrupling-nonlinearity CFO correction) is the feed-forward substitute
for the reference's Costas + Mueller&Müller tracking loops
(reference src/demod/cqpsk.py:254-263)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.phy import dqpsk
from tetra_tpu.lmac import steady

INIT = scramb_get_init(262, 42, 1)
FSYM = 18000.0
FS = 36000.0  # sps=2


def _schf_iq(n_slots=16, seed=0):
    slots, payloads = [], []
    for s in range(n_slots):
        pdu = testpdu.make_resource_pdu(ssi=0x700 + s)
        payloads.append(pdu)
        slots.append(tx.make_schf_burst(pdu, testpdu.make_access_assign_bits(),
                                        jnp.uint32(INIT)))
    bits = np.concatenate([np.zeros(64, np.int8),
                           np.concatenate(slots).astype(np.int8),
                           np.zeros(64, np.int8)])
    return np.asarray(dqpsk.modulate(bits[None], sps=2))[0], payloads


def _awgn(iq, snr_db, seed=1):
    rng = np.random.default_rng(seed)
    sig = np.mean(np.abs(iq) ** 2)
    npow = sig / (10 ** (snr_db / 10))
    return (iq + rng.normal(0, np.sqrt(npow / 2), iq.shape)
            + 1j * rng.normal(0, np.sqrt(npow / 2), iq.shape)
            ).astype(np.complex64)


def _resample(iq, factor):
    """Bandlimited fractional resample: FFT-upsample 8x, then linear
    interp on the fine grid (np.interp directly on the 2-sps signal
    would itself inject several dB of interpolation distortion)."""
    n = iq.shape[0]
    up = 8
    spec = np.fft.fft(iq)
    spec_up = np.zeros(n * up, np.complex128)
    half = n // 2
    spec_up[:half] = spec[:half]
    spec_up[-(n - half):] = spec[half:]
    fine = np.fft.ifft(spec_up) * up
    src = np.clip(np.arange(n) * factor * up, 0, n * up - 1)
    re = np.interp(src, np.arange(n * up), np.real(fine))
    im = np.interp(src, np.arange(n * up), np.imag(fine))
    return (re + 1j * im).astype(np.complex64)


def _decode(iq, n_slots, fast="slotwise"):
    out = steady.locked_step_ri(
        jnp.asarray(np.real(iq)[None].astype(np.float32)),
        jnp.asarray(np.imag(iq)[None].astype(np.float32)),
        jnp.asarray(np.full(1, INIT, np.uint32)),
        phase_bit=64, n_slots=n_slots, decoders=("fused",), fast=fast)
    return np.asarray(out["crc_ok"])[0]


class TestDegraded:
    def test_clean_slotwise_matches(self):
        iq, p = _schf_iq()
        assert _decode(iq, len(p)).all()

    def test_static_cfo(self):
        """Constant 1 kHz carrier offset (>= the reference Costas range
        of +-0.025 * 36 kHz = +-900 Hz), 10 dB SNR."""
        iq, p = _schf_iq()
        t = np.arange(iq.shape[0]) / FS
        off = iq * np.exp(2j * np.pi * 1000.0 * t)
        ok = _decode(_awgn(off, 10), len(p))
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_cfo_ramp(self):
        """CFO ramping 0 -> 1.5 kHz across the chunk, 10 dB SNR: the
        per-slot estimate tracks the ramp."""
        iq, p = _schf_iq()
        t = np.arange(iq.shape[0]) / FS
        f = 1500.0 * t / t[-1]
        phase = 2 * np.pi * np.cumsum(f) / FS
        ok = _decode(_awgn(iq * np.exp(1j * phase), 10), len(p))
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_static_phase_offset(self):
        """Differential detection is invariant to constant phase."""
        iq, p = _schf_iq()
        ok = _decode(_awgn(iq * np.exp(1j * 1.1), 12), len(p))
        assert ok.all()

    def test_sample_clock_offset(self):
        """+-40 ppm sample-clock error (~0.01 symbol drift per slot):
        per-slot timing re-pick holds an 11 dB hard-decision floor (the
        residual <=T/16 sampling error costs ~0.5 dB vs the clean 10 dB
        floor; the soft-decision path recovers it, see TestDegradedSoft)."""
        iq, p = _schf_iq()
        for ppm in (40e-6, -40e-6):
            warped = _resample(iq, 1.0 + ppm)
            ok = _decode(_awgn(warped, 11, seed=3), len(p))
            assert ok.all(), f"ppm={ppm}: {ok.sum()}/{len(ok)}"

    def test_cfo_plus_clock_drift(self):
        """Combined stress: 800 Hz CFO ramp + 30 ppm clock error, 10 dB."""
        iq, p = _schf_iq()
        n = iq.shape[0]
        warped = _resample(iq, 1.0 + 30e-6)
        t = np.arange(n) / FS
        f = 800.0 * t / t[-1]
        phase = 2 * np.pi * np.cumsum(f) / FS
        ok = _decode(_awgn(warped * np.exp(1j * phase), 10, seed=4), len(p))
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_two_tap_channel(self):
        """Static 2-tap multipath (half-symbol echo at -12 dB), 18 dB
        SNR: differential detection + FEC absorb the ISI."""
        iq, p = _schf_iq()
        h = np.array([1.0, 0.25 * np.exp(1j * 0.7)], np.complex64)
        faded = np.convolve(iq, h)[: iq.shape[0]]
        ok = _decode(_awgn(faded, 18, seed=5), len(p))
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_soft_decision_floor(self):
        """fast="soft" (soft Viterbi inputs + nearest-template
        classification): whole-chain floor ~6 dB clean, ~4 dB below the
        hard-decision chain. Tested at 7 dB with margin."""
        iq, p = _schf_iq()
        for seed in (1, 2, 3):
            ok = _decode(_awgn(iq, 7, seed=seed), len(p), fast="soft")
            assert ok.all(), f"seed={seed}: {ok.sum()}/{len(ok)}"

    def test_soft_under_drift(self):
        """Soft path at 8 dB under 40 ppm clock drift AND a 1.5 kHz CFO
        ramp (separately)."""
        iq, p = _schf_iq()
        w = _resample(iq, 1.0 + 40e-6)
        ok = _decode(_awgn(w, 8, seed=3), len(p), fast="soft")
        assert ok.all(), f"sco: {ok.sum()}/{len(ok)}"
        t = np.arange(iq.shape[0]) / FS
        ph = 2 * np.pi * np.cumsum(1500.0 * t / t[-1]) / FS
        ok = _decode(_awgn(iq * np.exp(1j * ph), 8, seed=1), len(p),
                     fast="soft")
        assert ok.all(), f"cfo ramp: {ok.sum()}/{len(ok)}"

    def test_fast_path_fails_where_slotwise_holds(self):
        """The per-chunk fast demod has no CFO correction: a 1 kHz
        offset must break it while the slotwise path decodes — guards
        against the stress tests silently passing for the wrong reason."""
        iq, p = _schf_iq()
        t = np.arange(iq.shape[0]) / FS
        off = _awgn(iq * np.exp(2j * np.pi * 1000.0 * t), 10)
        ok_fast = _decode(off, len(p), fast=True)
        ok_slot = _decode(off, len(p), fast="slotwise")
        assert ok_slot.all()
        assert not ok_fast.all()


class TestEqualized:
    """fast="eq": per-slot pilot-aided T/2 equalizer (phy/equalize.py,
    the CMA-equalizer analogue of simdemod3.py done feed-forward)."""

    def test_clean(self):
        iq, p = _schf_iq()
        ok = _decode(_awgn(iq, 12), len(p), fast="eq")
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_two_tap_channel_low_snr(self):
        """Same -12 dB half-symbol echo the plain slotwise path needs
        18 dB for — equalized, 12 dB suffices."""
        iq, p = _schf_iq()
        h = np.array([1.0, 0.25 * np.exp(1j * 0.7)], np.complex64)
        faded = np.convolve(iq, h)[: iq.shape[0]]
        ok = _decode(_awgn(faded, 12, seed=5), len(p), fast="eq")
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_strong_echo(self):
        """-6 dB echo at a full symbol: severe ISI, unequalized chains
        fail at any SNR; the 3-tap T/2 equalizer holds 16 dB."""
        iq, p = _schf_iq()
        h = np.array([1.0, 0.0, 0.5 * np.exp(1j * 2.1)], np.complex64)
        faded = np.convolve(iq, h)[: iq.shape[0]]
        ok_eq = _decode(_awgn(faded, 16, seed=6), len(p), fast="eq")
        assert ok_eq.all(), f"eq: {ok_eq.sum()}/{len(ok_eq)}"
        ok_slot = _decode(_awgn(faded, 30, seed=6), len(p), fast="slotwise")
        assert not ok_slot.all(), "unequalized slotwise path should fail here"

    def test_multipath_plus_cfo(self):
        """-12 dB echo + 800 Hz CFO, 14 dB: the blind CFO estimate and
        the pilot fit compose."""
        iq, p = _schf_iq()
        h = np.array([1.0, 0.25 * np.exp(1j * 0.7)], np.complex64)
        faded = np.convolve(iq, h)[: iq.shape[0]]
        t = np.arange(faded.shape[0]) / FS
        off = faded * np.exp(2j * np.pi * 800.0 * t)
        ok = _decode(_awgn(off, 14, seed=7), len(p), fast="eq")
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

    def test_mixed_sync_normal(self):
        """Pilot-hypothesis selection: a stream mixing SYNC and SCH/F
        bursts equalizes each slot with its own training sequence."""
        slots = []
        kinds = []
        for s in range(8):
            if s % 3 == 0:
                slots.append(tx.make_sync_burst(
                    testpdu.make_sync_pdu(mcc=262, mnc=42, cc=1),
                    testpdu.make_sysinfo_pdu(),
                    testpdu.make_access_assign_bits(), jnp.uint32(INIT)))
                kinds.append(0)
            else:
                slots.append(tx.make_schf_burst(
                    testpdu.make_resource_pdu(ssi=0x700 + s),
                    testpdu.make_access_assign_bits(), jnp.uint32(INIT)))
                kinds.append(1)
        bits = np.concatenate([np.zeros(64, np.int8),
                               np.concatenate(slots).astype(np.int8),
                               np.zeros(64, np.int8)])
        iq = np.asarray(dqpsk.modulate(bits[None], sps=2))[0]
        h = np.array([1.0, 0.25 * np.exp(1j * 0.7)], np.complex64)
        faded = np.convolve(iq, h)[: iq.shape[0]]
        out = steady.locked_step_ri(
            jnp.asarray(np.real(faded)[None].astype(np.float32)),
            jnp.asarray(np.imag(faded)[None].astype(np.float32)),
            jnp.asarray(np.full(1, INIT, np.uint32)),
            phase_bit=64, n_slots=8, decoders=("fused",), fast="eq")
        ok = np.asarray(out["crc_ok"])[0]
        got_kinds = np.asarray(out["kinds"])[0]
        np.testing.assert_array_equal(got_kinds, kinds)
        assert ok.all(), f"{ok.sum()}/{len(ok)}"

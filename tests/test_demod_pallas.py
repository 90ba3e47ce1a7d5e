"""Pallas fused demodulator vs the XLA reference (interpret mode).

Both versions run the identical math (RRC matched filter, differential
phasor, trig-free slicing, |sin 2θ| timing metric); in interpret mode
on CPU the FIR matmuls are exact f32, so decisions must match bitwise.
"""
import numpy as np
import jax.numpy as jnp

from tetra_tpu.phy import dqpsk
from tetra_tpu.phy.demod_pallas import demodulate_hard_ri_pallas


def _signal(rng, C, n_sym, sps=2, snr_db=None):
    bits = rng.integers(0, 2, size=(C, 2 * n_sym)).astype(np.uint8)
    iq = dqpsk.modulate(bits, sps=sps)
    if snr_db is not None:
        p = np.mean(np.abs(iq) ** 2)
        sigma = np.sqrt(p / (2 * 10 ** (snr_db / 10.0)))
        iq = iq + sigma * (rng.standard_normal(iq.shape)
                           + 1j * rng.standard_normal(iq.shape))
    return (jnp.asarray(np.real(iq), jnp.float32),
            jnp.asarray(np.imag(iq), jnp.float32))


class TestDemodPallas:
    def test_clean_matches_xla(self):
        rng = np.random.default_rng(11)
        re, im = _signal(rng, C=5, n_sym=700)
        ref = np.asarray(dqpsk.demodulate_hard_ri(re, im))
        out = np.asarray(demodulate_hard_ri_pallas(
            re, im, tile_c=4, tile_t=256, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_noisy_matches_xla(self):
        """At 8 dB both versions see the same noise; exact-f32 interpret
        mode must agree bitwise (same ops, same inputs)."""
        rng = np.random.default_rng(12)
        re, im = _signal(rng, C=3, n_sym=600, snr_db=8.0)
        ref = np.asarray(dqpsk.demodulate_hard_ri(re, im))
        out = np.asarray(demodulate_hard_ri_pallas(
            re, im, tile_c=8, tile_t=128, interpret=True))
        assert np.mean(out != ref) < 1e-3  # matmul blocking rounding only

    def test_timing_phase_offset(self):
        """A one-sample delay moves the optimum sampling instant to the
        other phase; both demods must track it identically."""
        rng = np.random.default_rng(13)
        re, im = _signal(rng, C=4, n_sym=500)
        re = jnp.pad(re, ((0, 0), (1, 0)))[:, :-1]
        im = jnp.pad(im, ((0, 0), (1, 0)))[:, :-1]
        ref = np.asarray(dqpsk.demodulate_hard_ri(re, im))
        out = np.asarray(demodulate_hard_ri_pallas(
            re, im, tile_c=4, tile_t=256, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_ragged_tiles(self):
        """C and T not multiples of the tile sizes pad and unpad cleanly."""
        rng = np.random.default_rng(14)
        re, im = _signal(rng, C=7, n_sym=301)
        ref = np.asarray(dqpsk.demodulate_hard_ri(re, im))
        out = np.asarray(demodulate_hard_ri_pallas(
            re, im, tile_c=4, tile_t=256, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_single_block(self):
        rng = np.random.default_rng(15)
        re, im = _signal(rng, C=2, n_sym=64)
        ref = np.asarray(dqpsk.demodulate_hard_ri(re, im))
        out = np.asarray(demodulate_hard_ri_pallas(
            re, im, tile_c=2, tile_t=512, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_slot_framed_output_matches_slice(self):
        """demodulate_hard_slots_ri_pallas == slicing the bit stream at
        phase_bit and reshaping into slots (the path it replaces)."""
        from tetra_tpu.phy.demod_pallas import demodulate_hard_slots_ri_pallas
        rng = np.random.default_rng(16)
        n_slots, phase_bit = 3, 64
        re, im = _signal(rng, C=5, n_sym=(phase_bit + n_slots * 510) // 2 + 40)
        bits_ref = np.asarray(demodulate_hard_ri_pallas(
            re, im, tile_c=4, tile_t=256, interpret=True))
        want = bits_ref[:, phase_bit: phase_bit + n_slots * 510].reshape(
            5, n_slots, 510)
        slots, bits = demodulate_hard_slots_ri_pallas(
            re, im, n_slots, phase_bit=phase_bit, tile_c=4, tile_t=256,
            interpret=True)
        np.testing.assert_array_equal(np.asarray(slots), want)
        np.testing.assert_array_equal(np.asarray(bits), bits_ref)

"""Wideband channelizer: multi-carrier extraction + demod roundtrip."""
import numpy as np
import jax.numpy as jnp

from tetra_tpu.phy import channelizer, dqpsk


class TestChannelizer:
    def test_three_carrier_roundtrip(self):
        """3 DQPSK carriers at ±25 kHz offsets in a 144 kHz capture
        decode back to their transmitted bits after channelization."""
        rng = np.random.default_rng(0)
        C, nsym = 3, 400
        bits = rng.integers(0, 2, size=(C, 2 * nsym)).astype(np.int8)
        base = dqpsk.modulate(bits, sps=2)                     # [C, 800] @36k
        offsets = np.array([-25_000.0, 0.0, 25_000.0], np.float32)
        wide = channelizer.synthesize_wideband(base, offsets, fs=144_000.0)
        chans = np.asarray(channelizer.channelize(
            jnp.asarray(wide), jnp.asarray(offsets), fs=144_000.0))
        assert chans.shape[0] == C
        syms = np.asarray(dqpsk.demodulate(jnp.asarray(chans), sps=2))
        out = np.asarray(dqpsk.float_to_bits(jnp.asarray(syms)))
        margin = 2 * 24
        n = min(out.shape[-1], bits.shape[-1]) - margin
        errs = (out[:, margin:n] != bits[:, margin:n]).mean()
        assert errs == 0.0, f"bit error rate {errs}"

    def test_carrier_isolation(self):
        """A strong neighbouring carrier must not corrupt decode."""
        rng = np.random.default_rng(1)
        nsym = 300
        bits = rng.integers(0, 2, size=(2, 2 * nsym)).astype(np.int8)
        base = dqpsk.modulate(bits, sps=2)
        base[1] *= 3.0  # neighbour 10 dB stronger
        offsets = np.array([0.0, 25_000.0], np.float32)
        wide = channelizer.synthesize_wideband(base, offsets, fs=144_000.0)
        chans = np.asarray(channelizer.channelize(
            jnp.asarray(wide), jnp.asarray(offsets[:1]), fs=144_000.0))
        syms = np.asarray(dqpsk.demodulate(jnp.asarray(chans), sps=2))
        out = np.asarray(dqpsk.float_to_bits(jnp.asarray(syms)))[0]
        margin = 2 * 24
        n = min(len(out), bits.shape[-1]) - margin
        errs = (out[margin:n] != bits[0, margin:n]).mean()
        assert errs == 0.0, f"bit error rate {errs}"


class TestPlanarChannelizer:
    def test_matches_complex_path(self):
        rng = np.random.default_rng(3)
        wide = (rng.normal(0, 1, 4096) + 1j * rng.normal(0, 1, 4096)).astype(np.complex64)
        offsets = np.array([-25_000.0, 0.0, 25_000.0], np.float32)
        ref = np.asarray(channelizer.channelize(
            jnp.asarray(wide), jnp.asarray(offsets), fs=144_000.0))
        out_r, out_i = channelizer.channelize_ri(
            jnp.asarray(np.real(wide).astype(np.float32)),
            jnp.asarray(np.imag(wide).astype(np.float32)),
            jnp.asarray(offsets), fs=144_000.0)
        got = np.asarray(out_r) + 1j * np.asarray(out_i)
        np.testing.assert_allclose(got, ref, rtol=0, atol=2e-4)

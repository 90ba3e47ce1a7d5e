"""PFB channelizer: tone separation + full DQPSK roundtrip per channel."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu.phy import pfb, dqpsk


class TestPfb:
    def test_tone_lands_in_its_channel(self):
        n_chan = 16
        fs = n_chan * 25_000.0
        T = n_chan * 512
        t = np.arange(T) / fs
        for c in (1, 5, n_chan - 2):
            tone = np.exp(2j * np.pi * (c * fs / n_chan) * t).astype(np.complex64)
            cr, ci = pfb.pfb_channelize_ri(
                jnp.asarray(np.real(tone).astype(np.float32)),
                jnp.asarray(np.imag(tone).astype(np.float32)), n_chan)
            power = np.asarray(cr) ** 2 + np.asarray(ci) ** 2
            # steady-state region (skip filter warmup)
            p = power[:, 32:].mean(axis=1)
            assert p.argmax() == c
            # adjacent-channel rejection > 20 dB
            others = np.delete(p, c)
            assert p[c] > 100 * others.max()

    def test_dqpsk_roundtrip_through_pfb(self):
        """Modulated carriers on channel centres -> PFB -> resample ->
        demod -> exact bits."""
        n_chan = 8
        fs = n_chan * 25_000.0
        rng = np.random.default_rng(0)
        nsym = 600
        chans = [1, 3, 6]
        bits = rng.integers(0, 2, size=(len(chans), 2 * nsym)).astype(np.int8)
        base = dqpsk.modulate(bits, sps=2)          # [Csel, n*2] @36k
        # upsample each to fs and mix to its channel centre
        from tetra_tpu.phy.channelizer import synthesize_wideband
        offsets = np.array([c * fs / n_chan for c in chans], np.float32)
        # represent >Nyquist/2 channels as their aliases
        offsets = np.where(offsets > fs / 2, offsets - fs, offsets)
        wide = synthesize_wideband(base, offsets, fs=fs)

        out_r, out_i = pfb.pfb_to_demod_rate_ri(
            jnp.asarray(np.real(wide).astype(np.float32)),
            jnp.asarray(np.imag(wide).astype(np.float32)),
            jnp.asarray(np.array(chans, np.int32)), n_chan, fs)
        syms = dqpsk.demodulate_ri(out_r, out_i, sps=2, est_cfo=True)
        out = np.asarray(dqpsk.float_to_bits(syms))
        margin = 2 * 40
        n = min(out.shape[-1], bits.shape[-1]) - margin
        errs = (out[:, margin:n] != bits[:, margin:n]).mean()
        assert errs == 0.0, f"bit error rate {errs}"

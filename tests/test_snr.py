"""SNR robustness: the feed-forward demod + erasure-aware Viterbi must
decode cleanly at moderate SNR (the BASELINE 'within its SNR bound'
correctness criterion; the reference's hard-decision chain has a
comparable operating point by construction)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.phy import dqpsk
from tetra_tpu.lmac import steady

INIT = scramb_get_init(262, 42, 1)


def _schf_iq(n_slots=8, seed=0):
    rng = np.random.default_rng(seed)
    slots = []
    payloads = []
    for s in range(n_slots):
        pdu = testpdu.make_resource_pdu(ssi=0x600 + s)
        payloads.append(pdu)
        slots.append(tx.make_schf_burst(pdu, testpdu.make_access_assign_bits(),
                                        jnp.uint32(INIT)))
    bits = np.concatenate([np.zeros(64, np.int8),
                           np.concatenate(slots).astype(np.int8),
                           np.zeros(64, np.int8)])
    return dqpsk.modulate(bits[None], sps=2), payloads


class TestSnr:
    @pytest.mark.parametrize("snr_db", [25, 18, 14])
    def test_decode_at_snr(self, snr_db):
        iq, payloads = _schf_iq()
        rng = np.random.default_rng(snr_db)
        sig_pow = np.mean(np.abs(iq) ** 2)
        noise_pow = sig_pow / (10 ** (snr_db / 10))
        noise = (rng.normal(0, np.sqrt(noise_pow / 2), iq.shape)
                 + 1j * rng.normal(0, np.sqrt(noise_pow / 2), iq.shape))
        noisy = (iq + noise).astype(np.complex64)
        out = steady.locked_step_ri(
            jnp.asarray(np.real(noisy).astype(np.float32)),
            jnp.asarray(np.imag(noisy).astype(np.float32)),
            jnp.asarray(np.full(1, INIT, np.uint32)),
            phase_bit=64, n_slots=len(payloads), decoders=("schf",))
        ok = np.asarray(out["crc_ok"])[0]
        # at >=14 dB every slot decodes; the FEC absorbs residual bit errors
        assert ok.all(), f"SNR {snr_db} dB: {ok.sum()}/{len(ok)} slots ok"
        for s, pdu in enumerate(payloads):
            np.testing.assert_array_equal(np.asarray(out["schf"].type1[0, s]), pdu)

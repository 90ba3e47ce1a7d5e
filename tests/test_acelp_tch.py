"""ACELP reordering golden parity + TCH/S speech FEC loopback."""
import numpy as np
import jax.numpy as jnp

from tetra_tpu.ops import acelp
from tests.conftest import arr


class TestAcelpReorder:
    def test_golden_parity(self, golden):
        """Compare against the reference oracle on the well-defined
        positions (the reference's class-0 table has a phantom 51st
        entry that triggers UB writes to out[-1]; those positions and
        the possibly-corrupted in[431] are excluded)."""
        e = golden["acelp_reorder"]
        tin = arr(e, "type2")[:274]
        ref_codec = arr(e, "codec")[:274]
        out = np.asarray(acelp.type2_to_codec(jnp.asarray(tin)))
        fwd = acelp._maps()
        defined = fwd >= 0
        # codec[136] (= out[1*137 - 1]) is overwritten by the reference's
        # phantom class-0 pair (the out[-1]/out[136] UB writes) — exclude
        defined[136] = False
        np.testing.assert_array_equal(out[defined], ref_codec[defined])

    def test_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.integers(0, 2, size=(3, 274)).astype(np.int8)
        codec = acelp.type2_to_codec(jnp.asarray(x))
        back = np.asarray(acelp.codec_to_type2(codec))
        fwd = acelp._maps()
        # positions that survive the forward map round-trip exactly
        surviving = np.zeros(274, dtype=bool)
        surviving[fwd[fwd >= 0]] = True
        np.testing.assert_array_equal(back[:, surviving], x[:, surviving])


class TestTchS:
    def test_speech_fec_loopback(self):
        rng = np.random.default_rng(1)
        c0 = rng.integers(0, 2, size=(4, 102)).astype(np.int8)
        c1 = rng.integers(0, 2, size=(4, 108)).astype(np.int8)
        c2 = rng.integers(0, 2, size=(4, 64)).astype(np.int8)
        t3 = acelp.tch_s_encode(jnp.asarray(c0), jnp.asarray(c1), jnp.asarray(c2))
        assert t3.shape == (4, 432)
        d0, d1, d2, ok1, ok2 = acelp.tch_s_decode(t3)
        np.testing.assert_array_equal(np.asarray(d0), c0)
        np.testing.assert_array_equal(np.asarray(d1), c1)
        np.testing.assert_array_equal(np.asarray(d2), c2)
        assert np.asarray(ok1).all() and np.asarray(ok2).all()

    def test_speech_fec_erasure_tolerance(self):
        """Class-2 protection (72/162, the least-punctured speech rate)
        must absorb a single erased output bit."""
        rng = np.random.default_rng(2)
        c2 = rng.integers(0, 2, size=(1, 68)).astype(np.int8)
        tail = np.zeros((1, 4), np.int8)
        from tetra_tpu.ops import rcpc, viterbi
        from tetra_tpu import constants as C
        t2 = np.concatenate([c2, tail], axis=-1)
        m = rcpc.conv_encode(jnp.asarray(t2), C.CONV_GENERATORS_TCH)
        p = rcpc.puncture("72_162", m, 162)
        soft = rcpc.depuncture_soft(
            "72_162", (1.0 - 2.0 * np.asarray(p)).astype(np.float32) * 127.0, 72 * 3)
        soft = np.array(soft)  # writable copy
        soft[:, 60] = 0.0  # erase one output bit
        d = viterbi.decode(jnp.asarray(soft), 72, C.CONV_GENERATORS_TCH)
        np.testing.assert_array_equal(np.asarray(d)[:, :68], c2)

"""Burst build/split golden parity + full encode->decode loopback.

The loopback mirrors the reference's only automated correctness check
(conv_enc_test.c:198-305 + 100-PDU soak at :335-346).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import constants as C, tx
from tetra_tpu.phy import burst as burst_mod
from tetra_tpu.lmac import pipeline
from tetra_tpu.ops import scramble
from tests.conftest import arr


# The reference's put_phase_adj_bits (tetra_burst.c:162) indexes its
# phase2bits table without the PHASE()+3 offset — undefined behaviour for
# negative adjustments, so the golden bytes at the 4 phase-adjustment bit
# positions are linker-dependent garbage. We emit the spec-intended symbol
# instead and exclude those positions (never read by any rx path) here.
_PHASE_ADJ_POSITIONS = [12, 13, 498, 499]


def _mask_phase_adj(burst):
    out = np.asarray(burst).copy()
    out[_PHASE_ADJ_POSITIONS] = 0
    return out


class TestBurstGolden:
    def test_sync_burst(self, golden):
        e = golden["burst_sync"]
        out = burst_mod.build_sync_c_d_burst(arr(e, "sb"), arr(e, "bb"), arr(e, "bkn"))
        np.testing.assert_array_equal(_mask_phase_adj(out), _mask_phase_adj(arr(e, "burst")))

    def test_norm_burst(self, golden):
        for name, two in (("burst_norm0", False), ("burst_norm1", True)):
            e = golden[name]
            out = burst_mod.build_norm_c_d_burst(
                arr(e, "bkn1"), arr(e, "bb"), arr(e, "bkn2"), two)
            np.testing.assert_array_equal(_mask_phase_adj(out), _mask_phase_adj(arr(e, "burst")))

    def test_phase_adj_intent(self, golden):
        """The emitted adjustment symbol must cancel the windowed phase sum
        (the standard's intent for hc/hd: total ≡ 0 mod 8 quarter-turns)."""
        e = golden["burst_sync"]
        out = burst_mod.build_sync_c_d_burst(arr(e, "sb"), arr(e, "bb"), arr(e, "bkn"))
        for which, pos in (("HC", 12), ("HD", 498)):
            n1, n2 = C.PHASE_ADJ_N[which]
            seg = out[2 * (n1 - 1): 2 * (n1 - 1) + 2 * (1 + n2 - n1)]
            adj_sym = C.BITS2PHASE[(int(out[pos]), int(out[pos + 1]))]
            # adjustment phase (as transmitted, PHASE2BITS map) + window sum ≡ 0 (mod 8)
            adj = burst_mod.calc_phase_adj(burst_mod.sum_up_phase(seg))
            assert (int(np.fmod(burst_mod.sum_up_phase(seg) + adj, 8))) % 8 == 0
            assert C.PHASE2BITS[adj] == (int(out[pos]), int(out[pos + 1]))
            del adj_sym

    def test_split_sync_burst(self, golden):
        e = golden["burst_sync"]
        sb1, bbk, sb2 = burst_mod.split_sync_burst(jnp.asarray(arr(e, "burst")))
        np.testing.assert_array_equal(np.asarray(sb1), arr(e, "sb"))
        np.testing.assert_array_equal(np.asarray(bbk), arr(e, "bb"))
        np.testing.assert_array_equal(np.asarray(sb2), arr(e, "bkn"))

    def test_find_train_seq_golden(self, golden):
        e = golden["train_seq_sync"]
        stream = jnp.asarray(arr(e, "stream")[:900])
        tid, off, found = burst_mod.find_train_seq(stream, 1 << C.TETRA_TRAIN_SYNC)
        assert bool(np.asarray(found))
        assert int(np.asarray(tid)) == int(e["rc"])
        assert int(np.asarray(off)) == int(e["offset"])

    def test_find_train_seq_batched(self):
        rng = np.random.default_rng(11)
        streams = rng.integers(0, 2, size=(4, 600)).astype(np.int8)
        offs = [37, 100, 211, 0]
        for i, o in enumerate(offs):
            streams[i, o:o + len(C.TRAIN_Y)] = C.TRAIN_Y
        tid, off, found = burst_mod.find_train_seq(
            jnp.asarray(streams), 1 << C.TETRA_TRAIN_SYNC)
        # random prefix could by chance contain the 38-bit sequence: it can't
        assert np.asarray(found).all()
        assert np.asarray(tid).tolist() == [C.TETRA_TRAIN_SYNC] * 4
        assert np.asarray(off).tolist() == offs


class TestLoopback:
    """TX chain -> burst -> split -> lower-MAC decode must be identity."""

    def _rand_pdu(self, rng, n):
        return rng.integers(0, 2, size=n).astype(np.int8)

    def test_sync_burst_loopback(self):
        rng = np.random.default_rng(20)
        init = scramble.scramb_get_init(262, 42, 1)
        for _ in range(3):
            sync = self._rand_pdu(rng, 60)
            sysinfo = self._rand_pdu(rng, 124)
            aach = self._rand_pdu(rng, 14)
            burst = tx.make_sync_burst(sync, sysinfo, aach, jnp.uint32(init))
            # training sequence lands at the expected offset
            assert np.array_equal(burst[214:252], C.TRAIN_Y)
            res = pipeline.decode_sync_burst(jnp.asarray(burst), jnp.uint32(init))
            assert bool(np.asarray(res["SB1"].crc_ok))
            assert bool(np.asarray(res["SB2"].crc_ok))
            np.testing.assert_array_equal(np.asarray(res["SB1"].type1), sync)
            np.testing.assert_array_equal(np.asarray(res["SB2"].type1), sysinfo)
            np.testing.assert_array_equal(np.asarray(res["BBK"].type1), aach)

    def test_schf_burst_loopback(self):
        rng = np.random.default_rng(21)
        init = scramble.scramb_get_init(901, 7, 5)
        for _ in range(3):
            schf = self._rand_pdu(rng, 268)
            aach = self._rand_pdu(rng, 14)
            burst = tx.make_schf_burst(schf, aach, jnp.uint32(init))
            assert np.array_equal(burst[244:266], C.TRAIN_N)
            res = pipeline.decode_schf_burst(jnp.asarray(burst), jnp.uint32(init))
            assert bool(np.asarray(res["SCH_F"].crc_ok))
            np.testing.assert_array_equal(np.asarray(res["SCH_F"].type1), schf)
            np.testing.assert_array_equal(np.asarray(res["BBK"].type1), aach)

    def test_ndb_burst_loopback(self):
        rng = np.random.default_rng(22)
        init = scramble.scramb_get_init(100, 200, 33)
        blk1 = self._rand_pdu(rng, 124)
        blk2 = self._rand_pdu(rng, 124)
        aach = self._rand_pdu(rng, 14)
        burst = tx.make_ndb_burst(blk1, blk2, aach, jnp.uint32(init))
        assert np.array_equal(burst[244:266], C.TRAIN_P)
        res = pipeline.decode_ndb_burst(jnp.asarray(burst), jnp.uint32(init))
        assert bool(np.asarray(res["NDB1"].crc_ok))
        assert bool(np.asarray(res["NDB2"].crc_ok))
        np.testing.assert_array_equal(np.asarray(res["NDB1"].type1), blk1)
        np.testing.assert_array_equal(np.asarray(res["NDB2"].type1), blk2)

    def test_batched_soak(self):
        """100-PDU randomized soak, batched — the conv_enc_test.c:335-346
        analogue, decoded in one shot."""
        rng = np.random.default_rng(23)
        init = scramble.scramb_get_init(262, 42, 1)
        schf = rng.integers(0, 2, size=(100, 268)).astype(np.int8)
        aach = rng.integers(0, 2, size=(100, 14)).astype(np.int8)
        t5 = np.asarray(tx.encode_block("SCH_F", jnp.asarray(schf), jnp.uint32(init)))
        bb = np.asarray(tx.encode_bbk(jnp.asarray(aach), jnp.uint32(init)))
        bursts = np.stack([
            burst_mod.build_norm_c_d_burst(t5[i, :216], bb[i], t5[i, 216:], False)
            for i in range(100)])
        res = pipeline.decode_schf_burst(jnp.asarray(bursts), jnp.uint32(init))
        assert np.asarray(res["SCH_F"].crc_ok).all()
        np.testing.assert_array_equal(np.asarray(res["SCH_F"].type1), schf)

    def test_sb1_sync_fields(self):
        rng = np.random.default_rng(24)
        sync = np.zeros(60, dtype=np.int8)
        # craft: cc=5, tn=2(enc 1), fn=7, mn=33, mcc=262, mnc=42
        from tetra_tpu.utils.bits import uint_to_bits
        sync[4:10] = uint_to_bits(5, 6)
        sync[10:12] = uint_to_bits(1, 2)
        sync[12:17] = uint_to_bits(7, 5)
        sync[17:23] = uint_to_bits(33, 6)
        sync[31:41] = uint_to_bits(262, 10)
        sync[41:55] = uint_to_bits(42, 14)
        f = pipeline.sb1_sync_fields(jnp.asarray(sync))
        assert int(f["colour_code"]) == 5
        assert int(f["tn"]) == 2
        assert int(f["fn"]) == 7
        assert int(f["mn"]) == 33
        assert int(f["mcc"]) == 262
        assert int(f["mnc"]) == 42
        assert int(f["scramb_init"]) == scramble.scramb_get_init(262, 42, 5)

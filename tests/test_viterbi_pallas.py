"""Pallas fused Viterbi kernel vs the XLA scan reference (interpret mode)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu.ops import rcpc, viterbi
from tetra_tpu.ops.viterbi_pallas import decode_pallas
from tetra_tpu.constants import CONV_GENERATORS_TCH


class TestPallasViterbi:
    def test_clean_roundtrip(self):
        rng = np.random.default_rng(1)
        data = rng.integers(0, 2, size=(16, 80)).astype(np.int8)
        data[:, -4:] = 0
        mother = rcpc.conv_encode(jnp.asarray(data))
        soft = jnp.asarray((1.0 - 2.0 * np.asarray(mother)) * 127.0)
        out = np.asarray(decode_pallas(soft, 80, tile_b=8, interpret=True))
        np.testing.assert_array_equal(out, data)

    def test_matches_scan_on_quantized_garbage(self):
        rng = np.random.default_rng(2)
        soft = jnp.asarray((rng.integers(-1, 2, size=(24, 80 * 4)) * 127)
                           .astype(np.float32))
        ref = np.asarray(viterbi.decode(soft, 80))
        out = np.asarray(decode_pallas(soft, 80, tile_b=8, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_batch_padding(self):
        """Batch not divisible by the tile size pads and unpads cleanly."""
        rng = np.random.default_rng(3)
        data = rng.integers(0, 2, size=(5, 80)).astype(np.int8)
        data[:, -4:] = 0
        mother = rcpc.conv_encode(jnp.asarray(data))
        soft = jnp.asarray((1.0 - 2.0 * np.asarray(mother)) * 127.0)
        out = np.asarray(decode_pallas(soft, 80, tile_b=4, interpret=True))
        np.testing.assert_array_equal(out, data)

    def test_int8_soft_matches_scan(self):
        """The pipeline's TPU path feeds ±127/0 int8 soft bits into the
        packed-int32 radix-16 kernel (lmac/pipeline.py::_decode_fec);
        decisions must match the f32 scan reference including garbage
        ties. n_sym=288 is the SCH/F layout the FEC bench runs."""
        rng = np.random.default_rng(7)
        raw = (rng.integers(-1, 2, size=(24, 288 * 4)) * 127)
        ref = np.asarray(viterbi.decode(jnp.asarray(raw.astype(np.float32)),
                                        288))
        out = np.asarray(decode_pallas(jnp.asarray(raw.astype(np.int8)),
                                       288, tile_b=8, interpret=True))
        np.testing.assert_array_equal(out, ref)

    def test_tch_generators(self):
        rng = np.random.default_rng(4)
        data = rng.integers(0, 2, size=(8, 72)).astype(np.int8)
        data[:, -4:] = 0
        mother = rcpc.conv_encode(jnp.asarray(data), CONV_GENERATORS_TCH)
        soft = jnp.asarray((1.0 - 2.0 * np.asarray(mother)) * 127.0)
        out = np.asarray(decode_pallas(soft, 72, CONV_GENERATORS_TCH,
                                       tile_b=8, interpret=True))
        np.testing.assert_array_equal(out, data)


class TestAssembledKernel:
    def test_fused_assembly_crc_matches_reference(self):
        """decode_assembled_pallas (assembly prologue + segmented
        Viterbi + CRC epilogue in ONE kernel) is bit-identical to the
        scan decode on pmat-assembled soft plus ops.crc.crc16_check
        per segment, over a mixed SYNC/SCH_F/NDB batch with
        corruption."""
        import jax.numpy as jnp
        from tetra_tpu.lmac import fused
        from tetra_tpu.ops import crc
        from tetra_tpu.ops.viterbi_pallas import decode_assembled_pallas
        from tetra_tpu import tx, testpdu
        from tetra_tpu.ops.scramble import scramb_get_init

        INIT = scramb_get_init(262, 42, 1)
        sync_b = np.asarray(tx.make_sync_burst(
            testpdu.make_sync_pdu(), testpdu.make_sysinfo_pdu(),
            testpdu.make_access_assign_bits(), jnp.uint32(INIT)), np.uint8)
        schf_b = np.asarray(tx.make_schf_burst(
            testpdu.make_resource_pdu(ssi=0x42),
            testpdu.make_access_assign_bits(), jnp.uint32(INIT)), np.uint8)
        ndb_b = np.asarray(tx.make_ndb_burst(
            testpdu.make_resource_pdu(ssi=1, total_len=124),
            testpdu.make_resource_pdu(ssi=2, total_len=124),
            testpdu.make_access_assign_bits(), jnp.uint32(INIT)), np.uint8)
        slots = np.stack([sync_b, schf_b, ndb_b, schf_b] * 4)
        slots[5, 100:140] ^= 1          # corruption -> CRC failures
        slots[10, 300:320] ^= 1
        kinds = np.asarray([0, 1, 2, 1] * 4)
        inits = np.full(len(slots), INIT, np.uint32)

        soft, rm, _ = fused.assemble_soft(
            jnp.asarray(slots, jnp.int8), jnp.asarray(inits),
            jnp.asarray(kinds))
        bits_ref = np.asarray(fused.decode_segmented(soft, rm))
        ok_ref = np.stack(
            [np.asarray(crc.crc16_check(jnp.asarray(
                bits_ref[:, off:off + ln])))
             for off, ln in fused.CRC_SEGS], axis=1)
        assert ok_ref.any() and not ok_ref.all()

        x, P_np, _, rm2, _ = fused.assemble_parts(
            jnp.asarray(slots, jnp.int8), jnp.asarray(inits),
            jnp.asarray(kinds))
        bits, ok = decode_assembled_pallas(
            jnp.transpose(x).astype(jnp.int8), rm2,
            np.ascontiguousarray(P_np.T.astype(np.int8)),
            fused.N_SYM, fused.BOUNDARIES, fused.CRC_SEGS,
            tile_b=16, interpret=True)
        assert np.array_equal(np.asarray(bits), bits_ref)
        assert np.array_equal(np.asarray(ok) != 0, ok_ref)

    def test_single_segment_schf(self):
        """No-boundary single-kind form (the pipeline._decode_fec TPU
        path): SCH/F pmat + one CRC segment."""
        import jax.numpy as jnp
        from tetra_tpu.lmac import pipeline
        from tetra_tpu.ops import crc as crc_mod
        from tetra_tpu.ops.viterbi_pallas import decode_assembled_pallas

        rng = np.random.default_rng(3)
        sgn = rng.choice(np.asarray([-1, 0, 1], np.int8), size=(12, 432))
        pmatf = pipeline._fec_matrix("SCH_F")
        soft = sgn.astype(np.float32) @ pmatf
        bits_ref = np.asarray(viterbi.decode(jnp.asarray(soft), 288))
        ok_ref = np.asarray(crc_mod.crc16_check(
            jnp.asarray(bits_ref[:, :284])))
        bits, ok = decode_assembled_pallas(
            jnp.asarray(sgn.T), jnp.zeros((12, 0), jnp.float32),
            np.ascontiguousarray((pmatf.T != 0).astype(np.int8)),
            288, (), ((0, 284),), tile_b=4, interpret=True)
        assert np.array_equal(np.asarray(bits), bits_ref)
        assert np.array_equal(np.asarray(ok)[:, 0] != 0, ok_ref)

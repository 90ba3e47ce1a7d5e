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

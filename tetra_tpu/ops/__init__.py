from tetra_tpu.ops import scramble, interleave, rcpc, crc, rm3014, viterbi  # noqa: F401

"""Transmit/encode chain (type-1 -> type-5 bits -> bursts).

Reference behaviour: the canonical encode path in src/conv_enc_test.c
(build_sb / build_ndb_schf): append complemented CRC16 + 4 tail bits,
rate-1/4 mother encode, puncture to 2/3, block-interleave, scramble,
then assemble continuous downlink bursts (src/phy/tetra_burst.c:169-267).

Used for loopback testing, fixture generation, and as the downlink
transmitter. Batched and jit-friendly (static shapes per block kind).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tetra_tpu import constants as C
from tetra_tpu.ops import scramble, interleave, rcpc, crc, rm3014
from tetra_tpu.phy import burst as burst_mod
from tetra_tpu.utils import bits as bitutils

__all__ = ["append_crc_tail", "encode_block", "encode_bbk",
           "make_sync_burst", "make_schf_burst"]


def append_crc_tail(type1):
    """type-1 bits [..., L1] -> type-2 bits [..., L1+20].

    Appends the ones-complement CRC16 (MSB-first; the reference's
    swap16 + little-endian pbit2ubit round-trip is an identity, see
    conv_enc_test.c:224-231) and 4 zero tail bits.
    """
    cbits = crc.crc16_bits(type1)  # [..., 16]
    cbits = jnp.bitwise_xor(cbits, jnp.int8(1))  # complement
    tail = jnp.zeros(type1.shape[:-1] + (4,), dtype=jnp.int8)
    return jnp.concatenate([type1.astype(jnp.int8), cbits, tail], axis=-1)


def encode_block(kind: str, type1, scramb_init):
    """Full encode: type-1 bits [..., L1] -> type-5 bits [..., L345]."""
    n345, n2, n1, ia, _ = C.BLOCK_PARAMS[kind]
    assert type1.shape[-1] == n1, (kind, type1.shape)
    type2 = append_crc_tail(type1)
    assert type2.shape[-1] == n2
    mother = rcpc.conv_encode(type2)
    type3 = rcpc.puncture("2_3", mother, n345)
    type4 = interleave.block_interleave(n345, ia, type3)
    if kind == "SB1":
        scramb_init = jnp.uint32(C.SCRAMB_INIT)
    return scramble.scramb_bits(scramb_init, type4)


def encode_bbk(bits14, scramb_init):
    """AACH: 14 info bits -> scrambled RM(30,14) codeword [..., 30]."""
    cw = rm3014.encode(bits14)
    return scramble.scramb_bits(scramb_init, cw)


def make_sync_burst(sync_type1, sysinfo_type1, aach_bits14, scramb_init) -> np.ndarray:
    """Assemble a 510-bit continuous sync downlink burst from type-1 PDUs.

    Mirrors conv_enc_test.c build_sb(): SB1 = 60-bit SYNC PDU, SB2 =
    124-bit SYSINFO PDU, BBK = 14-bit ACCESS-ASSIGN.
    """
    sb_t5 = np.asarray(encode_block("SB1", jnp.asarray(sync_type1), scramb_init))
    si_t5 = np.asarray(encode_block("SB2", jnp.asarray(sysinfo_type1), scramb_init))
    bb_t5 = np.asarray(encode_bbk(jnp.asarray(aach_bits14), scramb_init))
    return burst_mod.build_sync_c_d_burst(sb_t5, bb_t5, si_t5)


def make_schf_burst(schf_type1, aach_bits14, scramb_init) -> np.ndarray:
    """Assemble a 510-bit normal downlink burst carrying one SCH/F block.

    Mirrors conv_enc_test.c build_ndb_schf(): 268-bit SCH/F PDU +
    ACCESS-ASSIGN broadcast block; uses training sequence 1 (n).
    """
    t5 = np.asarray(encode_block("SCH_F", jnp.asarray(schf_type1), scramb_init))
    bb_t5 = np.asarray(encode_bbk(jnp.asarray(aach_bits14), scramb_init))
    return burst_mod.build_norm_c_d_burst(t5[:216], bb_t5, t5[216:], False)


def make_ndb_burst(blk1_type1, blk2_type1, aach_bits14, scramb_init) -> np.ndarray:
    """Assemble a normal downlink burst with two half-slot NDB blocks
    (training sequence 2 / p)."""
    b1 = np.asarray(encode_block("NDB", jnp.asarray(blk1_type1), scramb_init))
    b2 = np.asarray(encode_block("NDB", jnp.asarray(blk2_type1), scramb_init))
    bb_t5 = np.asarray(encode_bbk(jnp.asarray(aach_bits14), scramb_init))
    return burst_mod.build_norm_c_d_burst(b1, bb_t5, b2, True)

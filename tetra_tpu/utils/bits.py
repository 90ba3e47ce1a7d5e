"""Bit-vector helpers.

The framework's on-device bit representation is "ubits": one bit per
int8 element (0/1), batch dims leading — the tensorised analogue of the
reference's one-bit-per-byte buffers (reference src/tetra_common.c:31-39).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def bits_to_uint(bits) -> int:
    """MSB-first bits -> unsigned int (reference src/tetra_common.c:31-39)."""
    out = 0
    for b in np.asarray(bits).reshape(-1):
        out = (out << 1) | int(b & 1)
    return out


def uint_to_bits(value: int, width: int) -> np.ndarray:
    """Unsigned int -> MSB-first ubit array of length `width`."""
    return np.array([(value >> (width - 1 - i)) & 1 for i in range(width)], dtype=np.uint8)


def uint_to_bits_jnp(value, width: int):
    """Traced unsigned int -> MSB-first ubit array (jit-compatible)."""
    shifts = jnp.arange(width - 1, -1, -1, dtype=jnp.uint32)
    return ((jnp.uint32(value) >> shifts) & 1).astype(jnp.int8)


def pack_bits(bits) -> bytes:
    """ubits -> packed bytes, MSB first (osmo_ubit2pbit semantics)."""
    arr = np.asarray(bits, dtype=np.uint8).reshape(-1)
    pad = (-len(arr)) % 8
    if pad:
        arr = np.concatenate([arr, np.zeros(pad, dtype=np.uint8)])
    return np.packbits(arr).tobytes()


def unpack_bits(data: bytes, nbits: int | None = None) -> np.ndarray:
    """packed bytes -> ubits, MSB first (osmo_pbit2ubit semantics)."""
    arr = np.unpackbits(np.frombuffer(data, dtype=np.uint8))
    return arr[:nbits] if nbits is not None else arr


def gf2_matmul_int(bits, matrix):
    """GF(2) product as an s8 x s8 -> s32 contraction: 2x the MXU issue
    rate of bf16, and no [..., L] float32 HBM materialisation of the
    bit operand. Integer sums <= L < 2^31 are exact; mod-2 is one
    bitwise and."""
    prod = jnp.dot(bits.astype(jnp.int8), matrix.astype(jnp.int8),
                   preferred_element_type=jnp.int32)
    return (prod & 1).astype(jnp.int8)


def gf2_matmul_f32(bits, matrix):
    """GF(2) product as a float32 contraction (exact: L < 2^24)."""
    prod = jnp.dot(bits.astype(jnp.float32), matrix.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.mod(prod, 2.0).astype(jnp.int8)


def gf2_matmul(bits, matrix):
    """GF(2) matrix product of ubits [..., L] with matrix [L, M] -> [..., M].

    Integer path on TPU, float path elsewhere (CPU XLA lowers s8 dots
    to slow generic loops); both are exact and bit-identical
    (tests/test_ops_golden.py pins them against each other).
    """
    import jax
    if jax.default_backend() in ("tpu", "axon"):
        return gf2_matmul_int(bits, matrix)
    return gf2_matmul_f32(bits, matrix)

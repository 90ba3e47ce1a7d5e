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


def gf2_matmul(bits, matrix):
    """GF(2) matrix product of ubits [..., L] with matrix [L, M] -> [..., M].

    Uses a float32 contraction so XLA can map it to the MXU; the sums are
    exact because L < 2^24.
    """
    prod = jnp.dot(bits.astype(jnp.float32), matrix.astype(jnp.float32),
                   preferred_element_type=jnp.float32)
    return jnp.mod(prod, 2.0).astype(jnp.int8)

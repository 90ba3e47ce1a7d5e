"""ACELP speech-frame bit reordering + TCH/S FEC chain, EN 300 395-2.

Reference behaviour: src/lower_mac/tch_reordering.c — class-0/1/2 bit
position tables (Table 4) mapping a 432-bit decoded type-2 speech frame
to two 216-bit (1 + 137 + pad) codec frames. NB: the reference's
class-0 table declares 51 entries but initialises only 50; the phantom
51st entry is position 0, making the C code write out[-1] (undefined
behaviour). We consume the same input layout (51 class-0 dibit pairs)
but drop the phantom pair instead of corrupting memory.

The TCH/S (speech) receive chain itself — matrix deinterleave,
depuncture, rate-1/3 Viterbi per protection class — is present in the
reference but never wired into the rx path (tetra-rx dumps raw traffic
instead, TODO:1-2); here it is provided as a working, batched decode.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from tetra_tpu import constants as C
from tetra_tpu.ops import rcpc, viterbi, crc

__all__ = ["type2_to_codec", "codec_to_type2", "tch_s_decode", "tch_s_encode"]

_NUM_C0 = 51   # reference NUM_ACELP_CLASS0_BITS (incl. the phantom entry)
_NUM_C1 = 56
_NUM_C2 = 30
_FRAME_BITS = _NUM_C0 + _NUM_C1 + _NUM_C2  # 137


@functools.lru_cache(maxsize=1)
def _maps():
    """(gather type2->codec [2*137 or -1], inverse) index tables."""
    positions = np.concatenate([
        C.ACELP_CLASS0, np.array([-1], dtype=np.int32),  # phantom 51st pair dropped
        C.ACELP_CLASS1, C.ACELP_CLASS2,
    ])
    # input pair index k (0..136) with table position p -> for frame f:
    # codec[f*137 + p - 1] = in[2*k + f]
    fwd = np.full(2 * _FRAME_BITS, -1, dtype=np.int32)  # codec idx -> in idx
    for k, p in enumerate(positions):
        if p < 1:
            continue
        for f in (0, 1):
            fwd[f * _FRAME_BITS + (p - 1)] = 2 * k + f
    return fwd


def type2_to_codec(bits):
    """[..., 274] decoded speech bits -> [..., 274] codec-ordered bits
    (two 137-bit ACELP frames). Unmapped positions (the phantom class-0
    slot) are zero."""
    fwd = _maps()
    src = jnp.asarray(np.where(fwd < 0, 0, fwd))
    mask = jnp.asarray((fwd >= 0).astype(np.int8))
    return jnp.take(bits, src, axis=-1) * mask


def codec_to_type2(bits):
    """Inverse reordering: [..., 274] codec bits -> [..., 274] line bits."""
    fwd = _maps()
    inv = np.full(2 * _FRAME_BITS, -1, dtype=np.int32)
    for codec_idx, in_idx in enumerate(fwd):
        if in_idx >= 0:
            inv[in_idx] = codec_idx
    src = jnp.asarray(np.where(inv < 0, 0, inv))
    mask = jnp.asarray((inv >= 0).astype(np.int8))
    return jnp.take(bits, src, axis=-1) * mask


# --- TCH/S full-rate FEC parameters (EN 300 395-2 §5.5) ---
# class 1: 112 type-2 bits -> punctured 168; class 2: 72 -> 162 (with CRC8);
# class 0: 51*2 = unprotected... the full-rate frame: 137*2 speech bits ->
# type-2 blocks per class; type-3 = 432 bits total.
_C1_T2, _C1_T3 = 112, 168
_C2_T2, _C2_T3 = 72, 162


def tch_s_encode(class0, class1, class2):
    """Encode speech classes to a 432-bit type-3 frame (batched).

    Class sizes are chosen so the three classes sum to exactly one
    274-bit speech frame pair (2 x 137, EN 300 395-2) with the
    reference's type-2/type-3 block sizes (tetra_conv_enc.c:253-263):

    class0: [..., 102] unprotected bits (51 dibit pairs x 2 frames)
    class1: [..., 108] -> +4 tail = 112 type-2 -> rate 112/168
    class2: [..., 64]  -> +4 pad +4 tail = 72 type-2 -> rate 72/162
    Layout: [class0 | punct(class1) | punct(class2)] = 102+168+162 = 432.
    """
    tail1 = jnp.zeros(class1.shape[:-1] + (4,), jnp.int8)
    tail2 = jnp.zeros(class2.shape[:-1] + (8,), jnp.int8)
    t2_1 = jnp.concatenate([class1.astype(jnp.int8), tail1], axis=-1)
    t2_2 = jnp.concatenate([class2.astype(jnp.int8), tail2], axis=-1)
    m1 = rcpc.conv_encode(t2_1, C.CONV_GENERATORS_TCH)
    m2 = rcpc.conv_encode(t2_2, C.CONV_GENERATORS_TCH)
    p1 = rcpc.puncture("112_168", m1, _C1_T3)
    p2 = rcpc.puncture("72_162", m2, _C2_T3)
    return jnp.concatenate([class0.astype(jnp.int8), p1, p2], axis=-1)


def tch_s_decode(type3):
    """Decode a 432-bit TCH/S type-3 frame into speech classes (batched).

    Returns (class0 [..., 102], class1 [..., 108], class2 [..., 64],
    ok1, ok2) where ok* check the zero tails (decode sanity; the speech
    CRC proper is part of the codec frame, checked downstream).
    """
    c0 = type3[..., :102]
    p1 = type3[..., 102:102 + _C1_T3]
    p2 = type3[..., 102 + _C1_T3:102 + _C1_T3 + _C2_T3]
    s1 = rcpc.depuncture_soft("112_168",
                              (1.0 - 2.0 * p1.astype(jnp.float32)) * 127.0,
                              _C1_T2 * 3)
    s2 = rcpc.depuncture_soft("72_162",
                              (1.0 - 2.0 * p2.astype(jnp.float32)) * 127.0,
                              _C2_T2 * 3)
    d1 = viterbi.decode(s1, _C1_T2, C.CONV_GENERATORS_TCH)
    d2 = viterbi.decode(s2, _C2_T2, C.CONV_GENERATORS_TCH)
    ok1 = jnp.all(d1[..., -4:] == 0, axis=-1)
    ok2 = jnp.all(d2[..., -8:] == 0, axis=-1)
    return c0, d1[..., :108], d2[..., :64], ok1, ok2

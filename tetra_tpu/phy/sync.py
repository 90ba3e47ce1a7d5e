"""Burst synchronisation over a bit stream.

Reference behaviour: src/phy/tetra_burst_sync.c — a 3-state machine
(UNLOCKED -> KNOW_FSTART -> LOCKED) over a 4096-bit ring buffer: scan
for the SYNC training sequence; once the frame phase is known, step one
510-bit timeslot at a time, verifying the training sequence at offset
214 (sync) / 244 (normal); fall back to UNLOCKED on mismatch.

TPU design: the per-bit correlation scan — the reference's hot loop 2 —
runs ONCE for the whole chunk as a batched matched-filter pass on
device (phy.burst.train_seq_match); the state machine walk over slot
boundaries is then a cheap host loop over the precomputed match map
(or the fully-vectorised lax.scan version in phy.sync_vec for the
multi-carrier path).
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax.numpy as jnp

from tetra_tpu import constants as C
from tetra_tpu.phy import burst as burst_mod

__all__ = ["AlignedSlot", "SyncEvent", "align_stream", "compute_match_map"]

# match-map column order is the scan priority (y,n,p,q,x)
_PRIO = (C.TETRA_TRAIN_SYNC, C.TETRA_TRAIN_NORM_1, C.TETRA_TRAIN_NORM_2,
         C.TETRA_TRAIN_NORM_3, C.TETRA_TRAIN_EXT)
_COL = {tid: i for i, tid in enumerate(_PRIO)}


@dataclass
class AlignedSlot:
    """One aligned 510-bit timeslot emitted by the synchroniser."""
    offset: int          # absolute bit offset of the slot start
    train_id: int        # TETRA_TRAIN_*
    slot_index: int      # sequential index of LOCKED slots (for time tracking)


@dataclass
class SyncEvent:
    kind: str            # 'found_sync' | 'lost' | 'bad_offset'
    offset: int
    detail: int = 0


@dataclass
class SyncCarry:
    """Resumable synchroniser state for chunked streaming — the analogue
    of the reference's persistent tetra_rx_state (tetra_burst_sync.h:13-21),
    with offsets absolute in the stream."""
    state: str = "UNLOCKED"
    pos: int = 0                  # absolute scan position
    next_frame_start: int = 0     # absolute next slot boundary
    slot_index: int = 0           # LOCKED slot steps so far


def compute_match_map(bits, mask: int = 0x1F) -> np.ndarray:
    """[L, 5] train-sequence exact-match map via one device pass."""
    m = burst_mod.train_seq_match(jnp.asarray(bits, dtype=jnp.int8), mask)
    return np.asarray(m)


def _first_match(match: np.ndarray, start: int, end: int, cols) -> tuple[int, int]:
    """(absolute offset, train_id) of the first match in [start, end), or (-1, -1)."""
    window = match[start:end, cols]
    anyrow = window.any(axis=1)
    if not anyrow.any():
        return -1, -1
    row = int(np.argmax(anyrow))
    col = int(np.argmax(window[row]))
    return start + row, _PRIO[cols[col]]


def align_stream(bits, match: np.ndarray | None = None,
                 events: list | None = None,
                 carry: "SyncCarry | None" = None,
                 base_offset: int = 0) -> list[AlignedSlot]:
    """Walk the stream and emit aligned slots, replicating the reference
    state machine's decisions (tetra_burst_sync.c:54-154).

    bits: host uint8 ubits array starting at absolute stream position
    `base_offset`. When `carry` is given it is resumed and updated in
    place, enabling chunked streaming; emitted offsets are relative to
    `bits` (add base_offset for absolute positions).
    """
    bits = np.asarray(bits, dtype=np.uint8)
    L = len(bits)
    if match is None:
        match = compute_match_map(bits)
    out: list[AlignedSlot] = []
    ev = events if events is not None else []

    sync_cols = [_COL[C.TETRA_TRAIN_SYNC]]
    locked_cols = [_COL[C.TETRA_TRAIN_SYNC], _COL[C.TETRA_TRAIN_NORM_1],
                   _COL[C.TETRA_TRAIN_NORM_2]]

    cy = carry if carry is not None else SyncCarry()
    pos = cy.pos - base_offset            # scan position (chunk-relative)
    slot_index = cy.slot_index
    state = cy.state
    next_frame_start = cy.next_frame_start - base_offset
    if pos < 0 or (state != "UNLOCKED" and next_frame_start < 0):
        raise ValueError("carry refers to bits before this chunk")

    while True:
        if state == "UNLOCKED":
            if L - pos < 2 * C.BITS_PER_TS:
                break
            off, _tid = _first_match(match, pos, L, sync_cols)
            if off < 0:
                break
            ev.append(SyncEvent("found_sync", off))
            # next slot boundary after the sync burst (burst_sync.c:84)
            next_frame_start = off + 296
            state = "LOCKED"
            pos = next_frame_start
            continue

        # LOCKED: need a full slot
        if L - next_frame_start < C.BITS_PER_TS:
            break
        slot = next_frame_start
        slot_index += 1
        # search inside the slot (the reference searches its ring buffer,
        # which at this point holds the slot plus at most a partial read)
        off, tid = _first_match(match, slot, min(L, slot + C.BITS_PER_TS),
                                locked_cols)
        if off < 0:
            ev.append(SyncEvent("lost", slot))
            state = "UNLOCKED"
            pos = slot + C.BITS_PER_TS
            next_frame_start += C.BITS_PER_TS
            continue
        rel = off - slot
        if tid == C.TETRA_TRAIN_SYNC:
            if rel == C.SYNC_TRAIN_OFFSET:
                out.append(AlignedSlot(slot, tid, slot_index))
            else:
                ev.append(SyncEvent("bad_offset", slot, rel))
                state = "UNLOCKED"
                pos = slot + C.BITS_PER_TS
        else:
            if rel == C.NORM_TRAIN_OFFSET:
                out.append(AlignedSlot(slot, tid, slot_index))
            else:
                ev.append(SyncEvent("bad_offset", slot, rel))
                # reference stays LOCKED for normal-burst mismatch
        next_frame_start += C.BITS_PER_TS

    cy.state = state
    cy.pos = pos + base_offset
    cy.next_frame_start = next_frame_start + base_offset
    cy.slot_index = slot_index
    return out

"""Single-fetch fused multi-carrier chunk pipeline (native control plane).

Reference behaviour: the whole per-chunk receiver loop of
src/tetra-rx.c:82-95 — burst sync, TDMA clock, lower-MAC FEC, upper-MAC
walk — over N carriers at once.

TPU design: the device is reached through a tunnel whose round-trip
costs ~21 ms fixed + ~46 MB/s d2h / ~68 MB/s h2d (measured on this
rig), so the multi-carrier end-to-end rate is set by TRANSFER COUNT AND
BYTES, not compute.  This module collapses one ingest chunk into:

  h2d:    ONE packed-bit buffer [B, Lc/8] (8x smaller than ubits)
  device: ONE fused program — sync scan (phy.sync_vec) -> per-carrier
          slot compaction (argsort) -> SB1 pre-decode -> scrambling-code
          forward-fill (associative scan, the device twin of the host
          fill in rx.decode_slots_multi) -> kind-compacted FEC
          (lmac.fused) -> 8:1 bit packing -> ONE int8 result bundle.
          The sync carry, scrambling codes and the ring tail stay
          device-resident between chunks, so chunk k+1 can be DISPATCHED
          before chunk k's bundle is fetched (one-deep pipelining).
  d2h:    ONE fetch of [B, maxs*53 + 32] bytes; traffic payloads stay
          on device and are gathered lazily per traffic slot.
  host:   numpy-vectorised record assembly (no per-slot Python), then
          ONE C++ walk (native/umac_exec.cpp::tetra_umac_walk2) that
          also owns the TDMA clock and SYNC side effects
          (tetra_burst_sync.c:113, tetra_lower_mac.c:283-310).

Decisions are bit-identical to the MultiSync + decode_slots_multi +
Python-bookkeeping path (tests/test_fastpath.py differential).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from tetra_tpu import constants as C
from tetra_tpu.phy.sync_vec import sync_scan
from tetra_tpu.phy.sync import FEED_BITS, RING_BITS
from tetra_tpu.phy.burst import split_norm_burst
from tetra_tpu.lmac import pipeline
from tetra_tpu.lmac.fused import decode_slots_fused
from tetra_tpu.ops import scramble
from tetra_tpu.rx import _pack_selected, _PACK_BITS

__all__ = ["FastChunkPipeline", "fused_chunk", "max_slots",
           "ROW_BYTES", "RING_PAD"]

ROW_BYTES = 53            # 51 packed payload bytes + flags + delta
_PAY_BYTES = 51           # ceil(406 / 8); unpacks to 408 columns
SIDE_I32 = 8              # n_slots tail st bs nb nfs si scramb
RING_PAD = RING_BITS + 512   # device-resident tail: ring depth + slack


def max_slots(steps: int, feed: int) -> int:
    """Static bound on slots one carrier can emit in `steps` quanta:
    each step processes at most one slot, and a slot consumes 510 bits
    of a buffer that holds at most RING_BITS and gains feed/step."""
    return int(min(steps, (RING_BITS + steps * feed) // C.BITS_PER_TS + 1))


@functools.partial(jax.jit,
                   static_argnames=("steps", "feed", "maxs", "lc_pad"))
def fused_chunk(ring, packed, end_rel, rebase, st0, bs0, nb0, nfs0, fed_rel,
                scr0, steps: int, feed: int, maxs: int, lc_pad: int):
    """One ingest chunk, fully fused on device.

    ring [B, RING_PAD] int8: last RING_PAD stream bits (device carry).
    packed [B, lc_pad//8] uint8: this chunk's new bits, 8/byte MSB-first.
    end_rel: window-relative position of the true stream end.
    rebase: window base delta since the carry was written; subtracted
    from the carried rel positions (bs0, nfs0).
    st0..: sync carry (device). fed_rel: scan position rel THIS window.
    scr0 [B] uint32: per-carrier cell scrambling code carry.

    Returns (bundle [B, maxs*ROW_BYTES+32] int8, new_ring, carry...,
    t4_full [B*maxs, 432] int8, t4_b2 [B*maxs, 216] int8).
    """
    B = ring.shape[0]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    chunk = ((packed[..., None] >> shifts) & 1).reshape(B, lc_pad)
    bits = jnp.concatenate([ring, chunk.astype(jnp.int8)], axis=1)
    L = bits.shape[1]

    (st, bs, nb, nfs, si, _), out = sync_scan(
        bits, st0, bs0 - rebase, nb0, nfs0 - rebase, st0 * 0,
        fed_rel, steps, feed)

    # ---- per-carrier slot compaction (emitted slots first, step order)
    emitT = out["emit"].T.astype(bool)                      # [B, steps]
    burstT = out["burst"].T.astype(jnp.int32)
    stepsr = jnp.arange(steps, dtype=jnp.int32)
    order = jnp.argsort(jnp.where(emitT, stepsr[None, :], steps),
                        axis=1, stable=True)[:, :maxs]      # [B, maxs]
    valid = jnp.take_along_axis(emitT, order, axis=1)
    kind = jnp.where(valid,
                     jnp.take_along_axis(out["col"].T, order, axis=1), 0)
    soff = jnp.where(valid,
                     jnp.take_along_axis(out["slot"].T, order, axis=1), 0)
    n_slots = emitT.sum(axis=1, dtype=jnp.int32)

    # TDMA burst deltas: bursts (incl. own) since the previous emitted
    # slot; tail = bursts after the last one (tetra_burst_sync.c:113)
    bc = jnp.cumsum(burstT, axis=1)
    bc_at = jnp.take_along_axis(bc, order, axis=1)
    prev = jnp.concatenate(
        [jnp.zeros((B, 1), jnp.int32), bc_at[:, :-1]], axis=1)
    delta = jnp.where(valid, bc_at - prev, 0)
    tail = bc[:, -1] - delta.sum(axis=1)

    # ---- slot bit gather [B, maxs, 510], word-granular.
    # A bit-granular take_along_axis of maxs*510 elements costs ~100 ms
    # on this part (XLA TPU gathers run ~90 M elem/s); packing the
    # window into uint32 words first cuts the gather 30x, and the
    # arbitrary bit offset becomes an elementwise funnel shift.
    w32 = jnp.left_shift(jnp.uint32(1),
                         jnp.arange(31, -1, -1, dtype=jnp.uint32))
    words = (bits.reshape(B, L // 32, 32).astype(jnp.uint32)
             * w32).sum(-1, dtype=jnp.uint32)               # [B, L/32]
    nw = C.BITS_PER_TS // 32 + 2                            # 17 words
    wstart = soff >> 5
    sh = (soff & 31).astype(jnp.uint32)[:, :, None]
    widx = jnp.clip(wstart[:, :, None]
                    + jnp.arange(nw, dtype=jnp.int32), 0, L // 32 - 1)
    got = jnp.take_along_axis(words, widx.reshape(B, maxs * nw),
                              axis=1).reshape(B, maxs, nw)
    lo = jnp.where(sh == 0, jnp.uint32(0),
                   got[..., 1:] >> (jnp.uint32(32) - sh))
    out_words = (got[..., :nw - 1] << sh) | lo              # [B, maxs, 16+]
    shifts32 = jnp.arange(31, -1, -1, dtype=jnp.uint32)
    flat = ((out_words[..., None] >> shifts32) & 1).reshape(
        B, maxs, (nw - 1) * 32)[..., :C.BITS_PER_TS].astype(
        jnp.int8).reshape(B * maxs, C.BITS_PER_TS)

    # ---- SB1 pre-decode + scrambling-code forward fill (device twin of
    # rx.decode_slots_multi's host fill; tetra_lower_mac.c:283-310)
    sb1_t5 = flat[:, C.SB_BLK1_OFFSET: C.SB_BLK1_OFFSET + C.SB_BLK1_BITS]
    r1 = pipeline.decode_block("SB1", sb1_t5, jnp.uint32(0))
    t1 = r1.type1.reshape(B, maxs, 60)

    def field(a, b):
        w = jnp.left_shift(jnp.uint32(1),
                           jnp.arange(b - a - 1, -1, -1, dtype=jnp.uint32))
        return (t1[..., a:b].astype(jnp.uint32) * w).sum(-1)

    newinit = ((((field(31, 41) & 0x3FF) << 20)
                | ((field(41, 55) & 0x3FFF) << 6)
                | (field(4, 10) & 0x3F)) << 2) | C.SCRAMB_INIT
    have = valid & (kind == 0) & r1.crc_ok.reshape(B, maxs)

    def ff(a, b):
        av, ah = a
        bv, bh = b
        return jnp.where(bh, bv, av), ah | bh

    fv, fh = lax.associative_scan(
        ff, (jnp.where(have, newinit, 0), have), axis=1)
    inits = jnp.where(fh, fv, scr0[:, None].astype(jnp.uint32))
    scr_final = inits[:, -1]

    # ---- kind-compacted FEC decode + packing
    kflat = kind.reshape(B * maxs)
    res = decode_slots_fused(flat, inits.reshape(B * maxs), kflat)
    pk = _pack_selected(res, kflat)                    # [N, 408] int8

    _, b1, b2 = split_norm_burst(flat)
    ii = inits.reshape(B * maxs)
    t4_full = scramble.scramb_bits(ii, jnp.concatenate([b1, b2], axis=-1))
    t4_b2 = scramble.scramb_bits(ii, b2)

    pay = jnp.pad(pk[:, :_PACK_BITS],
                  ((0, 0), (0, _PAY_BYTES * 8 - _PACK_BITS)))
    w8 = jnp.asarray([128, 64, 32, 16, 8, 4, 2, 1], jnp.int32)
    pay_b = (pay.reshape(-1, _PAY_BYTES, 8).astype(jnp.int32) * w8).sum(-1)
    # one flag byte: kind(2) | okA<<2 | okB<<3 | valid<<4 — every
    # fetched byte costs d2h bandwidth on the tunnel
    flags = (kflat.astype(jnp.int32)
             | (pk[:, _PACK_BITS].astype(jnp.int32) << 2)
             | (pk[:, _PACK_BITS + 1].astype(jnp.int32) << 3)
             | (valid.reshape(-1).astype(jnp.int32) << 4))
    row = jnp.concatenate([
        pay_b.astype(jnp.uint8),
        flags.astype(jnp.uint8)[:, None],
        jnp.clip(delta.reshape(-1, 1), 0, 255).astype(jnp.uint8)], axis=1)
    side = jnp.stack([n_slots, tail, st, bs, nb, nfs, si,
                      lax.bitcast_convert_type(scr_final, jnp.int32)],
                     axis=1)
    bundle = jnp.concatenate([
        lax.bitcast_convert_type(row, jnp.int8).reshape(B, maxs * ROW_BYTES),
        lax.bitcast_convert_type(side, jnp.int8).reshape(B, 4 * SIDE_I32)],
        axis=1)

    new_ring = lax.dynamic_slice(
        bits, (0, end_rel - RING_PAD), (B, RING_PAD))
    return bundle, new_ring, (st, bs, nb, nfs, scr_final), t4_full, t4_b2


@dataclass
class ChunkHandle:
    """A dispatched-but-not-fetched chunk."""
    bundle: object        # device [B, maxs*ROW_BYTES + 32] int8
    t4_full: object       # device [B*maxs, 432] int8
    t4_b2: object         # device [B*maxs, 216] int8
    maxs: int


class FastChunkPipeline:
    """Host driver: device-resident ring + sync/scramble carry, packed
    h2d, deferred single-fetch results. Submit chunks with `submit`,
    fetch+decode with `collect` (callers pipeline the two)."""

    def __init__(self, n_carriers: int, feed: int = FEED_BITS):
        self.n = n_carriers
        self.feed = feed
        self.ring = jnp.zeros((n_carriers, RING_PAD), jnp.int8)
        z = lambda v=0: jnp.full(n_carriers, v, jnp.int32)
        # (state, buf_start, bits_in_buf, next_frame_start, scramb);
        # positions are rel carry_base; abs position 0 == rel RING_PAD
        self.carry = (z(), z(RING_PAD), z(), z(RING_PAD),
                      jnp.zeros(n_carriers, jnp.uint32))
        self.carry_base = -RING_PAD  # window base the carry is rel to
        self.end = 0                 # abs position of the stream end
        self.fed = 0                 # abs scan position (host-tracked)

    def submit(self, bits: np.ndarray) -> ChunkHandle | None:
        """Dispatch one chunk of per-carrier hard bits [B, Lc]."""
        bits = np.asarray(bits, dtype=np.uint8) & 1
        B, Lc = bits.shape
        assert B == self.n
        # pad the chunk to a 32-bit word boundary (the fused program's
        # slot extraction packs the window into uint32 words); the pad
        # sits beyond the true stream end and is never consumed
        lc_pad = -(-Lc // 32) * 32
        if lc_pad != Lc:
            bits = np.pad(bits, ((0, 0), (0, lc_pad - Lc)))
        packed = np.packbits(bits, axis=1)

        new_base = self.end - RING_PAD   # abs position of window[0]
        end_abs = self.end + Lc
        steps = int((end_abs - self.fed) // self.feed)
        if steps <= 0:
            # window grows within the ring slack; nothing to scan yet
            self.ring = _absorb(self.ring, jnp.asarray(packed),
                                np.int32(Lc), lc_pad)
            self.end = end_abs
            return None
        maxs = max_slots(steps, self.feed)
        st, bs, nb, nfs, scr = self.carry
        rebase = np.int32(new_base - self.carry_base)
        end_rel = np.int32(end_abs - new_base)
        bundle, ring, carry, t4f, t4b = fused_chunk(
            self.ring, jnp.asarray(packed), end_rel, rebase,
            st, bs, nb, nfs, np.int32(self.fed - new_base), scr,
            steps, self.feed, maxs, lc_pad)
        self.ring = ring
        self.carry = carry
        self.carry_base = new_base
        self.end = end_abs
        self.fed += steps * self.feed
        return ChunkHandle(bundle, t4f, t4b, maxs)

    def collect(self, h: ChunkHandle) -> dict:
        """Fetch one chunk's bundle and decode it to numpy arrays:
        {carrier, kind, okA, okB, delta, payload [n, 408], slot_ref,
         n_slots [B], tail [B], scramb [B]}."""
        maxs = h.maxs
        arr = np.asarray(h.bundle)
        B = arr.shape[0]
        rows = np.ascontiguousarray(
            arr[:, :maxs * ROW_BYTES]).view(np.uint8).reshape(
            B, maxs, ROW_BYTES)
        side = np.ascontiguousarray(
            arr[:, maxs * ROW_BYTES:]).view(np.int32)
        n_slots = side[:, 0]
        if (n_slots > maxs).any():
            raise RuntimeError("slot compaction overflow (bound bug)")
        flags = rows[:, :, _PAY_BYTES]
        vm = (flags & 16).astype(bool)
        cars, js = np.nonzero(vm)
        sel = rows[cars, js]
        payload = np.unpackbits(
            np.ascontiguousarray(sel[:, :_PAY_BYTES]), axis=1)
        f = sel[:, _PAY_BYTES].astype(np.int32)
        return {
            "carrier": cars.astype(np.int32),
            "okA": (f >> 2) & 1,
            "okB": (f >> 3) & 1,
            "kind": f & 3,
            "delta": sel[:, _PAY_BYTES + 1].astype(np.int32),
            "payload": payload,
            "slot_ref": (cars * maxs + js).astype(np.int32),
            "n_slots": n_slots, "tail": side[:, 1],
            "scramb": side[:, 7].view(np.uint32),
        }


@functools.partial(jax.jit, static_argnames=("lc_pad",))
def _absorb(ring, packed, lc, lc_pad: int):
    """Short-chunk path: append < one feed quantum into the ring."""
    B = ring.shape[0]
    shifts = jnp.arange(7, -1, -1, dtype=jnp.uint8)
    chunk = ((packed[..., None] >> shifts) & 1).reshape(B, lc_pad)
    win = jnp.concatenate([ring, chunk.astype(jnp.int8)], axis=1)
    return lax.dynamic_slice(win, (0, lc), (B, RING_PAD))

"""Property tests: the device-side vectorised synchroniser (phy.sync_vec)
makes bit-identical decisions to the host emulation (phy.sync), which is
itself differentially pinned to the compiled reference
(tests/test_ref_parity.py)."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import constants as C, tx, testpdu
from tetra_tpu.phy import sync as sync_mod
from tetra_tpu.phy.sync_vec import MultiSync
from tests.test_rx_e2e import build_capture, MCC, MNC, CC, INIT


def make_stream(seed: int, n_frames: int = 4) -> np.ndarray:
    """One corrupted carrier stream with relocks."""
    rng = np.random.default_rng(seed)
    bits, _ = build_capture(n_frames=n_frames, seed=seed,
                            noise_prefix=int(rng.integers(0, 600)))
    bits = bits.copy()
    idx = rng.choice(len(bits), size=int(rng.integers(20, 250)), replace=False)
    bits[idx] ^= 1
    span = int(rng.integers(0, 900))
    start = int(rng.integers(0, len(bits) - span))
    bits[start:start + span] = rng.integers(0, 2, size=span)
    return bits


def host_reference(bits, chunks=None):
    """Per-carrier host emulation (flush=False to mirror the vec path's
    whole-quanta consumption)."""
    ev: list = []
    carry = sync_mod.SyncCarry()
    slots = []
    if chunks is None:
        chunks = [len(bits)]
    base = 0
    buf = np.zeros(0, np.uint8)
    buf_base = 0
    for n in chunks:
        buf = np.concatenate([buf, bits[base:base + n]])
        base += n
        evs: list = []
        out = sync_mod.align_stream(buf, events=evs, carry=carry,
                                    base_offset=buf_base, flush=False)
        slots.extend((s.offset + buf_base, s.train_id, s.slot_index)
                     for s in out)
        ev.extend((e.kind, e.offset + buf_base, e.detail) for e in evs)
        keep = max(buf_base, carry.buf_start)
        buf = buf[keep - buf_base:]
        buf_base = keep
    return slots, ev


class TestSyncVecEquivalence:
    def test_64_carriers_randomized(self):
        """64 independent corrupted streams, one device scan."""
        B = 64
        streams = [make_stream(1000 + b, n_frames=3) for b in range(B)]
        L = (min(len(s) for s in streams) // 64) * 64
        batch = np.stack([s[:L] for s in streams])

        ms = MultiSync(B)
        v_slots, v_events = ms.scan(batch)

        for b in range(B):
            h_slots, h_events = host_reference(batch[b])
            got = [(s.offset, s.train_id, s.slot_index) for s in v_slots[b]]
            assert got == h_slots, f"carrier {b} slots diverged"
            gote = [(e.kind, e.offset, e.detail) for e in v_events[b]]
            assert gote == h_events, f"carrier {b} events diverged"

    def test_chunked_streaming_carry(self):
        """The vec carry resumes across chunks identically to feeding
        the whole stream, and matches the host walk per chunk."""
        B = 8
        streams = [make_stream(2000 + b) for b in range(B)]
        L = (min(len(s) for s in streams) // 128) * 128
        batch = np.stack([s[:L] for s in streams])

        # whole
        ms1 = MultiSync(B)
        s1, e1 = ms1.scan(batch)

        # two chunks with retention of the carry window
        ms2 = MultiSync(B)
        half = L // 2
        sa, ea = ms2.scan(batch[:, :half])
        keep = min(ms2.min_buf_start(), half)
        sb, eb = ms2.scan(batch[:, keep:], base_offset=keep)
        for b in range(B):
            whole = [(s.offset, s.train_id, s.slot_index) for s in s1[b]]
            parts = ([(s.offset, s.train_id, s.slot_index) for s in sa[b]]
                     + [(s.offset, s.train_id, s.slot_index) for s in sb[b]])
            assert parts == whole, f"carrier {b} chunked slots diverged"
            we = [(e.kind, e.offset) for e in e1[b]]
            pe = ([(e.kind, e.offset) for e in ea[b]]
                  + [(e.kind, e.offset) for e in eb[b]])
            assert pe == we, f"carrier {b} chunked events diverged"

    def test_clean_multi_carrier(self):
        """Clean streams: every slot aligns, types match the TX plan."""
        B = 16
        bits, _ = build_capture(n_frames=4, seed=7)
        L = (len(bits) // 64) * 64
        batch = np.tile(bits[:L], (B, 1))
        ms = MultiSync(B)
        slots, events = ms.scan(batch)
        h_slots, _ = host_reference(bits[:L])
        for b in range(B):
            got = [(s.offset, s.train_id, s.slot_index) for s in slots[b]]
            assert got == h_slots
        assert len(h_slots) > 10

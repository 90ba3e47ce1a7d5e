"""Streaming equivalence + relock fault tolerance + checkpoint/resume."""
import numpy as np
import jax.numpy as jnp
import pytest

from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.rx import TetraReceiver
from tests.test_rx_e2e import build_capture, MCC, MNC, CC, INIT


def _run(bits, chunk=None):
    lines = []
    rx = TetraReceiver(log=lambda *a: lines.append(" ".join(str(x) for x in a)))
    if chunk is None:
        rx.process_bits(bits)
    else:
        for i in range(0, len(bits), chunk):
            rx.process_bits(bits[i:i + chunk], final=i + chunk >= len(bits))
    return rx, lines


class TestStreaming:
    @pytest.mark.parametrize("chunk", [64, 510, 1000, 4096])
    def test_chunked_equals_whole(self, chunk):
        """Feeding a capture in chunks (like the reference's 64-byte read
        loop, tetra-rx.c:86-95) must decode identically to one shot."""
        bits, _ = build_capture()
        rx_whole, lines_whole = _run(bits)
        rx_chunk, lines_chunk = _run(bits, chunk)
        assert lines_chunk == lines_whole
        assert rx_chunk.stats == rx_whole.stats
        assert rx_chunk.mcc == rx_whole.mcc == MCC
        assert len(rx_chunk.umac.events) == len(rx_whole.umac.events)

    def test_buffer_bounded(self):
        """The retained buffer stays bounded (ring semantics) even when
        fed pure noise."""
        rng = np.random.default_rng(0)
        rx = TetraReceiver(log=lambda *a: None)
        for _ in range(20):
            rx.process_bits(rng.integers(0, 2, size=2048).astype(np.uint8))
        assert len(rx._buf) <= 4096 + 2048


class TestRelock:
    def test_resync_after_corruption(self):
        """A corrupted stretch drops lock; the receiver re-acquires at the
        next sync burst (tetra_burst_sync.c:127-141 self-healing)."""
        bits1, _ = build_capture(n_frames=2, seed=1)
        gap = np.random.default_rng(9).integers(0, 2, size=977).astype(np.uint8)
        bits2, ssis2 = build_capture(n_frames=2, seed=2)
        stream = np.concatenate([bits1, gap, bits2])
        rx, lines = _run(stream)
        # lock was lost and re-found: at least two found-sync events
        founds = [ln for ln in lines if "found SYNC training sequence" in ln]
        assert len(founds) >= 2
        # resources from the second capture decoded after relock
        got = [e[1].addr.ssi for e in rx.umac.events
               if e[0] == "RESOURCE" and e[1].addr.type == 1]
        for ssi in ssis2:
            assert ssi in got


class TestCheckpoint:
    def test_carry_state_is_small_and_restorable(self):
        """Receiver carry state (sync carry, TDMA time, cell code) can be
        checkpointed and restored mid-stream — SURVEY.md §5's
        checkpoint/resume model."""
        bits, _ = build_capture()
        half = len(bits) // 2

        import dataclasses

        rx1 = TetraReceiver(log=lambda *a: None)
        rx1.process_bits(bits[:half], final=False)
        # snapshot tiny state
        snap = {
            "carry": dataclasses.replace(rx1._sync_carry),
            "buf": rx1._buf.copy(), "buf_base": rx1._buf_base,
            "time": (rx1.time.hn, rx1.time.mn, rx1.time.fn, rx1.time.tn, rx1.time.sn),
            "scramb_init": rx1.scramb_init,
            "cell": (rx1.mcc, rx1.mnc, rx1.colour_code),
        }
        rx1.process_bits(bits[half:])

        rx2 = TetraReceiver(log=lambda *a: None)
        rx2._sync_carry = dataclasses.replace(snap["carry"])
        rx2._buf, rx2._buf_base = snap["buf"], snap["buf_base"]
        (rx2.time.hn, rx2.time.mn, rx2.time.fn, rx2.time.tn, rx2.time.sn) = snap["time"]
        rx2.scramb_init = snap["scramb_init"]
        rx2.mcc, rx2.mnc, rx2.colour_code = snap["cell"]
        rx2.process_bits(bits[half:])

        # the resumed receiver decodes the second half identically
        ssis1 = [e[1].addr.ssi for e in rx1.umac.events
                 if e[0] == "RESOURCE" and e[1].addr.type == 1]
        ssis2 = [e[1].addr.ssi for e in rx2.umac.events
                 if e[0] == "RESOURCE" and e[1].addr.type == 1]
        assert ssis2 == ssis1[len(ssis1) - len(ssis2):]
        assert len(ssis2) > 0

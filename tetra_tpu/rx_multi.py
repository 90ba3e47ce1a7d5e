"""Multi-carrier receiver: wideband IQ -> N decoded carrier streams.

The reference achieves multi-carrier operation with one OS process
chain per carrier glued by FIFOs/UDP (reference src/receiver1:8,
src/receiver1udp:71-78). Here the whole signal path runs as batched
device programs over the carrier axis:

  channelizer + DQPSK demod + slicer      [carriers, samples]  (device)
  lock state machines                     phy.sync_vec lax.scan (device)
  two-phase FEC decode                    ONE program per burst kind
                                          across ALL carriers  (device)
  upper MAC / LLC / MLE walk              per-carrier host control plane

so host time per chunk is flat in carrier count up to the byte-scale
control plane (which processes only decoded type-1 bits).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tetra_tpu.phy import channelizer, dqpsk
from tetra_tpu.phy.sync_vec import MultiSync
from tetra_tpu.rx import TetraReceiver, RxStats, decode_slots_multi

__all__ = ["MultiCarrierReceiver"]


class MultiCarrierReceiver:
    def __init__(self, offsets_hz, fs: float, sps: int = 2,
                 keystore_path: str | None = None,
                 dumpdir: str | None = None, log=None,
                 pfb_channels=None, n_chan: int | None = None,
                 control_plane: str = "python"):
        self.offsets = np.asarray(offsets_hz, dtype=np.float32)
        self.fs = float(fs)
        self.sps = sps
        self.pfb_channels = (np.asarray(pfb_channels, np.int32)
                             if pfb_channels is not None else None)
        self.n_chan = n_chan if n_chan is not None else int(round(fs / 25_000.0))
        self.carriers = []
        n_carriers = (len(self.pfb_channels) if self.pfb_channels is not None
                      else len(self.offsets))
        for i in range(n_carriers):
            # `log` may be one callable shared by all carriers or a
            # per-carrier sequence of callables
            if log is None:
                carrier_log = lambda *a, **k: None
            elif isinstance(log, (list, tuple)):
                carrier_log = log[i]
            else:
                carrier_log = log
            self.carriers.append(TetraReceiver(
                keystore_path=keystore_path,
                dumpdir=f"{dumpdir}/carrier{i}" if dumpdir else None,
                log=carrier_log))
        self.sync = MultiSync(n_carriers)
        self._buf = np.zeros((n_carriers, 0), dtype=np.uint8)
        self._buf_base = 0
        # control plane: "python" walks each carrier's UpperMac (full
        # logging, decryption); "native" routes all carriers' decoded
        # blocks through ONE C++ executor call per chunk (structured
        # events instead of log lines; unencrypted fast path)
        assert control_plane in ("python", "native")
        self.control_plane = control_plane
        self.native_cp = None
        self.native_events = []   # accumulated event dicts (native mode)
        if control_plane == "native":
            from tetra_tpu.umac.native_exec import NativeControlPlane
            self.native_cp = NativeControlPlane(n_carriers)

    def process_iq(self, wideband_iq) -> list[RxStats]:
        """One chunk of wideband complex samples through the full chain.

        Uses the mixer-bank channelizer by default; constructing with
        `pfb_channels` routes through the 2x-oversampled polyphase
        filterbank instead (O(T·taps) + one DFT instead of O(C·T)).
        """
        wideband_iq = np.asarray(wideband_iq)
        re = jnp.asarray(np.real(wideband_iq).astype(np.float32))
        im = jnp.asarray(np.imag(wideband_iq).astype(np.float32))
        if self.pfb_channels is not None:
            from tetra_tpu.phy import pfb
            out_r, out_i = pfb.pfb_to_demod_rate_ri(
                re, im, jnp.asarray(self.pfb_channels), self.n_chan, self.fs)
        else:
            out_r, out_i = channelizer.channelize_ri(
                re, im, jnp.asarray(self.offsets), fs=self.fs)
        bits = np.asarray(dqpsk.demodulate_hard_ri(out_r, out_i, sps=self.sps))
        return self.process_bits(bits)

    def process_bits(self, bits) -> list[RxStats]:
        """Per-carrier hard bits [C, T] -> per-carrier decode stats.

        All carriers synchronise in one device scan (phy.sync_vec) and
        FEC-decode in one device program per burst kind; only the
        byte-scale upper-MAC walk runs per carrier on host.
        """
        bits = np.asarray(bits, dtype=np.uint8)
        assert bits.ndim == 2 and bits.shape[0] == len(self.carriers)
        self._buf = np.concatenate([self._buf, bits & 1], axis=1)

        slots_abs, events_abs = self.sync.scan(self._buf,
                                               base_offset=self._buf_base)
        # rebase to buffer-relative offsets for slicing/decoding
        base = self._buf_base
        slots_rel, events_rel = [], []
        for sl, ev in zip(slots_abs, events_abs):
            for s in sl:
                s.offset -= base
            for e in ev:
                e.offset -= base
            slots_rel.append(sl)
            events_rel.append(ev)

        decoded = decode_slots_multi([self._buf[c] for c in
                                      range(len(self.carriers))],
                                     slots_rel,
                                     [rx.scramb_init for rx in self.carriers])
        if self.control_plane == "native":
            self._walk_native(slots_rel, events_rel, decoded)
        else:
            for c, rx in enumerate(self.carriers):
                rx._ev_ptr = 0
                for s, d in zip(slots_rel[c], decoded[c]):
                    rx._flush_events(events_rel[c], s.seq)
                    rx._walk_slot(d)
                rx._flush_events(events_rel[c], 1 << 62)

        keep = max(self._buf_base, self.sync.min_buf_start())
        if keep > self._buf_base:
            self._buf = self._buf[:, keep - self._buf_base:]
            self._buf_base = keep
        return [rx.stats for rx in self.carriers]

    def _walk_native(self, slots_rel, events_rel, decoded):
        """One C++ executor call for the whole chunk: per-carrier TDMA
        time / scrambling-code bookkeeping stays in (cheap) host Python,
        all MAC/LLC/MLE parsing runs in native/umac_exec.cpp."""
        from tetra_tpu.utils.bits import bits_to_uint
        from tetra_tpu.ops.scramble import scramb_get_init
        kind_num = {"SYNC": 0, "SCHF": 1, "NDB": 2}
        parts, recs, t4_store = [], [], []
        off = 0

        def put(arr):
            nonlocal off
            a = np.asarray(arr, np.uint8)
            parts.append(a)
            o = off
            off += len(a)
            return o, len(a)

        empty = (0, 0)
        for c, rx in enumerate(self.carriers):
            t = rx.time
            ev, sl, dec = events_rel[c], slots_rel[c], decoded[c]
            ei = 0
            for s, d in zip(sl, dec):
                while ei < len(ev) and ev[ei].seq <= s.seq:
                    if ev[ei].kind == "burst":
                        t.add_tn(1)
                        rx.stats.bursts += 1
                        rx.stats.slots += 1
                    ei += 1
                kn = kind_num[d["kind"]]
                if kn == 0:
                    sb1 = d["SB1"]
                    okA = bool(np.asarray(sb1.crc_ok))
                    if okA:  # SYNC PDU side effects (tetra_lower_mac.c:283-317)
                        t1 = np.asarray(sb1.type1)
                        rx.colour_code = bits_to_uint(t1[4:10])
                        t.tn = bits_to_uint(t1[10:12]) + 1
                        t.fn = bits_to_uint(t1[12:17])
                        t.mn = bits_to_uint(t1[17:23])
                        rx.mcc = bits_to_uint(t1[31:41])
                        rx.mnc = bits_to_uint(t1[41:55])
                        rx.scramb_init = scramb_get_init(rx.mcc, rx.mnc,
                                                         rx.colour_code)
                    a = put(sb1.type1)
                    bb = put(d["BBK"].type1)
                    b = put(d["SB2"].type1)
                    okB = bool(np.asarray(d["SB2"].crc_ok))
                elif kn == 1:
                    blk = d["SCH_F"]
                    okA, okB = bool(np.asarray(blk.crc_ok)), 0
                    a = put(blk.type1)
                    bb = put(d["BBK"].type1)
                    b = empty
                else:
                    okA = bool(np.asarray(d["NDB1"].crc_ok))
                    okB = bool(np.asarray(d["NDB2"].crc_ok))
                    a = put(d["NDB1"].type1)
                    bb = put(d["BBK"].type1)
                    b = put(d["NDB2"].type1)
                ref = -1
                if "t4" in d:
                    ref = len(t4_store)
                    t4_store.append((rx, d["t4"], t.tn))
                recs.append((c, kn, t.tn, t.fn, t.mn, int(okA), int(okB),
                             a[0], a[1], bb[0], bb[1], b[0], b[1], ref))
            while ei < len(ev):
                if ev[ei].kind == "burst":
                    t.add_tn(1)
                    rx.stats.bursts += 1
                    rx.stats.slots += 1
                ei += 1

        if not recs:
            return
        bits = (np.concatenate(parts) if parts
                else np.zeros(0, np.uint8))
        evd = self.native_cp.walk(bits, np.asarray(recs, np.int32))
        self.native_events.append(evd)
        # stats + traffic dumps from the event stream
        from tetra_tpu.umac.native_exec import EV
        kinds = evd["kind"]
        cars = evd["carrier"]
        for i in np.flatnonzero(kinds == EV.CRC):
            rx = self.carriers[cars[i]]
            if evd["b"][i]:
                rx.stats.crc_ok += 1
            else:
                rx.stats.crc_wrong += 1
        for i in np.flatnonzero(kinds == EV.TRAFFIC):
            # d["t4"] is already the right payload per kind (full slot
            # for SCH/F, blk2 for NDB half-slot stealing)
            rx, t4, tn = t4_store[int(evd["a"][i])]
            rx._dump_traffic(np.asarray(t4), usage=int(evd["c"][i]),
                             tsn=tn - 1, ssi=0)

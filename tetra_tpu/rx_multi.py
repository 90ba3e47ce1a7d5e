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
                                     [rx.scramb_init for rx in self.carriers],
                                     packed=self.control_plane == "native")
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
        all MAC/LLC/MLE parsing runs in native/umac_exec.cpp.

        Consumes decode_slots_multi's PACKED contract: one fetched
        [n, 408] row per slot in entry order (kind-selected A/B/BBK
        type-1 bits + CRC flags), so the executor's bit buffer is a
        flat view with arithmetic offsets — no per-slot array fetches
        or copies; t4 stays on device and is fetched in ONE batched
        gather only for the slots the AACH marks as traffic."""
        from tetra_tpu.utils.bits import bits_to_uint
        from tetra_tpu.ops.scramble import scramb_get_init
        from tetra_tpu.rx import PACK_LEN_A, PACK_LEN_B, _PACK_A, _PACK_B, \
            _PACK_BITS
        pk = decoded["packed"]
        kinds_arr = decoded["kinds"]
        t4_pos = decoded["t4_pos"]
        recs, t4_meta = [], []
        m = 0
        off_bbk = _PACK_A + _PACK_B
        for c, rx in enumerate(self.carriers):
            t = rx.time
            ev, sl = events_rel[c], slots_rel[c]
            ei = 0
            for s in sl:
                while ei < len(ev) and ev[ei].seq <= s.seq:
                    if ev[ei].kind == "burst":
                        t.add_tn(1)
                        rx.stats.bursts += 1
                        rx.stats.slots += 1
                    ei += 1
                row = pk[m]
                kn = int(kinds_arr[m])
                okA, okB = int(row[_PACK_BITS]), int(row[_PACK_BITS + 1])
                if kn == 0 and okA:
                    # SYNC PDU side effects (tetra_lower_mac.c:283-317)
                    t1 = row
                    rx.colour_code = bits_to_uint(t1[4:10])
                    t.tn = bits_to_uint(t1[10:12]) + 1
                    t.fn = bits_to_uint(t1[12:17])
                    t.mn = bits_to_uint(t1[17:23])
                    rx.mcc = bits_to_uint(t1[31:41])
                    rx.mnc = bits_to_uint(t1[41:55])
                    rx.scramb_init = scramb_get_init(rx.mcc, rx.mnc,
                                                     rx.colour_code)
                base = m * _PACK_BITS
                ref = -1
                if kn != 0:
                    ref = len(t4_meta)
                    t4_meta.append((rx, kn, t4_pos[m], t.tn))
                recs.append((c, kn, t.tn, t.fn, t.mn, okA, okB,
                             base, PACK_LEN_A[kn],
                             base + off_bbk, 14,
                             base + _PACK_A, PACK_LEN_B[kn], ref))
                m += 1
            while ei < len(ev):
                if ev[ei].kind == "burst":
                    t.add_tn(1)
                    rx.stats.bursts += 1
                    rx.stats.slots += 1
                ei += 1

        if not recs:
            return
        bits = np.ascontiguousarray(pk[:, :_PACK_BITS],
                                    dtype=np.uint8).reshape(-1)
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
        tr = np.flatnonzero(kinds == EV.TRAFFIC)
        if len(tr):
            # ONE batched device gather for exactly the traffic slots'
            # t4 payloads (full slot for SCH/F, blk2 for NDB stealing)
            metas = [t4_meta[int(evd["a"][i])] for i in tr]
            rows_f = [i4 for _, kn, i4, _ in metas if kn == 1]
            rows_2 = [i4 for _, kn, i4, _ in metas if kn == 2]
            got_f = (np.asarray(jnp.take(decoded["t4_full"],
                                         jnp.asarray(rows_f), axis=0))
                     if rows_f else None)
            got_2 = (np.asarray(jnp.take(decoded["t4_b2"],
                                         jnp.asarray(rows_2), axis=0))
                     if rows_2 else None)
            nf = n2 = 0
            for i, (rx, kn, i4, tn) in zip(tr, metas):
                if kn == 1:
                    t4 = got_f[nf]
                    nf += 1
                else:
                    t4 = got_2[n2]
                    n2 += 1
                rx._dump_traffic(t4, usage=int(evd["c"][i]),
                                 tsn=tn - 1, ssi=0)

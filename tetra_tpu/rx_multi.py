"""Multi-carrier receiver: wideband IQ -> N decoded carrier streams.

The reference achieves multi-carrier operation with one OS process
chain per carrier glued by FIFOs/UDP (reference src/receiver1:8,
src/receiver1udp:71-78). Here the whole front end — channelizer, DQPSK
demod, slicer, training-sequence correlation and FEC — runs as batched
device programs over the carrier axis, with one host-side control-plane
(upper MAC/LLC/MLE) instance per carrier consuming the decoded bits.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tetra_tpu.phy import channelizer, dqpsk
from tetra_tpu.rx import TetraReceiver, RxStats

__all__ = ["MultiCarrierReceiver"]


class MultiCarrierReceiver:
    def __init__(self, offsets_hz, fs: float, sps: int = 2,
                 keystore_path: str | None = None,
                 dumpdir: str | None = None, log=None):
        self.offsets = np.asarray(offsets_hz, dtype=np.float32)
        self.fs = float(fs)
        self.sps = sps
        self.carriers = []
        for i in range(len(self.offsets)):
            carrier_log = log if log is not None else (lambda *a, **k: None)
            self.carriers.append(TetraReceiver(
                keystore_path=keystore_path,
                dumpdir=f"{dumpdir}/carrier{i}" if dumpdir else None,
                log=carrier_log))

    def process_iq(self, wideband_iq) -> list[RxStats]:
        """One chunk of wideband complex samples through the full chain."""
        chans = channelizer.channelize(
            jnp.asarray(wideband_iq), jnp.asarray(self.offsets), fs=self.fs)
        syms = dqpsk.demodulate(chans, sps=self.sps)
        bits = np.asarray(dqpsk.float_to_bits(syms))
        return self.process_bits(bits)

    def process_bits(self, bits) -> list[RxStats]:
        """Per-carrier hard bits [C, T] -> per-carrier decode stats."""
        bits = np.asarray(bits, dtype=np.uint8)
        assert bits.ndim == 2 and bits.shape[0] == len(self.carriers)
        return [rx.process_bits(bits[i]) for i, rx in enumerate(self.carriers)]

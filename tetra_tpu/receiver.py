"""Live receiver pipeline CLI — the receiver1 / receiver1udp analogue.

Reference behaviour: shell pipelines `demod | float_to_bits | tetra-rx`
over FIFOs (src/receiver1:8) or UDP via socat (src/receiver1udp:71-78).
Here the whole chain runs in one process: UDP or file ingest, DQPSK
demod + slicer on device, streaming burst sync + decode, control plane
on host.

Usage:
  python -m tetra_tpu.receiver --udp 42001 [--fmt iq]
  python -m tetra_tpu.receiver --file capture.cfile
  python -m tetra_tpu.receiver --file capture.bits -d DUMPDIR -k KEYSTORE
"""
from __future__ import annotations

import argparse
import sys

import numpy as np

from tetra_tpu.rx import TetraReceiver
from tetra_tpu.io.inputs import load_capture, capture_to_bits
from tetra_tpu.io.udp import UdpSource, TELIVE_PORT


def run_udp(rx: TetraReceiver, port: int, fmt: str, sps: int,
            chunk_symbols: int = 36_000, timeout: float = 5.0):
    """Consume UDP datagrams, batching into ~1 s chunks before the
    device pipeline (amortises dispatch like the reference's FIFO
    buffering)."""
    dtype = {"iq": np.complex64, "float": np.float32, "bits": np.uint8}[fmt]
    src = UdpSource(port, dtype=dtype, timeout=timeout)
    pending: list[np.ndarray] = []
    pending_n = 0
    try:
        for chunk in src.stream():
            pending.append(chunk)
            pending_n += len(chunk)
            if pending_n >= chunk_symbols:
                data = np.concatenate(pending)
                pending, pending_n = [], 0
                rx.process_bits(capture_to_bits(fmt, data, sps=sps))
    except KeyboardInterrupt:
        pass
    finally:
        if pending:
            rx.process_bits(capture_to_bits(fmt, np.concatenate(pending), sps=sps))
        src.close()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--udp", type=int, nargs="?", const=TELIVE_PORT,
                   help=f"listen for samples on UDP port (default {TELIVE_PORT})")
    g.add_argument("--file", help="capture file (.bits/.fl/.cfile)")
    p.add_argument("--fmt", default="auto", choices=("auto", "bits", "float", "iq"))
    p.add_argument("--sps", type=int, default=2, help="samples per symbol for IQ")
    p.add_argument("-d", dest="dumpdir")
    p.add_argument("-k", dest="keystore")
    p.add_argument("-g", dest="gsmtap", nargs="?", const="localhost")
    args = p.parse_args(argv)

    rx = TetraReceiver(keystore_path=args.keystore, dumpdir=args.dumpdir,
                       gsmtap_host=args.gsmtap)
    if args.file:
        kind, data = load_capture(args.file, args.fmt)
        rx.process_bits(capture_to_bits(kind, data, sps=args.sps))
    else:
        fmt = "iq" if args.fmt == "auto" else args.fmt
        run_udp(rx, args.udp, fmt, args.sps)
    s = rx.stats
    print(f"\n{s.bursts} bursts, CRC ok/wrong = {s.crc_ok}/{s.crc_wrong}",
          file=sys.stderr)


if __name__ == "__main__":
    main()

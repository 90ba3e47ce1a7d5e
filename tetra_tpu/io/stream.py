"""Double-buffered host->device streaming ingest.

Reference behaviour: the receiver ingests samples over a pipe/UDP fd in
a blocking read loop (reference src/tetra-rx.c:82-95, receiver1udp:71-78)
— transfer and compute are fully serialized.

TPU design (SURVEY.md §7.2 step 6): JAX dispatch is asynchronous, so a
simple reorder — enqueue the device_put of chunk N+1 BEFORE forcing
chunk N's result — overlaps the PCIe/tunnel DMA with compute. The only
hard sync per iteration is the tiny (bytes-scale) device->host fetch of
the decoded outputs.

Raw SDR sample formats are quantized (rtl-sdr: uint8 I/Q); ingesting
int8 and dequantizing ON DEVICE cuts host->device bytes 4x vs float32,
which matters because ingest bandwidth, not compute, bounds streaming
carrier count (bench.py reports both).
"""
from __future__ import annotations

from typing import Callable, Iterable, Iterator

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["stream_map", "dequantize_iq", "quantize_iq",
           "dequantize_iq4", "quantize_iq4"]


def quantize_iq(re, im, scale: float = 127.0):
    """Host-side float IQ -> int8 planar pair (SDR-capture-like)."""
    q = lambda x: np.clip(np.round(np.asarray(x) * scale), -127, 127).astype(np.int8)
    return q(re), q(im)


def dequantize_iq(re_i8, im_i8, scale: float = 1.0 / 127.0):
    """Device-side int8 planar IQ -> float32 (fused into the consumer
    program by XLA)."""
    return (re_i8.astype(jnp.float32) * scale,
            im_i8.astype(jnp.float32) * scale)


def quantize_iq4(re, im, scale: float = 7.0):
    """Host-side float IQ -> ONE uint8 per complex sample (I in the low
    nibble, Q in the high nibble, two's-complement nibbles in [-7, 7]).

    Halves ingest bytes vs planar int8. Quantization noise is ~-25 dB —
    far above the chain's CRC floor (~14 dB AWGN, tests/test_snr.py) —
    so this is the right format whenever the host->device link, not
    compute, bounds streaming carrier count."""
    q = lambda x: (np.clip(np.round(np.asarray(x) * scale), -7, 7)
                   .astype(np.int8) & 0xF).astype(np.uint8)
    return (q(re) | (q(im) << 4)).astype(np.uint8)


def dequantize_iq4(packed, scale: float = 1.0 / 7.0):
    """Device-side packed 4+4-bit IQ -> (re, im) float32. Sign-extends
    each nibble via the (x ^ 8) - 8 identity; fused by XLA."""
    p = packed.astype(jnp.int32)
    re4 = ((p & 0xF) ^ 8) - 8
    im4 = (((p >> 4) & 0xF) ^ 8) - 8
    return (re4.astype(jnp.float32) * scale,
            im4.astype(jnp.float32) * scale)


def stream_map(step: Callable, chunks: Iterable, *,
               device=None, prefetch: int = 1, static=None) -> Iterator:
    """Map a (jitted) step over host chunks with transfer/compute overlap.

    chunks: iterable of pytrees of host arrays. Each chunk is
    device_put; the put of chunk N+prefetch is enqueued before chunk N's
    step result is awaited, so the host->device copy rides under the
    device compute. Yields step(chunk) results in order (device arrays;
    caller converts/blocks).

    static: optional pytree of per-stream constants (scrambling codes,
    filter state, ...) device_put ONCE; step is then called as
    step(static, chunk).

    Transfer-economy notes (they dominate on high-latency links like a
    tunneled device, where every RPC costs ~tens of ms and transfers do
    NOT pipeline):
    - pack each chunk as ONE array (e.g. stacked [2, C, T] int8 IQ),
      not a dict of several — each leaf is a separate transfer;
    - keep results ON DEVICE while iterating and gather them with a
      single jax.device_get(list(...)) at the end — a per-item int() /
      np.asarray() costs a full device round-trip each and stalls the
      put/compute overlap.
    """
    if device is None:
        device = jax.devices()[0]
    if static is not None:
        static_dev = jax.device_put(static, device)
        inner = step
        step = lambda c: inner(static_dev, c)
    it = iter(chunks)
    buf = []
    try:
        for _ in range(prefetch + 1):
            buf.append(jax.device_put(next(it), device))
    except StopIteration:
        pass
    while buf:
        cur = buf.pop(0)
        out = step(cur)
        try:
            buf.append(jax.device_put(next(it), device))
        except StopIteration:
            pass
        yield out

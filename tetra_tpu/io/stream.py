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
           "dequantize_iq4", "quantize_iq4",
           "dequantize_iq4c", "quantize_iq4c", "LLOYD_MAX_16"]


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


# Optimal (Lloyd-Max) 16-level quantizer for a unit-variance Gaussian
# (Max, "Quantizing for minimum distortion", 1960). A fully-loaded
# wideband composite of many carriers IS Gaussian, and a UNIFORM 4-bit
# quantizer loses ~4.5 dB to it (15.6 vs 20.1 dB per-channel SNR
# measured on a 512-carrier composite): the uniform grid wastes levels
# on the rare tails, while the companded grid concentrates them where
# the density is. 20 dB per channel sits ~10 dB above the hard-decision
# chain's CRC floor (PARITY.md robustness table).
LLOYD_MAX_16 = np.array(
    [-2.733, -2.069, -1.618, -1.256, -0.9424, -0.6568, -0.3881, -0.1284,
     0.1284, 0.3881, 0.6568, 0.9424, 1.256, 1.618, 2.069, 2.733],
    np.float32)
_LM16_BOUNDS = ((LLOYD_MAX_16[:-1] + LLOYD_MAX_16[1:]) / 2).astype(np.float32)


def quantize_iq4c(re, im, sigma: float | None = None):
    """Host-side float IQ -> ONE uint8 per complex sample, COMPANDED:
    each component maps to the nearest of 16 Lloyd-Max levels for a
    Gaussian of the measured (or given) std; I index in the low nibble,
    Q in the high nibble.

    The production wideband ingest format: 25 kB/s per carrier at full
    occupancy (vs 50 for interleaved int8) with ~20 dB per-channel SNR
    REGARDLESS of channel count — the uniform-grid iq4 format clips the
    Gaussian composite above ~128 active channels; the companded grid
    does not. The level SCALE never needs to reach the decoder: the
    DQPSK demod is phase-based (amplitude-invariant), so
    `dequantize_iq4c` emits unit-sigma levels."""
    re = np.asarray(re)
    im = np.asarray(im)
    if sigma is None:
        sigma = float(np.sqrt((np.var(re) + np.var(im)) / 2.0)) or 1.0
    qi = np.searchsorted(_LM16_BOUNDS, re / sigma).astype(np.uint8)
    qq = np.searchsorted(_LM16_BOUNDS, im / sigma).astype(np.uint8)
    return (qi | (qq << 4)).astype(np.uint8)


def dequantize_iq4c(packed):
    """Device-side companded 4+4-bit IQ -> (re, im) float32 at unit
    sigma: two 16-entry LUT takes, fused into the consumer by XLA."""
    lut = jnp.asarray(LLOYD_MAX_16)
    p = packed.astype(jnp.int32)
    return jnp.take(lut, p & 0xF), jnp.take(lut, (p >> 4) & 0xF)


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

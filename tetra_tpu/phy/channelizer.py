"""Wideband channelizer: one capture -> N per-carrier baseband streams.

Reference behaviour: one GNU Radio process per carrier, each running a
frequency-translating FIR + resampler in front of the DQPSK demod
(reference src/demod/osmosdr-tetra_demod_fft.py:64-96,
telive_1ch_simple_gr310_udp.py). Multi-carrier = multi-process.

TPU design: all carriers are extracted from the same wideband tensor in
one batched program — mix with a bank of complex oscillators
[C, T], low-pass filter, and polyphase-resample to the demod rate
(36 kHz, sps=2) with precomputed per-output gather indices + a P-phase
fractional-delay filterbank. Every stage is a dense batched op; carriers
are the embarrassingly-parallel axis that shards across chips.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["design_lowpass", "channelize", "synthesize_wideband"]

DEMOD_RATE = 36_000.0
_N_PHASES = 32


@functools.lru_cache(maxsize=16)
def design_lowpass(fs: float, cutoff: float, ntaps: int = 127) -> np.ndarray:
    """Hamming-windowed sinc low-pass FIR (unity DC gain)."""
    t = np.arange(ntaps) - (ntaps - 1) / 2.0
    h = np.sinc(2.0 * cutoff / fs * t) * np.hamming(ntaps)
    return (h / h.sum()).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _resample_plan(n_in: int, fs: float, out_rate: float,
                   ntaps_per_phase: int = 8, skew: float = 0.0):
    """Precompute (gather_start [n_out], phase_indices [n_out],
    filterbank [P, ntaps]) for arbitrary-ratio polyphase resampling.

    Delay-free: output sample n interpolates the input at exactly
    n * fs/out_rate + skew input samples (skew compensates upstream
    group delay, e.g. a PFB prototype). The interpolation kernel centre
    sits ntaps//2 - 1 taps into each gathered window.
    """
    ratio = fs / out_rate
    centre = ntaps_per_phase // 2 - 1
    n_out = max(int((n_in - ntaps_per_phase - max(skew, 0.0)) / ratio), 0)
    pos = np.arange(n_out) * ratio + skew
    ipos = np.floor(pos).astype(np.int32)
    frac = pos - ipos
    start = np.maximum(ipos - centre, 0)
    phase = np.minimum((frac * _N_PHASES).astype(np.int32), _N_PHASES - 1)
    # P-phase fractional-delay interpolation bank (windowed sinc)
    k = np.arange(ntaps_per_phase) - centre
    bank = np.zeros((_N_PHASES, ntaps_per_phase), np.float32)
    for p in range(_N_PHASES):
        d = p / _N_PHASES
        h = np.sinc(k - d) * np.hamming(ntaps_per_phase)
        bank[p] = (h / h.sum()).astype(np.float32)
    return start, phase, bank


@functools.partial(jax.jit, static_argnames=("fs", "out_rate", "ntaps"))
def channelize_ri(re, im, offsets_hz, fs: float, out_rate: float = DEMOD_RATE,
                  ntaps: int = 127):
    """Planar wideband channelizer: float32 [T] planes -> [C, n_out] planes.

    Same math as `channelize` but with all complex arithmetic expressed
    on real/imag planes (TPU transport + VPU friendly): oscillator-bank
    mix, low-pass FIR per plane, polyphase resample per plane.
    Returns (out_re, out_im).
    """
    from tetra_tpu.phy.dqpsk import _fir_real
    re = jnp.asarray(re, dtype=jnp.float32)
    im = jnp.asarray(im, dtype=jnp.float32)
    T = re.shape[-1]
    t = jnp.arange(T, dtype=jnp.float32) / jnp.float32(fs)
    ph = 2.0 * jnp.pi * offsets_hz[:, None] * t[None, :]
    c, s = jnp.cos(ph), jnp.sin(ph)
    # (re + j im) * e^{-j ph}
    mr = re[None, :] * c + im[None, :] * s
    mi = im[None, :] * c - re[None, :] * s

    taps = design_lowpass(fs, 12_500.0, ntaps)
    fr = _fir_real(mr, taps)
    fi = _fir_real(mi, taps)

    base, phase, bank = _resample_plan(T, fs, out_rate)
    ntp = bank.shape[1]
    gather = jnp.asarray(base)[:, None] + jnp.arange(ntp)[None, :]
    gather = jnp.clip(gather, 0, T - 1)
    coefs = jnp.asarray(bank)[jnp.asarray(phase)].astype(jnp.float32)
    out_r = jnp.einsum("cnw,nw->cn", fr[:, gather], coefs)
    out_i = jnp.einsum("cnw,nw->cn", fi[:, gather], coefs)
    return out_r, out_i


@functools.partial(jax.jit, static_argnames=("fs", "out_rate", "ntaps"))
def channelize(iq, offsets_hz, fs: float, out_rate: float = DEMOD_RATE,
               ntaps: int = 127):
    """Wideband complex [T] (or [..., T]) -> per-carrier baseband [C, T_out].

    offsets_hz: [C] float32 carrier offsets relative to the capture
    centre. Output rate defaults to the reference demod's 36 kHz.
    """
    iq = jnp.asarray(iq)
    T = iq.shape[-1]
    t = jnp.arange(T, dtype=jnp.float32) / jnp.float32(fs)
    osc = jnp.exp(-2j * jnp.pi * offsets_hz[:, None] * t[None, :])
    mixed = iq[None, :] * osc.astype(jnp.complex64)            # [C, T]

    # low-pass to the channel bandwidth (half the 25 kHz spacing)
    from tetra_tpu.phy.dqpsk import _fir_complex
    taps = jnp.asarray(design_lowpass(fs, 12_500.0, ntaps))
    filt = _fir_complex(mixed, taps)                           # [C, T]

    # polyphase resample to out_rate
    base, phase, bank = _resample_plan(T, fs, out_rate)
    ntp = bank.shape[1]
    gather = jnp.asarray(base)[:, None] + jnp.arange(ntp)[None, :]  # [n_out, ntp]
    gather = jnp.clip(gather, 0, T - 1)
    windows = filt[:, gather]                                   # [C, n_out, ntp]
    coefs = jnp.asarray(bank)[jnp.asarray(phase)]               # [n_out, ntp]
    return jnp.einsum("cnw,nw->cn", windows, coefs.astype(jnp.complex64))


def synthesize_wideband(basebands, offsets_hz, fs: float,
                        in_rate: float = DEMOD_RATE) -> np.ndarray:
    """Host fixture generator: per-carrier baseband [C, T_in] at in_rate
    -> summed wideband capture [T_out] at fs (inverse of channelize)."""
    basebands = np.asarray(basebands)
    C, T_in = basebands.shape
    ratio = fs / in_rate
    T_out = int(T_in * ratio)
    t_out = np.arange(T_out) / fs
    # upsample each carrier by windowed-sinc interpolation at the output
    # instants (32 taps, Kaiser window — a truncated bare sinc has ~-13 dB
    # interpolation error at fractional positions, enough to close the
    # DQPSK eye)
    pos = t_out * in_rate
    base = np.floor(pos).astype(np.int64)
    frac = pos - base
    half = 16
    k = np.arange(-half + 1, half + 1)
    win = np.kaiser(2 * half, 8.0)
    out = np.zeros(T_out, np.complex64)
    for c in range(C):
        sig = np.zeros(T_out, np.complex64)
        for wi, kk in enumerate(k):
            idx = np.clip(base + kk, 0, T_in - 1)
            w = np.sinc(kk - frac) * win[wi]
            sig += basebands[c, idx] * w
        out += sig * np.exp(2j * np.pi * offsets_hz[c] * t_out)
    return out.astype(np.complex64)

"""Fused Pallas TPU kernel for the hard-decision pi/4-DQPSK demodulator.

Equivalent to dqpsk.demodulate_hard_ri (same RRC matched filter, same
trig-free sign decisions, same |sin 2θ| timing metric) but fused: the
XLA version materialises half a dozen [C, T] float32 intermediates
(filtered planes, lagged copies, differential phasor, metric terms) in
HBM, while this kernel keeps everything in VMEM. The demodulator is the
front door of the whole receive chain (SURVEY.md §3.1 hot loop 1/2
territory: reference src/demod/cqpsk.py:226-283 + float_to_bits.c), so
it gets the same Pallas treatment as the Viterbi.

Design notes (all three were measured to matter on v5e):
- No pre-gather, no pad copy: the raw [C, T] planes are passed three
  times with clamped block index maps (prev/cur/next time block); the
  kernel stitches the overlap-save window with two static concats and
  zeroes out-of-stream lanes with an iota mask. Out-of-range views are
  clamped to a real block and always masked.
- The RRC FIR runs as tb/128+1 banded [149, 128] matmuls (MXU) instead
  of one dense [W, tb] band — the dense band's FLOPs grow with the
  block length, the sub-blocked form stays at ~150 MACs/output.
- Decisions leave as ONE packed int8 (b0 | b1<<1): half the output
  bytes, one phase-select gather on the host side of the kernel.

Layout: carriers in sublanes, time in lanes; grid = (carrier tiles,
time blocks). The per-carrier timing choice — the only cross-time
coupling — accumulates as a [C, sps] metric across the time-block grid
axis and is argmaxed by XLA after the kernel.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetra_tpu.phy.dqpsk import rrc_taps

__all__ = ["demodulate_hard_ri_pallas", "demodulate_hard_slots_ri_pallas"]

_SUB = 128          # FIR sub-block width (one MXU tile of outputs)


@functools.lru_cache(maxsize=8)
def _band(W: int, n_fir: int, taps_key) -> np.ndarray:
    """[W, n_fir] banded matrix: fir[o] = Σ_m win[m] · band[m, o] with
    band[m, o] = taps_rev[m - o] — overlap-save FIR-as-matmul."""
    kernel = np.asarray(taps_key, np.float32)[::-1]
    K = len(kernel)
    band = np.zeros((W, n_fir), np.float32)
    for o in range(n_fir):
        band[o:o + K, o] = kernel
    return band


def _make_kernel(tc: int, tb: int, sps: int, K: int, T: int):
    pad_l = K // 2
    n_sub = tb // _SUB + 1
    halo_l = _SUB + pad_l           # window starts at t0 - SUB - pad_l
    halo_r = K - 1 - pad_l          # ... and ends at t0 + tb + halo_r
    W = tb + halo_l + halo_r

    def kernel(xl_re, xc_re, xr_re, xl_im, xc_im, xr_im, band_ref,
               pk_ref, met_ref):
        j = pl.program_id(1)
        band = band_ref[:]                                  # [SUB+K-1, SUB]
        lane_w = jax.lax.broadcasted_iota(jnp.int32, (tc, W), 1)
        g = j * tb - halo_l + lane_w                        # global sample idx
        valid = jnp.logical_and(g >= 0, g < T)

        def fir(xl, xc, xr):
            win = jnp.concatenate(
                [xl[:, 2 * _SUB - halo_l:], xc[:], xr[:, :halo_r]], axis=1)
            win = jnp.where(valid, win, 0.0)
            subs = [jnp.dot(win[:, m * _SUB: m * _SUB + _SUB + K - 1], band,
                            preferred_element_type=jnp.float32)
                    for m in range(n_sub)]
            return jnp.concatenate(subs, axis=1)            # [tc, t0-SUB, t0+tb)

        fr = fir(xl_re, xc_re, xr_re)
        fi = fir(xl_im, xc_im, xr_im)
        # differential phasor d = z[t] · conj(z[t - sps]); the lag is
        # zero for the stream's first sps samples (the XLA demod's
        # zero-padded lag, not the FIR's startup transient)
        cr, ci = fr[:, _SUB:], fi[:, _SUB:]                 # [tc, tb]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tc, tb), 1)
        head = jnp.logical_and(j == 0, lane < sps)
        lr = jnp.where(head, 0.0, fr[:, _SUB - sps: _SUB - sps + tb])
        li = jnp.where(head, 0.0, fi[:, _SUB - sps: _SUB - sps + tb])
        dr = cr * lr + ci * li
        di = ci * lr - cr * li
        # hard decisions (float_to_bits.c threshold map, trig-free),
        # packed: bit0 = (Im d <= 0), bit1 = (Re d < 0)
        pk_ref[:] = ((di <= 0.0).astype(jnp.int32)
                     + 2 * (dr < 0.0).astype(jnp.int32)).astype(jnp.int8)
        # timing metric |sin 2θ| = 2|dr·di| / |d|², summed per sample
        # phase (masked lane reductions: Mosaic can't lane-split
        # [tc, tb] -> [tc, tb/sps, sps])
        mag2 = dr * dr + di * di
        s = 2.0 * jnp.abs(dr * di) / (mag2 + 1e-12)
        part = jnp.concatenate(
            [jnp.sum(jnp.where(lane % sps == p, s, 0.0), axis=1,
                     keepdims=True) for p in range(sps)], axis=1)

        @pl.when(j == 0)
        def _():
            met_ref[:] = jnp.zeros_like(met_ref)
        met_ref[:] += part

    return kernel, W


def _demod_sel(re, im, sps: int = 2, tile_c: int = 256, tile_t: int = 512,
               interpret: bool | None = None):
    """Kernel + phase selection -> packed per-symbol decisions
    [C, T//sps] int8 (b0 | b1<<1); shared by the bit-stream and
    slot-framed public entry points."""
    assert re.ndim == 2
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    taps = rrc_taps(sps)
    K = len(taps)
    C, T = re.shape
    n_sym = T // sps
    # the left halo is _SUB + K//2 < 2·_SUB lanes of the previous
    # block, so blocks must span at least two sub-blocks (and a whole
    # number of them, for the halo views' index arithmetic)
    tb = max(2 * _SUB, min(tile_t, -(-T // _SUB) * _SUB))
    tb = -(-tb // (2 * _SUB)) * (2 * _SUB)
    n_blk = -(-T // tb)
    tc = min(tile_c, C)
    pc = (-C) % tc
    Cp = C + pc

    xre = jnp.pad(re.astype(jnp.float32), ((0, pc), (0, 0)))
    xim = jnp.pad(im.astype(jnp.float32), ((0, pc), (0, 0)))
    band = jnp.asarray(_band(_SUB + K - 1, _SUB,
                             tuple(np.asarray(taps).tolist())))

    kernel, W = _make_kernel(tc, tb, sps, K, T)

    # overlap-save halo views: the left halo needs the previous block's
    # last _SUB + K//2 lanes and the right the next block's first
    # K-1-K//2 — fixed 2·_SUB / _SUB wide tiles regardless of tb, so
    # HBM read traffic is (tb + 3·_SUB)/tb of the input instead of the
    # 3x that full prev/cur/next block views cost. Clamped out-of-range
    # tiles carry garbage that the kernel's global-index mask zeroes.
    assert K - 1 <= _SUB and tb % (2 * _SUB) == 0
    n128 = -(-T // _SUB)             # array extent in _SUB-lane tiles
    n256 = -(-T // (2 * _SUB))       # ... and in 2·_SUB-lane tiles
    rl, rr = tb // (2 * _SUB), tb // _SUB

    def halo(width_tiles, imap):
        return pl.BlockSpec((tc, width_tiles * _SUB), imap,
                            memory_space=pltpu.VMEM)

    plane_specs = [
        halo(2, lambda i, j: (i, jnp.clip(j * rl - 1, 0, n256 - 1))),
        pl.BlockSpec((tc, tb), lambda i, j: (i, j),
                     memory_space=pltpu.VMEM),
        halo(1, lambda i, j: (i, jnp.clip((j + 1) * rr, 0, n128 - 1))),
    ]
    pk, met = pl.pallas_call(
        kernel,
        grid=(Cp // tc, n_blk),
        in_specs=plane_specs + plane_specs + [
            pl.BlockSpec((_SUB + K - 1, _SUB), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM)],
        out_specs=[
            pl.BlockSpec((tc, tb), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, sps), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Cp, n_blk * tb), jnp.int8),
            jax.ShapeDtypeStruct((Cp, sps), jnp.float32),
        ],
        interpret=interpret,
    )(xre, xre, xre, xim, xim, xim, band)

    pk = pk[:C, : n_sym * sps].reshape(C, n_sym, sps)
    met = met[:C]

    # per-carrier timing phase, then slice that parity's samples
    best = jnp.argmax(met, axis=-1).astype(jnp.int32)       # [C]
    sel = jnp.take_along_axis(pk, best[:, None, None], axis=-1)[..., 0]
    return sel


def _unpack_bits(sel):
    bits = jnp.stack([sel & 1, (sel >> 1) & 1], axis=-1)
    return bits.reshape(sel.shape[0], 2 * sel.shape[1])


@functools.partial(jax.jit,
                   static_argnames=("sps", "tile_c", "tile_t", "interpret"))
def demodulate_hard_ri_pallas(re, im, sps: int = 2, tile_c: int = 256,
                              tile_t: int = 512,
                              interpret: bool | None = None):
    """Planar baseband [C, T] f32 -> hard ubits [C, 2·(T//sps)].

    Drop-in for dqpsk.demodulate_hard_ri on 2-D batches (the steady
    chain's shape), for T a multiple of sps. Decision-identical on
    anything with a decision margin above f32/bf16 matmul rounding (the
    FIR runs on the MXU in both versions, with different blockings).
    interpret=None auto-selects the Pallas interpreter off-TPU, so the
    same call works in CPU tests and on hardware.
    """
    return _unpack_bits(_demod_sel(re, im, sps, tile_c, tile_t, interpret))


@functools.partial(jax.jit, static_argnames=("n_slots", "phase_bit", "sps",
                                             "tile_c", "tile_t", "interpret"))
def demodulate_hard_slots_ri_pallas(re, im, n_slots: int, phase_bit: int = 0,
                                    sps: int = 2, tile_c: int = 256,
                                    tile_t: int = 512,
                                    interpret: bool | None = None):
    """Planar baseband [C, T] f32 -> (slots [C, n_slots, 510],
    bits [C, 2·(T//sps)]), locked at bit `phase_bit` (must be even:
    a whole-symbol offset).

    The slot framing is cut at the SYMBOL level, on the demod's packed
    per-symbol decisions, before bit unpacking — slicing the unpacked
    [C, 2·n_sym] bit stream at a non-tile offset relayouts the whole
    stream (~2 ms at bench shapes) where the symbol-level cut plus
    paired unpack into the slot shape costs one half-width pass. The
    two return values share the demod; inside a jit, whichever the
    caller drops is dead-code-eliminated.
    """
    assert phase_bit % 2 == 0, "slot framing needs a whole-symbol offset"
    sel = _demod_sel(re, im, sps, tile_c, tile_t, interpret)
    n_sym_slot = 255
    off = phase_bit // 2
    Cn = sel.shape[0]
    sel_s = sel[:, off: off + n_slots * n_sym_slot].reshape(
        Cn, n_slots, n_sym_slot)
    slots = jnp.stack([sel_s & 1, (sel_s >> 1) & 1],
                      axis=-1).reshape(Cn, n_slots, 2 * n_sym_slot)
    return slots, _unpack_bits(sel)

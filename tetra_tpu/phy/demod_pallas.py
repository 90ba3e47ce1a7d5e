"""Fused Pallas TPU kernel for the hard-decision pi/4-DQPSK demodulator.

Equivalent to dqpsk.demodulate_hard_ri (same RRC matched filter, same
trig-free sign decisions, same |sin 2θ| timing metric) but fused: the
XLA version materialises half a dozen [C, T] float32 intermediates
(filtered planes, lagged copies, differential phasor, metric terms) in
HBM, while this kernel keeps everything in VMEM — it reads each input
sample once (plus a ~4-8% overlap-save halo), writes 2 bytes of
decisions per sample, and accumulates the per-carrier timing metric
across time blocks inside the grid. The demodulator is the front door
of the whole receive chain (SURVEY.md §3.1 hot loop 1/2 territory:
reference src/demod/cqpsk.py:226-283 + float_to_bits.c), so it gets the
same Pallas treatment as the Viterbi.

Layout: time blocks in the grid's fast axis, carriers in sublanes, time
in lanes. The RRC FIR is a banded [W, tb+sps] matmul against the
overlap-save window (MXU), the phasor / metric / slicing are
elementwise VPU ops, and the per-carrier timing choice — the only
cross-time coupling — leaves the kernel as a [C, sps] partial-sum
output that XLA argmaxes before a cheap int8 phase gather.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetra_tpu.phy.dqpsk import rrc_taps

__all__ = ["demodulate_hard_ri_pallas"]


@functools.lru_cache(maxsize=8)
def _band(W: int, n_fir: int, taps_key) -> np.ndarray:
    """[W, n_fir] banded matrix: fir[o] = Σ_m win[m] · band[m, o] with
    band[m, o] = taps_rev[m - o] — the same overlap-save FIR-as-matmul
    as dqpsk._fir_real, windowed per kernel block."""
    kernel = np.asarray(taps_key, np.float32)[::-1]
    K = len(kernel)
    band = np.zeros((W, n_fir), np.float32)
    for o in range(n_fir):
        band[o:o + K, o] = kernel
    return band


def _make_kernel(tc: int, tb: int, sps: int):

    def kernel(fre_ref, fim_ref, band_ref, b0_ref, b1_ref, met_ref):
        j = pl.program_id(1)
        band = band_ref[:]
        fre = fre_ref[0]                                   # [tc, W]
        fim = fim_ref[0]
        fr = jnp.dot(fre, band, preferred_element_type=jnp.float32)
        fi = jnp.dot(fim, band, preferred_element_type=jnp.float32)
        # differential phasor d = z[t] · conj(z[t - sps]); at the very
        # start of the stream the lag is zero (matches the XLA demod's
        # zero-padded lag, not the FIR's startup transient)
        cr, ci = fr[:, sps:], fi[:, sps:]                  # [tc, tb]
        lane = jax.lax.broadcasted_iota(jnp.int32, (tc, tb), 1)
        head = jnp.logical_and(j == 0, lane < sps)
        lr = jnp.where(head, 0.0, fr[:, :-sps])
        li = jnp.where(head, 0.0, fi[:, :-sps])
        dr = cr * lr + ci * li
        di = ci * lr - cr * li
        # hard decisions (float_to_bits.c threshold map, trig-free)
        b0_ref[0] = (di <= 0.0).astype(jnp.int8)
        b1_ref[0] = (dr < 0.0).astype(jnp.int8)
        # timing metric |sin 2θ| = 2|dr·di| / |d|², summed per phase.
        # Mosaic can't lane-split [tc, tb] -> [tc, tb/sps, sps]; per-phase
        # sums are masked lane reductions instead (sps is 2, static).
        mag2 = dr * dr + di * di
        s = 2.0 * jnp.abs(dr * di) / (mag2 + 1e-12)
        part = jnp.concatenate(
            [jnp.sum(jnp.where(lane % sps == p, s, 0.0), axis=1,
                     keepdims=True) for p in range(sps)], axis=1)  # [tc, sps]

        @pl.when(j == 0)
        def _():
            met_ref[:] = jnp.zeros_like(met_ref)
        met_ref[:] += part

    return kernel


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
    assert re.ndim == 2
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    taps = rrc_taps(sps)
    K = len(taps)
    pad_l = K // 2
    C, T = re.shape
    n_sym = T // sps
    tb = min(tile_t, -(-T // sps) * sps)
    # halo: fir output t needs x[t - pad_l, t - pad_l + K); block j
    # needs fir over [j·tb - sps, j·tb + tb)
    W = tb + sps + K - 1
    n_blk = -(-T // tb)
    tc = min(tile_c, C)
    pc = (-C) % tc
    pt = n_blk * tb - T

    def frames(x):
        xp = jnp.pad(x.astype(jnp.float32),
                     ((0, pc), (pad_l + sps, pt + K - 1 - pad_l)))
        idx = (jnp.arange(n_blk) * tb)[:, None] + jnp.arange(W)[None, :]
        return jnp.swapaxes(xp[:, idx], 0, 1)               # [n_blk, Cp, W]

    fre = frames(re)
    fim = frames(im)
    Cp = C + pc
    band = jnp.asarray(_band(W, tb + sps, tuple(np.asarray(taps).tolist())))

    kernel = _make_kernel(tc, tb, sps)
    b0, b1, met = pl.pallas_call(
        kernel,
        grid=(Cp // tc, n_blk),
        in_specs=[
            pl.BlockSpec((1, tc, W), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, W), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, tb + sps), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tc, tb), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tc, tb), lambda i, j: (j, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tc, sps), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_blk, Cp, tb), jnp.int8),
            jax.ShapeDtypeStruct((n_blk, Cp, tb), jnp.int8),
            jax.ShapeDtypeStruct((Cp, sps), jnp.float32),
        ],
        interpret=interpret,
    )(fre, fim, band)

    b0 = jnp.swapaxes(b0, 0, 1).reshape(Cp, n_blk * tb)[:C, :T]
    b1 = jnp.swapaxes(b1, 0, 1).reshape(Cp, n_blk * tb)[:C, :T]
    met = met[:C]

    # per-carrier timing phase, then slice that parity's samples
    best = jnp.argmax(met, axis=-1).astype(jnp.int32)       # [C]
    b0s = b0[:, : n_sym * sps].reshape(C, n_sym, sps)
    b1s = b1[:, : n_sym * sps].reshape(C, n_sym, sps)
    sel0 = jnp.take_along_axis(b0s, best[:, None, None], axis=-1)[..., 0]
    sel1 = jnp.take_along_axis(b1s, best[:, None, None], axis=-1)[..., 0]
    bits = jnp.stack([sel0, sel1], axis=-1)
    return bits.reshape(C, 2 * n_sym)

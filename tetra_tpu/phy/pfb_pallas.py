"""Fused Pallas TPU kernel for the 2x-oversampled WOLA channelizer.

Same math as phy.pfb.pfb_channelize_ri (polyphase window -> analysis
DFT -> (-1)^{cm} hop rotation), fused into one VMEM pass: the XLA
version accumulates the polyphase sum in 2·J shifted multiply-adds over
HBM (~50 HBM touches per input sample at J=16) and materialises the
[M, C] branch tensor twice around the DFT matmuls. Here the input is
read once per block (plus a 2J-row halo view), the window runs as
sublane-shifted FMAs on the VPU, the DFT as four [tm, C]x[C, C] MXU
matmuls against resident cos/sin matrices, and only the rotated channel
frames leave the kernel.

Layout: the wideband stream is reshaped (free) to hop-sized rows
[nblk, hop]; frames sit in sublanes, polyphase branches in lanes. The
frame window spans rows [m, m + 2J), so each block needs one
right-halo view (cur, next) — clamped index maps + masking, the same
no-gather/no-pad-copy structure as phy.demod_pallas.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetra_tpu.phy.pfb import pfb_prototype, _dft_matrices

__all__ = ["pfb_channelize_ri_pallas", "pfb_channelize_rows_pallas",
           "resample_rows_pallas"]


def _make_kernel(tm: int, hop: int, J: int, dft_dtype):
    n_chan = 2 * hop

    def kernel(xr_c, xr_n, xi_c, xi_n, hlo_ref, hhi_ref, cos_ref, sin_ref,
               yr_ref, yi_ref):
        j = pl.program_id(0)
        hlo = hlo_ref[:]                                   # [J, hop]
        hhi = hhi_ref[:]

        def branches(cur, nxt):
            win = jnp.concatenate([cur[:], nxt[:]], axis=0)  # [2tm, hop]
            lo = jnp.zeros((tm, hop), jnp.float32)
            hi = jnp.zeros((tm, hop), jnp.float32)
            # sublane-offset slices are not Mosaic-friendly; rotate the
            # window instead (pltpu.roll; forward-only, so size - s
            # realises the backward shift win[i + s]) and slice at 0
            for jj in range(J):
                lo = lo + pltpu.roll(win, (2 * tm - 2 * jj) % (2 * tm),
                                     0)[:tm] * hlo[jj]
                hi = hi + pltpu.roll(win, 2 * tm - 2 * jj - 1, 0)[:tm] * hhi[jj]
            return jnp.concatenate([lo, hi], axis=1)       # [tm, C]

        br = branches(xr_c, xr_n).astype(dft_dtype)
        bi = branches(xi_c, xi_n).astype(dft_dtype)
        cos = cos_ref[:]
        sin = sin_ref[:]
        yr = (jnp.dot(br, cos, preferred_element_type=jnp.float32)
              + jnp.dot(bi, sin, preferred_element_type=jnp.float32))
        yi = (jnp.dot(bi, cos, preferred_element_type=jnp.float32)
              - jnp.dot(br, sin, preferred_element_type=jnp.float32))
        # WOLA hop rotation (-1)^{cm}: frame index m = j·tm + row
        row = jax.lax.broadcasted_iota(jnp.int32, (tm, n_chan), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tm, n_chan), 1)
        m = j * tm + row
        sign = jnp.where((m * col) % 2 == 1, -1.0, 1.0)
        yr_ref[:] = yr * sign
        yi_ref[:] = yi * sign

    return kernel


@functools.partial(jax.jit, static_argnames=("n_chan", "taps_per_branch",
                                             "tile_m", "interpret",
                                             "dft_bf16"))
def pfb_channelize_rows_pallas(re, im, n_chan: int, taps_per_branch: int = 16,
                               tile_m: int = 256,
                               interpret: bool | None = None,
                               dft_bf16: bool | None = None):
    """Planar wideband [T] -> channel frames in TIME-MAJOR layout
    ([M, C], [M, C]), M ≈ 2T/C — the kernel's natural output order.
    The downstream per-channel resampler consumes rows directly; only
    the final 36 kHz product gets transposed to [C, ·].

    dft_bf16 (default: on for compiled TPU, off in interpret mode) runs
    the analysis-DFT matmuls in bf16 with f32 accumulation: ~4x MXU
    rate for ~0.3% relative error on the channel samples — ~50 dB
    below the signal, versus the chain's ~10 dB decode floor.
    """
    assert re.ndim == 1, "wideband stream is 1-D; vmap for batches"
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if dft_bf16 is None:
        dft_bf16 = not interpret
    dft_dtype = jnp.bfloat16 if dft_bf16 else jnp.float32
    assert n_chan % 2 == 0
    hop = n_chan // 2
    J = taps_per_branch
    h = pfb_prototype(n_chan, taps_per_branch)
    # hlo[j, k] = h[j·C + k]; hhi[j, k] = h[j·C + hop + k]
    h2 = h.reshape(J, 2, hop)
    hlo = jnp.asarray(h2[:, 0])
    hhi = jnp.asarray(h2[:, 1])
    cosm, sinm = _dft_matrices(n_chan)

    x_r = jnp.asarray(re, jnp.float32)
    x_i = jnp.asarray(im, jnp.float32)
    T = x_r.shape[-1]
    nblk = T // hop
    M = max((T - n_chan * J) // hop + 1, 1)
    tm = min(tile_m, M)
    n_grid = -(-M // tm)
    # rows of hop-sized samples; pad so every view block exists
    rows_need = n_grid * tm + 2 * J
    u_r = jnp.pad(x_r[: nblk * hop].reshape(nblk, hop),
                  ((0, rows_need - nblk), (0, 0)))
    u_i = jnp.pad(x_i[: nblk * hop].reshape(nblk, hop),
                  ((0, rows_need - nblk), (0, 0)))
    nb_v = rows_need // tm  # view blocks (>= n_grid + 1 by construction)

    def view(off):
        def imap(j):
            return (jnp.clip(j + off, 0, nb_v - 1), 0)
        return pl.BlockSpec((tm, hop), imap, memory_space=pltpu.VMEM)

    kernel = _make_kernel(tm, hop, J, dft_dtype)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[view(0), view(1), view(0), view(1),
                  pl.BlockSpec((J, hop), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((J, hop), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_chan, n_chan), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((n_chan, n_chan), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((tm, n_chan), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tm, n_chan), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_grid * tm, n_chan), jnp.float32),
                   jax.ShapeDtypeStruct((n_grid * tm, n_chan), jnp.float32)],
        interpret=interpret,
    )(u_r, u_r, u_i, u_i, hlo, hhi,
      jnp.asarray(cosm).astype(dft_dtype), jnp.asarray(sinm).astype(dft_dtype))
    return yr[:M], yi[:M]


def pfb_channelize_ri_pallas(re, im, n_chan: int, taps_per_branch: int = 16,
                             tile_m: int = 256,
                             interpret: bool | None = None):
    """Drop-in for pfb.pfb_channelize_ri ([C, M] outputs), 1-D inputs."""
    yr, yi = pfb_channelize_rows_pallas(re, im, n_chan, taps_per_branch,
                                        tile_m, interpret)
    return yr.T, yi.T


@functools.lru_cache(maxsize=8)
def _resample_A(n_qblk: int, fs: float, out_rate: float, skew: float):
    """Dense banded resampling matrix for one kernel block: A maps
    3·tm2 input rows (prev|cur|next views) to ro = n_qblk·M output
    rows. Entries are EXACTLY channelizer._resample_block_plan's W
    (same 32-phase quantised bank), laid out block-Toeplitz:
    A[q·M + r, tm2 + q·L + bmin + w] = W[w, r]."""
    from tetra_tpu.phy.channelizer import _resample_block_plan
    W, bmin, width, L, M, _, _ = _resample_block_plan(1 << 20, fs, out_rate,
                                                      skew=skew)
    tm2 = n_qblk * L
    A = np.zeros((n_qblk * M, 3 * tm2), np.float32)
    for q in range(n_qblk):
        for r in range(M):
            A[q * M + r, tm2 + q * L + bmin: tm2 + q * L + bmin + width] = \
                W[:, r]
    return A, L, M, tm2


def _make_resample_kernel(tm2: int, ro: int, C: int, n_in: int, dt):
    def kernel(xr_p, xr_c, xr_n, xi_p, xi_c, xi_n, A_ref, or_ref, oi_ref):
        j = pl.program_id(0)
        A = A_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (3 * tm2, C), 0)
        g = (j - 1) * tm2 + row
        valid = jnp.logical_and(g >= 0, g < n_in)

        def one(p, c, n):
            win = jnp.concatenate([p[:], c[:], n[:]], axis=0)
            win = jnp.where(valid, win, 0.0).astype(dt)
            return jnp.dot(A, win, preferred_element_type=jnp.float32)

        or_ref[:] = one(xr_p, xr_c, xr_n)
        oi_ref[:] = one(xi_p, xi_c, xi_n)

    return kernel


@functools.partial(jax.jit, static_argnames=("fs", "out_rate", "skew",
                                             "n_qblk", "interpret", "bf16"))
def resample_rows_pallas(x_r, x_i, fs: float, out_rate: float,
                         skew: float = 0.0, n_qblk: int = 8,
                         interpret: bool | None = None,
                         bf16: bool | None = None):
    """Pallas twin of channelizer._resample_rows_ri for BOTH planes:
    time-major [M, C] -> ([n_out, C], [n_out, C]).

    One [ro, 3·tm2] x [3·tm2, C] MXU matmul per block against the
    static block-Toeplitz coefficient matrix — the XLA row gather +
    tiny-K einsum lowers to layout shuffles that run ~10x slower than
    this on v5e. Boundary rows use zero-fill instead of the XLA path's
    edge-replication: only outputs within the filter reach (~35 rows)
    of either end differ, all inside the stream-start demod margin.
    bf16 (default on compiled TPU) runs the matmul in bf16 with f32
    accumulation (~0.3% error, ~50 dB below signal).
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    if bf16 is None:
        bf16 = not interpret
    dt = jnp.bfloat16 if bf16 else jnp.float32
    n_in, C = x_r.shape
    from tetra_tpu.phy.channelizer import _resample_block_plan
    plan = _resample_block_plan(n_in, fs, out_rate, skew=skew)
    assert plan is not None, "pallas resampler requires a rational ratio"
    _, _, _, L, M, n_out, _ = plan
    A_np, L, M, tm2 = _resample_A(n_qblk, fs, out_rate, skew)
    ro = n_qblk * M
    n_grid = -(-n_out // ro)
    rows_need = (n_grid + 1) * tm2
    xp_r = jnp.pad(x_r, ((0, rows_need - n_in), (0, 0)))
    xp_i = jnp.pad(x_i, ((0, rows_need - n_in), (0, 0)))
    nb_v = rows_need // tm2

    def view(off):
        def imap(j):
            return (jnp.clip(j + off, 0, nb_v - 1), 0)
        return pl.BlockSpec((tm2, C), imap, memory_space=pltpu.VMEM)

    kernel = _make_resample_kernel(tm2, ro, C, n_in, dt)
    o_r, o_i = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[view(-1), view(0), view(1), view(-1), view(0), view(1),
                  pl.BlockSpec((ro, 3 * tm2), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=[pl.BlockSpec((ro, C), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((ro, C), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_grid * ro, C), jnp.float32),
                   jax.ShapeDtypeStruct((n_grid * ro, C), jnp.float32)],
        interpret=interpret,
    )(xp_r, xp_r, xp_r, xp_i, xp_i, xp_i, jnp.asarray(A_np).astype(dt))
    return o_r[:n_out], o_i[:n_out]

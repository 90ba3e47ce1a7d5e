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
           "resample_rows_pallas", "channel_lane_positions"]


def channel_lane_positions(n_chan: int) -> np.ndarray:
    """Lane position holding channel k in the kernel's un-unpermuted
    (return_perm=True) radix-4 output; identity when the dense DFT
    path is active."""
    k = np.arange(n_chan)
    if n_chan % 4 == 0 and n_chan // 4 >= 128:
        return (k % 4) * (n_chan // 4) + k // 4
    return k


def _make_kernel(tm: int, hop: int, J: int, dft_dtype, radix4: bool):
    n_chan = 2 * hop
    Q = n_chan // 4

    def kernel(xr_c, xr_n, xi_c, xi_n, hlo_ref, hhi_ref, cos_ref, sin_ref,
               *rest):
        tw_ref, yr_ref, yi_ref = ((None,) + rest if not radix4 else rest)
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

        br_f = branches(xr_c, xr_n)
        bi_f = branches(xi_c, xi_n)
        row = jax.lax.broadcasted_iota(jnp.int32, (tm, n_chan), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tm, n_chan), 1)
        m = j * tm + row

        if radix4:
            # radix-4 DIF: X[4q+r] = DFT_Q{ (Σ_a x[t+Qa]·W4^{ar}) ·
            # W_N^{tr} }[q] — the 4-group butterfly is exact f32 adds,
            # the twiddle an elementwise complex rotation, and the
            # per-r DFTs are K=Q matmuls: 4x fewer MXU MACs than the
            # dense [C, C] analysis DFT (Q >= 128 keeps the MXU's
            # contraction depth full). Output lanes hold channel
            # 4q + r at position r·Q + q; the wrapper unpermutes.
            CQ = cos_ref[:]                                # [Q, Q] dft_dtype
            SQ = sin_ref[:]
            tw = tw_ref[:]                                 # [8, Q] f32
            twc, tws = tw[:4], tw[4:]
            g = lambda b, a: b[:, a * Q:(a + 1) * Q]
            br0, br1, br2, br3 = (g(br_f, a) for a in range(4))
            bi0, bi1, bi2, bi3 = (g(bi_f, a) for a in range(4))
            s = [
                (br0 + br1 + br2 + br3, bi0 + bi1 + bi2 + bi3),
                (br0 + bi1 - br2 - bi3, bi0 - br1 - bi2 + br3),
                (br0 - br1 + br2 - br3, bi0 - bi1 + bi2 - bi3),
                (br0 - bi1 - br2 + bi3, bi0 + br1 - bi2 - br3),
            ]
            xs_r, xs_i = [], []
            for r in range(4):
                s_re, s_im = s[r]
                ct, st = twc[r], tws[r]                    # [Q] lanes
                u_re = (s_re * ct + s_im * st).astype(dft_dtype)
                u_im = (s_im * ct - s_re * st).astype(dft_dtype)
                xs_r.append(jnp.dot(u_re, CQ, preferred_element_type=jnp.float32)
                            + jnp.dot(u_im, SQ, preferred_element_type=jnp.float32))
                xs_i.append(jnp.dot(u_im, CQ, preferred_element_type=jnp.float32)
                            - jnp.dot(u_re, SQ, preferred_element_type=jnp.float32))
            yr = jnp.concatenate(xs_r, axis=1)             # [tm, C] permuted
            yi = jnp.concatenate(xs_i, axis=1)
            # channel parity of lane p = r·Q + q is parity of r = p // Q
            kpar = (col // Q) % 2
        else:
            br = br_f.astype(dft_dtype)
            bi = bi_f.astype(dft_dtype)
            cos = cos_ref[:]
            sin = sin_ref[:]
            yr = (jnp.dot(br, cos, preferred_element_type=jnp.float32)
                  + jnp.dot(bi, sin, preferred_element_type=jnp.float32))
            yi = (jnp.dot(bi, cos, preferred_element_type=jnp.float32)
                  - jnp.dot(br, sin, preferred_element_type=jnp.float32))
            kpar = col % 2
        # WOLA hop rotation (-1)^{cm}: frame index m = j·tm + row
        sign = jnp.where((m % 2) * kpar == 1, -1.0, 1.0)
        yr_ref[:] = yr * sign
        yi_ref[:] = yi * sign

    return kernel


@functools.partial(jax.jit, static_argnames=("n_chan", "taps_per_branch",
                                             "tile_m", "interpret",
                                             "dft_bf16", "return_perm"))
def pfb_channelize_rows_pallas(re, im, n_chan: int, taps_per_branch: int = 16,
                               tile_m: int = 256,
                               interpret: bool | None = None,
                               dft_bf16: bool | None = None,
                               return_perm: bool = False):
    """Planar wideband [T] -> channel frames in TIME-MAJOR layout
    ([M, C], [M, C]), M ≈ 2T/C — the kernel's natural output order.

    return_perm=True skips the in-place channel unpermute of the
    radix-4 path: lanes then hold channel k at position
    channel_lane_positions(n_chan)[k] — compose that into any
    downstream channel-indexed take instead (a [M, C] lane gather
    costs more than the radix-4 DFT split saves).
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

    # radix-4 DIF split of the analysis DFT when the quarter size still
    # fills the MXU's contraction depth (see _make_kernel); the kernel
    # then emits channel 4q+r at lane r·Q + q and is unpermuted here
    radix4 = n_chan % 4 == 0 and n_chan // 4 >= 128
    extra_in, extra_specs = [], []
    if radix4:
        Q = n_chan // 4
        t = np.arange(Q)
        cos_in = jnp.asarray(np.cos(2.0 * np.pi * np.outer(t, t) / Q)
                             .astype(np.float32)).astype(dft_dtype)
        sin_in = jnp.asarray(np.sin(2.0 * np.pi * np.outer(t, t) / Q)
                             .astype(np.float32)).astype(dft_dtype)
        tw = 2.0 * np.pi * np.outer(np.arange(4), t) / n_chan
        extra_in = [jnp.asarray(np.concatenate(
            [np.cos(tw), np.sin(tw)], 0).astype(np.float32))]
        extra_specs = [pl.BlockSpec((8, Q), lambda j: (0, 0),
                                    memory_space=pltpu.VMEM)]
        dft_rows = dft_cols = Q
    else:
        dft_rows = dft_cols = n_chan
        cos_in = jnp.asarray(cosm).astype(dft_dtype)
        sin_in = jnp.asarray(sinm).astype(dft_dtype)

    kernel = _make_kernel(tm, hop, J, dft_dtype, radix4)
    yr, yi = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[view(0), view(1), view(0), view(1),
                  pl.BlockSpec((J, hop), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((J, hop), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dft_rows, dft_cols), lambda j: (0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((dft_rows, dft_cols), lambda j: (0, 0),
                               memory_space=pltpu.VMEM)] + extra_specs,
        out_specs=[pl.BlockSpec((tm, n_chan), lambda j: (j, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tm, n_chan), lambda j: (j, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct((n_grid * tm, n_chan), jnp.float32),
                   jax.ShapeDtypeStruct((n_grid * tm, n_chan), jnp.float32)],
        interpret=interpret,
    )(u_r, u_r, u_i, u_i, hlo, hhi, cos_in, sin_in, *extra_in)
    if radix4 and not return_perm:
        perm = jnp.asarray(channel_lane_positions(n_chan), jnp.int32)
        yr = jnp.take(yr, perm, axis=1)
        yi = jnp.take(yi, perm, axis=1)
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
    # live band of the block-Toeplitz matrix: outputs only reach a few
    # rows into the prev/next views (|bmin|, width-L tails), so trim
    # the matmul to it — the dense [ro, 3·tm2] form pays ~3x the FLOPs
    # multiplying guaranteed zeros. Round to 8-row sublane tiles.
    c0 = (tm2 + min(0, bmin)) // 8 * 8
    c1 = -(-(tm2 + (n_qblk - 1) * L + bmin + width) // 8) * 8
    return A[:, c0:c1], L, M, tm2, c0, c1


def _make_resample_kernel(tm2: int, ro: int, C: int, n_in: int, dt,
                          c0: int, c1: int):
    def kernel(xr_p, xr_c, xr_n, xi_p, xi_c, xi_n, A_ref, or_ref, oi_ref):
        j = pl.program_id(0)
        A = A_ref[:]
        row = jax.lax.broadcasted_iota(jnp.int32, (c1 - c0, C), 0)
        g = (j - 1) * tm2 + c0 + row
        valid = jnp.logical_and(g >= 0, g < n_in)

        def one(p, c, n):
            # only the trimmed live band [c0, c1) of the prev|cur|next
            # window participates in the matmul (see _resample_A)
            win = jnp.concatenate([p[:], c[:], n[:]], axis=0)[c0:c1]
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
    A_np, L, M, tm2, c0, c1 = _resample_A(n_qblk, fs, out_rate, skew)
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

    kernel = _make_resample_kernel(tm2, ro, C, n_in, dt, c0, c1)
    o_r, o_i = pl.pallas_call(
        kernel,
        grid=(n_grid,),
        in_specs=[view(-1), view(0), view(1), view(-1), view(0), view(1),
                  pl.BlockSpec((ro, c1 - c0), lambda j: (0, 0),
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

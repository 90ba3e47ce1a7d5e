"""Fused Pallas TPU kernel for the 16-state Viterbi decoder.

Equivalent to tetra_tpu.ops.viterbi.decode (same trellis, same soft
semantics) but fused into one kernel: branch metrics, ACS forward pass
and traceback all run in VMEM with the batch tiled over the grid, so
per-block decisions never round-trip to HBM.

Layout: states live in the lane dimension (16 lanes of 128), batch in
sublanes. Decisions for all T steps are kept in a VMEM scratch
[T, TILE_B, 16]; traceback walks it backwards with a fori_loop using
one-hot state selection — gathers are avoided, everything is dense
masked arithmetic/matmuls, which is what the VPU/MXU want.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetra_tpu.constants import CONV_GENERATORS_CCH
from tetra_tpu.ops.viterbi import trellis_signs, _P0, _P1, _BIT

__all__ = ["decode_pallas"]

_NEG = np.float32(-1e9)


@functools.lru_cache(maxsize=4)
def _tables(generators):
    """Constant matrices driving ACS + traceback, packed as one array.

    rows 0..3:   s0^T, s1^T padded to [16, N] -> stored [2, 16, N]
    plus 16x16 selection/propagation matrices g0, g1, tb0, tb1.
    Returned as (signs [2,16,N], sel [4,16,16], state_bits [16]).
    """
    signs = trellis_signs(generators)  # [16, 2, N]
    n = signs.shape[-1]
    s0 = np.stack([signs[_P0[ns], _BIT[ns]] for ns in range(16)])  # [16, N]
    s1 = np.stack([signs[_P1[ns], _BIT[ns]] for ns in range(16)])
    g0 = np.zeros((16, 16), np.float32)
    g1 = np.zeros((16, 16), np.float32)
    tb0 = np.zeros((16, 16), np.float32)
    tb1 = np.zeros((16, 16), np.float32)
    for ns in range(16):
        g0[_P0[ns], ns] = 1.0
        g1[_P1[ns], ns] = 1.0
        tb0[ns, _P0[ns]] = 1.0
        tb1[ns, _P1[ns]] = 1.0
    sgn = np.stack([s0, s1]).astype(np.float32)            # [2, 16, N]
    sel = np.stack([g0, g1, tb0, tb1]).astype(np.float32)  # [4, 16, 16]
    sbits = (np.arange(16) & 1).astype(np.float32)
    return sgn, sel, sbits


def _make_kernel(n_sym: int, n_out: int, tile_b: int):
    # soft_ref is time-major [n_sym, tile, N] and bits_ref [n_sym, tile]:
    # all dynamic time indexing happens on the leading (untiled) dim,
    # which Mosaic supports without lane-alignment constraints.
    def kernel(soft_ref, sgn_ref, sel_ref, sbits_ref, bits_ref,
               dec_ref, metric_ref):
        s0c = sgn_ref[0]           # [16, N]
        s1c = sgn_ref[1]
        g0c = sel_ref[0]           # [16, 16]
        g1c = sel_ref[1]
        tb0c = sel_ref[2]
        tb1c = sel_ref[3]

        col = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 16), 1)
        metric_ref[:] = jnp.where(col == 0, 0.0, _NEG)

        def acs_step(t, _):
            sym = soft_ref[pl.ds(t, 1)][0]                      # [B, N]
            bm0 = jnp.dot(sym, s0c.T, preferred_element_type=jnp.float32)
            bm1 = jnp.dot(sym, s1c.T, preferred_element_type=jnp.float32)
            m = metric_ref[:]
            c0 = jnp.dot(m, g0c, preferred_element_type=jnp.float32) + bm0
            c1 = jnp.dot(m, g1c, preferred_element_type=jnp.float32) + bm1
            dec = c1 > c0
            dec_ref[pl.ds(t, 1), :, :] = dec[None]
            metric_ref[:] = jnp.where(dec, c1, c0)
            return 0

        jax.lax.fori_loop(0, n_sym, acs_step, 0)

        # traceback: one-hot state vector, walked backwards
        m = metric_ref[:]
        best = jnp.max(m, axis=1, keepdims=True)
        onehot0 = (m == best)
        # break ties toward the lowest state index like argmax
        rank = jax.lax.broadcasted_iota(jnp.int32, (tile_b, 16), 1)
        min_rank = jnp.min(jnp.where(onehot0, rank, 16), axis=1, keepdims=True)
        onehot = (rank == min_rank).astype(jnp.float32)          # [B, 16]

        def tb_step(i, onehot):
            t = n_sym - 1 - i
            bit = jnp.dot(onehot, sbits_ref[0],
                          preferred_element_type=jnp.float32)    # [B]
            bits_ref[pl.ds(t, 1), :, :] = bit.astype(jnp.int8)[None, None, :]
            took = dec_ref[pl.ds(t, 1), :, :][0].astype(jnp.float32)  # [B, 16]
            sel1 = onehot * took
            sel0 = onehot * (1.0 - took)
            prev = (jnp.dot(sel0, tb0c, preferred_element_type=jnp.float32)
                    + jnp.dot(sel1, tb1c, preferred_element_type=jnp.float32))
            return prev

        jax.lax.fori_loop(0, n_sym, tb_step, onehot)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_sym", "generators", "tile_b", "interpret"))
def decode_pallas(soft, n_sym: int, generators=CONV_GENERATORS_CCH,
                  tile_b: int = 256, interpret: bool = False):
    """Decode soft mother bits [B, >= n_sym*N] -> hard bits [B, n_sym].

    Drop-in replacement for viterbi.decode on 2-D batches.
    """
    generators = tuple(map(tuple, generators))
    n_out = len(generators)
    B = soft.shape[0]
    soft = soft[:, : n_sym * n_out].astype(jnp.float32)
    tile = min(tile_b, B)
    pad = (-B) % tile
    if pad:
        soft = jnp.pad(soft, ((0, pad), (0, 0)))
    Bp = soft.shape[0]
    # time-major layout for leading-dim dynamic indexing in the kernel
    soft_tm = jnp.transpose(soft.reshape(Bp, n_sym, n_out), (1, 0, 2))

    sgn, sel, sbits = _tables(generators)
    kernel = _make_kernel(n_sym, n_out, tile)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((n_sym, tile, n_out), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, 16, n_out), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, 16, 16), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_sym, 1, tile), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_sym, 1, Bp), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((n_sym, tile, 16), jnp.bool_),
            pltpu.VMEM((tile, 16), jnp.float32),
        ],
        interpret=interpret,
    )(soft_tm, jnp.asarray(sgn), jnp.asarray(sel), jnp.asarray(sbits)[None, :])
    return out[:, 0, :].T[:B]

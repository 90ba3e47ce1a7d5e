"""Fused Pallas TPU kernel for the 16-state Viterbi decoder.

Equivalent to tetra_tpu.ops.viterbi.decode (same trellis, same soft
semantics) but fused into one kernel: branch metrics, ACS forward pass
and traceback all run in VMEM with the batch tiled over the grid, so
per-block decisions never round-trip to HBM.

Layout: states live in the lane dimension (16 of 128 lanes), batch in
sublanes. Decisions for all T steps are kept in a VMEM scratch
[T, TILE_B, 16]; traceback walks it backwards with a fori_loop using
one-hot state selection (gathers are avoided — everything is dense
masked arithmetic, which is what the VPU wants).
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


def _make_kernel(n_sym: int, n_out: int, tile_b: int, generators):
    signs = trellis_signs(tuple(map(tuple, generators)))  # [16, 2, N]
    # per next-state branch sign row: sign for transition into state ns
    # from predecessor p (p0 or p1) with input bit ns&1
    s0 = np.stack([signs[_P0[ns], _BIT[ns]] for ns in range(16)])  # [16, N]
    s1 = np.stack([signs[_P1[ns], _BIT[ns]] for ns in range(16)])  # [16, N]

    # selection matrices: metric_prev[p0[ns]] = metric_prev @ G0 (one-hot cols)
    g0 = np.zeros((16, 16), np.float32)
    g1 = np.zeros((16, 16), np.float32)
    for ns in range(16):
        g0[_P0[ns], ns] = 1.0
        g1[_P1[ns], ns] = 1.0

    def kernel(soft_ref, bits_ref, dec_ref, metric_ref):
        # soft_ref: [TILE_B, n_sym * n_out]; bits_ref: [TILE_B, n_sym]
        g0c = jnp.asarray(g0)
        g1c = jnp.asarray(g1)
        s0c = jnp.asarray(s0)  # [16, N]
        s1c = jnp.asarray(s1)

        metric_ref[:] = jnp.full((tile_b, 16), _NEG, jnp.float32).at[:, 0].set(0.0)

        def acs_step(t, _):
            sym = soft_ref[:, pl.ds(t * n_out, n_out)]          # [B, N]
            bm0 = jnp.dot(sym, s0c.T, preferred_element_type=jnp.float32)
            bm1 = jnp.dot(sym, s1c.T, preferred_element_type=jnp.float32)
            m = metric_ref[:]
            c0 = jnp.dot(m, g0c, preferred_element_type=jnp.float32) + bm0
            c1 = jnp.dot(m, g1c, preferred_element_type=jnp.float32) + bm1
            dec = c1 > c0
            dec_ref[t, :, :] = dec
            metric_ref[:] = jnp.where(dec, c1, c0)
            return 0

        jax.lax.fori_loop(0, n_sym, acs_step, 0)

        # traceback: one-hot state vector, walked backwards
        m = metric_ref[:]
        best = jnp.max(m, axis=1, keepdims=True)
        onehot0 = (m == best)
        # break ties toward the lowest state index like argmax
        cum = jnp.cumsum(onehot0.astype(jnp.int32), axis=1)
        onehot = onehot0 & (cum == 1)                            # [B, 16]

        state_bits = jnp.asarray(
            (np.arange(16) & 1).astype(np.float32))              # [16]
        # prev-state propagation matrices: prev = (s>>1) | took_p1*8
        tb0 = np.zeros((16, 16), np.float32)
        tb1 = np.zeros((16, 16), np.float32)
        for ns in range(16):
            tb0[ns, _P0[ns]] = 1.0
            tb1[ns, _P1[ns]] = 1.0
        tb0c = jnp.asarray(tb0)
        tb1c = jnp.asarray(tb1)

        def tb_step(i, onehot):
            t = n_sym - 1 - i
            bit = jnp.dot(onehot.astype(jnp.float32), state_bits,
                          preferred_element_type=jnp.float32)    # [B]
            bits_ref[:, t] = bit.astype(jnp.int8)
            took = dec_ref[t, :, :]                              # [B, 16]
            sel1 = onehot & took
            sel0 = onehot & jnp.logical_not(took)
            prev = (jnp.dot(sel0.astype(jnp.float32), tb0c,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(sel1.astype(jnp.float32), tb1c,
                              preferred_element_type=jnp.float32))
            return prev > 0.5

        jax.lax.fori_loop(0, n_sym, tb_step, onehot)

    return kernel


@functools.partial(jax.jit, static_argnames=("n_sym", "generators", "tile_b", "interpret"))
def decode_pallas(soft, n_sym: int, generators=CONV_GENERATORS_CCH,
                  tile_b: int = 256, interpret: bool = False):
    """Decode soft mother bits [B, >= n_sym*N] -> hard bits [B, n_sym].

    Drop-in replacement for viterbi.decode on 2-D batches.
    """
    n_out = len(generators)
    B = soft.shape[0]
    soft = soft[:, : n_sym * n_out].astype(jnp.float32)
    tile = min(tile_b, B)
    pad = (-B) % tile
    if pad:
        soft = jnp.pad(soft, ((0, pad), (0, 0)))
    Bp = soft.shape[0]

    kernel = _make_kernel(n_sym, n_out, tile, generators)
    out = pl.pallas_call(
        kernel,
        grid=(Bp // tile,),
        in_specs=[pl.BlockSpec((tile, n_sym * n_out), lambda i: (i, 0),
                               memory_space=pltpu.ANY
                               if False else pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, n_sym), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Bp, n_sym), jnp.int8),
        scratch_shapes=[
            pltpu.VMEM((n_sym, tile, 16), jnp.bool_),
            pltpu.VMEM((tile, 16), jnp.float32),
        ],
        interpret=interpret,
    )(soft)
    return out[:B]

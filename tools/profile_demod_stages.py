"""Stage bisect for the Pallas demod: frames gather / kernel / post."""
import json
import sys
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tetra_tpu.phy import dqpsk
from tetra_tpu.phy import demod_pallas as dp

REPS = 7


def med(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def diff_rate(make_step, data_small, data_big, n_small, n_big):
    t_s = med(lambda: make_step(*data_small))
    t_b = med(lambda: make_step(*data_big))
    return (n_big - n_small) / (t_b - t_s)


def main():
    tile_t, tile_c = 512, 256
    rng = np.random.default_rng(0)
    n_sym = 64 * 255 + 64
    bits = rng.integers(0, 2, size=2 * n_sym).astype(np.uint8)
    iq = dqpsk.modulate(bits[None], sps=2)[0]
    C_SMALL, C_BIG = 512, 4096
    T = iq.shape[-1]
    sps = 2
    taps = dqpsk.rrc_taps(sps)
    K = len(taps)
    tb = tile_t
    W = tb + sps + K - 1
    n_blk = -(-T // tb)

    def mkdata(CC):
        tiled = np.tile(iq, (CC, 1))
        re = jnp.asarray(np.real(tiled).astype(np.float32))
        im = jnp.asarray(np.imag(tiled).astype(np.float32))
        return re, im

    data = {CC: mkdata(CC) for CC in (C_SMALL, C_BIG)}

    pad_l = K // 2

    @jax.jit
    def stage_frames(re, im):
        def frames(x):
            xp = jnp.pad(x, ((0, 0), (pad_l + sps, n_blk * tb - T + K - 1 - pad_l)))
            idx = (jnp.arange(n_blk) * tb)[:, None] + jnp.arange(W)[None, :]
            return jnp.swapaxes(xp[:, idx], 0, 1)
        fre, fim = frames(re), frames(im)
        return fre.sum() + fim.sum()

    @jax.jit
    def stage_full(re, im):
        return dp.demodulate_hard_ri_pallas(re, im, tile_c=tile_c,
                                            tile_t=tile_t).astype(jnp.int32).sum()

    # kernel-only: pre-built frames resident on device
    kernel = dp._make_kernel(tile_c, tb, sps)
    band = jnp.asarray(dp._band(W, tb + sps, tuple(np.asarray(taps).tolist())))

    def mkframes(CC):
        re, im = data[CC]
        def frames(x):
            xp = jnp.pad(x, ((0, 0), (pad_l + sps, n_blk * tb - T + K - 1 - pad_l)))
            idx = (jnp.arange(n_blk) * tb)[:, None] + jnp.arange(W)[None, :]
            return jnp.swapaxes(xp[:, idx], 0, 1)
        return jax.block_until_ready(frames(re)), jax.block_until_ready(frames(im))

    frames_d = {CC: mkframes(CC) for CC in (C_SMALL, C_BIG)}

    @jax.jit
    def stage_kernel(fre, fim):
        Cp = fre.shape[1]
        b0, b1, met = pl.pallas_call(
            kernel,
            grid=(Cp // tile_c, n_blk),
            in_specs=[
                pl.BlockSpec((1, tile_c, W), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_c, W), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((W, tb + sps), lambda i, j: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_c, tb), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_c, tb), lambda i, j: (j, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_c, sps), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_blk, Cp, tb), jnp.int8),
                jax.ShapeDtypeStruct((n_blk, Cp, tb), jnp.int8),
                jax.ShapeDtypeStruct((Cp, sps), jnp.float32),
            ],
        )(fre, fim, band)
        return b0.astype(jnp.int32).sum() + b1.astype(jnp.int32).sum() + met.sum()

    d_samp = (C_BIG - C_SMALL) * T
    out = {}
    out["frames_gs"] = round(diff_rate(
        lambda re, im: float(stage_frames(re, im)),
        data[C_SMALL], data[C_BIG], C_SMALL * T, C_BIG * T) / 1e9, 2)
    out["kernel_gs"] = round(diff_rate(
        lambda fre, fim: float(stage_kernel(fre, fim)),
        frames_d[C_SMALL], frames_d[C_BIG], C_SMALL * T, C_BIG * T) / 1e9, 2)
    out["full_gs"] = round(diff_rate(
        lambda re, im: int(stage_full(re, im)),
        data[C_SMALL], data[C_BIG], C_SMALL * T, C_BIG * T) / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

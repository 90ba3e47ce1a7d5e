"""Stage profile of the fused PFB route: kernel / +rowresample / +T / full."""
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from tetra_tpu.phy.pfb_pallas import (pfb_channelize_rows_pallas,
                                      channel_lane_positions)
from tetra_tpu.phy.channelizer import _resample_rows_ri

REPS = 7
N_CHAN = 512
FS = N_CHAN * 25_000.0
CHAN_RATE = 2.0 * FS / N_CHAN
SKEW = -(N_CHAN * 16 - 1) / (2.0 * (N_CHAN // 2))


def med(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    rng = np.random.default_rng(0)

    @jax.jit
    def s_kernel(wre, wim):
        yr, yi = pfb_channelize_rows_pallas(wre, wim, N_CHAN,
                                    return_perm=True)
        return yr.sum() + yi.sum()

    @jax.jit
    def s_resamp(wre, wim):
        yr, yi = pfb_channelize_rows_pallas(wre, wim, N_CHAN,
                                    return_perm=True)
        m = yr.shape[0]
        a = _resample_rows_ri(yr, m, CHAN_RATE, 36000.0, skew=SKEW)
        b = _resample_rows_ri(yi, m, CHAN_RATE, 36000.0, skew=SKEW)
        return a.sum() + b.sum()

    @jax.jit
    def s_full(wre, wim):
        yr, yi = pfb_channelize_rows_pallas(wre, wim, N_CHAN,
                                    return_perm=True)
        m = yr.shape[0]
        pos = jnp.asarray(channel_lane_positions(N_CHAN), jnp.int32)
        a = _resample_rows_ri(yr, m, CHAN_RATE, 36000.0, skew=SKEW).T
        b = _resample_rows_ri(yi, m, CHAN_RATE, 36000.0, skew=SKEW).T
        a = jnp.take(a, pos, axis=0)
        b = jnp.take(b, pos, axis=0)
        return a.sum() + b.sum()

    fns = {"kernel": s_kernel, "resamp": s_resamp, "full": s_full}
    ts = {k: {} for k in fns}
    for T in (2 << 20, 16 << 20):
        wre = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        wim = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        for k, fn in fns.items():
            ts[k][T] = med(lambda fn=fn, wre=wre, wim=wim: float(fn(wre, wim)))
        del wre, wim
    d = (16 << 20) - (2 << 20)
    out = {k + "_gs": round(d / (v[16 << 20] - v[2 << 20]) / 1e9, 2)
           for k, v in ts.items()}
    print(json.dumps(out))


if __name__ == "__main__":
    main()

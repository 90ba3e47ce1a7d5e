"""Piecewise profile of pfb_to_demod_rate_ri: chan / +take / +transpose / full."""
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from tetra_tpu.phy import pfb as pfb_mod
from tetra_tpu.phy.channelizer import _resample_ri_one

REPS = 7
N_CHAN = 512
FS = N_CHAN * 25_000.0


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
    idx = jnp.arange(N_CHAN, dtype=jnp.int32)
    hop = N_CHAN // 2
    skew = -(N_CHAN * 16 - 1) / (2.0 * hop)
    chan_rate = 2.0 * FS / N_CHAN

    @jax.jit
    def s_chan(wre, wim):
        cr, ci = pfb_mod.pfb_channelize_ri(wre, wim, N_CHAN)
        return cr.sum() + ci.sum()

    @jax.jit
    def s_resamp_only(cr, ci):
        m = cr.shape[-1]
        a = _resample_ri_one(cr, m, chan_rate, 36000.0, skew=skew)
        b = _resample_ri_one(ci, m, chan_rate, 36000.0, skew=skew)
        return a.sum() + b.sum()

    @jax.jit
    def s_full(wre, wim):
        a, b = pfb_mod.pfb_to_demod_rate_ri(wre, wim, idx, N_CHAN, FS)
        return a.sum() + b.sum()

    out = {}
    ts = {k: {} for k in ("chan", "resamp", "full")}
    for T in (2 << 20, 16 << 20):
        wre = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        wim = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
        cr, ci = jax.jit(lambda a, b: pfb_mod.pfb_channelize_ri(a, b, N_CHAN))(wre, wim)
        cr = jax.block_until_ready(cr); ci = jax.block_until_ready(ci)
        ts["chan"][T] = med(lambda: float(s_chan(wre, wim)))
        ts["resamp"][T] = med(lambda cr=cr, ci=ci: float(s_resamp_only(cr, ci)))
        ts["full"][T] = med(lambda: float(s_full(wre, wim)))
    d = (16 << 20) - (2 << 20)
    for k, v in ts.items():
        out[k + "_gs_in"] = round(d / (v[16 << 20] - v[2 << 20]) / 1e9, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""PFB-only microbench: channelize+resample throughput (wideband rate)."""
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from tetra_tpu.phy import pfb as pfb_mod

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

    @jax.jit
    def step(wre, wim):
        cr, ci = pfb_mod.pfb_to_demod_rate_ri(wre, wim, idx, N_CHAN, FS)
        return cr.sum() + ci.sum()

    @jax.jit
    def step_chan_only(wre, wim):
        cr, ci = pfb_mod.pfb_channelize_ri(wre, wim, N_CHAN)
        return cr.sum() + ci.sum()

    sizes = {}
    for name, fn in (("full", step), ("chan", step_chan_only)):
        ts = {}
        for T in (2 << 20, 16 << 20):
            wre = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
            wim = jnp.asarray(rng.normal(0, 1, T).astype(np.float32))
            ts[T] = med(lambda wre=wre, wim=wim: float(fn(wre, wim)))
        gs = ((16 << 20) - (2 << 20)) / (ts[16 << 20] - ts[2 << 20]) / 1e9
        sizes[name] = round(gs, 2)
    print(json.dumps({"pfb_full_gs": sizes["full"],
                      "pfb_chan_gs": sizes["chan"]}))


if __name__ == "__main__":
    main()

"""TPU check + microbench: Pallas fused demod vs the XLA demod.

Differential timing between two carrier counts (cancels the ~25-30 ms
tunnel overhead per dispatch). Also reports decision agreement on a
clean modulated signal (bf16 MXU rounding differs between the two
matmul blockings; disagreements must be ~0 on clean signals).
"""
import json
import sys
import time

import numpy as np

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from tetra_tpu.phy import dqpsk
from tetra_tpu.phy.demod_pallas import demodulate_hard_ri_pallas

REPS = 7


def med(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    tile_t = int(sys.argv[1]) if len(sys.argv) > 1 else 512
    tile_c = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    rng = np.random.default_rng(0)
    n_sym = 64 * 255 + 64            # ~bench stage-3 shape
    bits = rng.integers(0, 2, size=2 * n_sym).astype(np.uint8)
    iq = dqpsk.modulate(bits[None], sps=2)[0]
    C_SMALL, C_BIG = 512, 4096

    @jax.jit
    def step_xla(re, im):
        return dqpsk.demodulate_hard_ri(re, im).astype(jnp.int32).sum()

    @jax.jit
    def step_pal(re, im):
        return demodulate_hard_ri_pallas(
            re, im, tile_c=tile_c, tile_t=tile_t).astype(jnp.int32).sum()

    data = {}
    for CC in (C_SMALL, C_BIG):
        tiled = np.tile(iq, (CC, 1))
        re = jnp.asarray(np.real(tiled).astype(np.float32))
        im = jnp.asarray(np.imag(tiled).astype(np.float32))
        data[CC] = (re, im)

    # agreement on the big batch
    re, im = data[C_BIG]
    a = np.asarray(dqpsk.demodulate_hard_ri(re, im))
    b = np.asarray(demodulate_hard_ri_pallas(re, im, tile_c=tile_c,
                                             tile_t=tile_t))
    mismatch = float(np.mean(a != b))

    t_x = {CC: med(lambda re=data[CC][0], im=data[CC][1]: int(step_xla(re, im)))
           for CC in (C_SMALL, C_BIG)}
    t_p = {CC: med(lambda re=data[CC][0], im=data[CC][1]: int(step_pal(re, im)))
           for CC in (C_SMALL, C_BIG)}
    d_samp = (C_BIG - C_SMALL) * iq.shape[-1]
    gs_x = d_samp / (t_x[C_BIG] - t_x[C_SMALL]) / 1e9
    gs_p = d_samp / (t_p[C_BIG] - t_p[C_SMALL]) / 1e9
    print(json.dumps({"tile_t": tile_t, "tile_c": tile_c,
                      "mismatch_frac": mismatch,
                      "xla_gsamples_per_s": round(gs_x, 2),
                      "pallas_gsamples_per_s": round(gs_p, 2),
                      "speedup": round(gs_p / gs_x, 2)}))


if __name__ == "__main__":
    main()

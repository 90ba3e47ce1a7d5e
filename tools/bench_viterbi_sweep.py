"""Viterbi kernel sweep: tile sizes / dtypes on real hardware.

Measures decode_segmented_pallas (the fused path's kernel) in isolation
at the bench batch size, differentially between two batch sizes to
cancel dispatch overhead. Prints one JSON line per config.

Usage: python tools/bench_viterbi_sweep.py [tiles...]
"""
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
import jax.numpy as jnp

from tetra_tpu.lmac.fused import N_SYM, BOUNDARIES
from tetra_tpu.ops.viterbi_pallas import decode_segmented_pallas

REPS = 7


def median_time(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    tiles = [int(t) for t in sys.argv[1:]] or [1024, 2048, 4096]
    rng = np.random.default_rng(0)
    B_SMALL, B_BIG = 16384, 65536
    n_in = N_SYM * 4

    configs = ([("int8", t, g) for t in tiles for g in (1, 2, 4)]
               + [("float32", t, 1) for t in tiles])
    for dtype, tile, group in configs:
        soft_big = rng.choice(np.asarray([-127, 0, 127]), (B_BIG, n_in))
        soft_big = soft_big.astype("int8" if dtype == "int8" else dtype)
        if dtype == "int8":
            soft_big = (soft_big // 127).astype(np.int8)  # {0,±1} alphabet
        rm = np.zeros((B_BIG, len(BOUNDARIES)), np.float32)
        rm[::3, 0] = 1.0
        try:
            f = jax.jit(lambda s, r, t=tile, g=group: decode_segmented_pallas(
                s, r, N_SYM, BOUNDARIES, tile_b=t, group=g).sum())
            times = {}
            for B in (B_SMALL, B_BIG):
                sd = jnp.asarray(soft_big[:B])
                rd = jnp.asarray(rm[:B])
                int(f(sd, rd))
                times[B] = median_time(lambda: int(f(sd, rd)))
            rate = (B_BIG - B_SMALL) / (times[B_BIG] - times[B_SMALL])
            print(json.dumps({"dtype": dtype, "tile": tile, "group": group,
                              "slots_per_s": round(rate, 1),
                              "t_small": round(times[B_SMALL], 4),
                              "t_big": round(times[B_BIG], 4)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"dtype": dtype, "tile": tile, "group": group,
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()

"""Micro-benchmarks for kernel tuning (run on the real TPU).

Usage: python benchmarks/micro.py [stage ...]
Stages: fec (decode_schf_burst), mixed (locked_step_bits all kinds),
fused (locked_step_fused), viterbi (raw kernel).
Differential two-batch-size timing like bench.py.
"""
from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, reps=7):
    v = fn(*args)
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        v = fn(*args)
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples)), v


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    import jax.numpy as jnp
    from tetra_tpu.lmac import pipeline, steady
    from tetra_tpu import tx
    from tetra_tpu.ops.scramble import scramb_get_init

    stages = sys.argv[1:] or ["fec", "mixed", "fused", "viterbi"]
    init = scramb_get_init(262, 42, 1)
    rng = np.random.default_rng(0)
    print("device:", jax.devices()[0])

    B_SMALL, B_BIG = 16384, 65536
    slots_small = rng.integers(0, 2, (B_SMALL, 510)).astype(np.int8)
    slots_big = rng.integers(0, 2, (B_BIG, 510)).astype(np.int8)
    kinds_small = rng.integers(0, 3, B_SMALL).astype(np.int32)
    kinds_big = rng.integers(0, 3, B_BIG).astype(np.int32)

    def rate(name, fn_factory):
        ts = {}
        for B, sl, kd in ((B_SMALL, slots_small, kinds_small),
                          (B_BIG, slots_big, kinds_big)):
            f = fn_factory(B, jnp.asarray(sl), jnp.asarray(kd))
            ts[B], _ = timed(f)
        slots_per_s = (B_BIG - B_SMALL) / (ts[B_BIG] - ts[B_SMALL])
        print(f"{name}: {slots_per_s/1e6:.3f} M slots/s "
              f"({slots_per_s/70.588:.0f} rt carriers)  "
              f"t16k={ts[B_SMALL]*1e3:.1f}ms t64k={ts[B_BIG]*1e3:.1f}ms")
        return slots_per_s

    if "fec" in stages:
        def make(B, sl, kd):
            ii = jnp.full(B, init, jnp.uint32)
            @jax.jit
            def f(sl, ii):
                r = pipeline.decode_schf_burst(sl, ii)
                return r["SCH_F"].crc_ok.astype(jnp.int32).sum()
            return lambda: int(f(sl, ii))
        rate("fec_schf", make)

    if "mixed" in stages:
        def make(B, sl, kd):
            ii = jnp.full(B, init, jnp.uint32)
            @jax.jit
            def f(sl, ii):
                r = steady.locked_step_bits(sl[None], ii[None, :1])
                return r["crc_ok"].astype(jnp.int32).sum()
            return lambda: int(f(sl, ii))
        rate("mixed_all3", make)

    if "fused" in stages:
        def make(B, sl, kd):
            ii = jnp.full(B, init, jnp.uint32)
            from tetra_tpu.lmac.fused import decode_slots_fused
            @jax.jit
            def f(sl, ii, kd):
                r = decode_slots_fused(sl, ii, kd)
                return r["crc_ok"].astype(jnp.int32).sum()
            return lambda: int(f(sl, ii, kd))
        rate("fused_mixed", make)

    if "viterbi" in stages:
        from tetra_tpu.ops.viterbi_pallas import decode_pallas
        soft_small = jnp.asarray(
            (rng.integers(-1, 2, (B_SMALL, 1152)) * 127).astype(np.float32))
        soft_big = jnp.asarray(
            (rng.integers(-1, 2, (B_BIG, 1152)) * 127).astype(np.float32))

        def make(B, sl, kd):
            soft = soft_small if B == B_SMALL else soft_big
            @jax.jit
            def f(soft):
                return decode_pallas(soft, 288).astype(jnp.int32).sum()
            return lambda: int(f(soft))
        rate("viterbi288_pallas", make)


if __name__ == "__main__":
    main()

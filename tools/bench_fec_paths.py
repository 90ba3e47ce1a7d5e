"""FEC path comparison on real hardware: the per-kind pipeline
(one-hot matmul assembly + radix-16 Viterbi) vs the kind-compacted
fused path (s8 assembly), plus kernel-only numbers with a large
differential for signal. One JSON line per config.
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

from tetra_tpu.lmac import pipeline, fused
from tetra_tpu import tx, testpdu
from tetra_tpu.ops.scramble import scramb_get_init
from tetra_tpu.ops.viterbi_pallas import decode_segmented_pallas

REPS = 9
B_SMALL, B_BIG = 16384, 131072
INIT = scramb_get_init(262, 42, 1)


def median_time(fn):
    fn()
    ts = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def rate_of(step, mk_args):
    times = {}
    for B in (B_SMALL, B_BIG):
        args = mk_args(B)
        int(step(*args))
        times[B] = median_time(lambda: int(step(*args)))
    return ((B_BIG - B_SMALL) / (times[B_BIG] - times[B_SMALL]),
            times[B_SMALL], times[B_BIG])


def main():
    rng = np.random.default_rng(0)
    n_uniq = 64
    cpu = jax.devices("cpu")[0]
    schf = rng.integers(0, 2, size=(n_uniq, 268)).astype(np.int8)
    aach = rng.integers(0, 2, size=(n_uniq, 14)).astype(np.int8)
    with jax.default_device(cpu):
        t5 = np.asarray(tx.encode_block("SCH_F", jnp.asarray(schf),
                                        jnp.uint32(INIT)))
        bb = np.asarray(tx.encode_bbk(jnp.asarray(aach), jnp.uint32(INIT)))
    from tetra_tpu.phy.burst import build_norm_c_d_burst
    uniq = np.stack([build_norm_c_d_burst(t5[i, :216], bb[i], t5[i, 216:],
                                          False) for i in range(n_uniq)])
    bursts_big = np.tile(uniq, (B_BIG // n_uniq, 1)).astype(np.int8)

    # (a) per-kind pipeline (the current bench stage-2 path)
    @jax.jit
    def fec_pipeline(b, i):
        res = pipeline.decode_schf_burst(b, i)
        return res["SCH_F"].crc_ok.astype(jnp.int32).sum()

    # (b) kind-compacted fused path on the same bursts (all kind=1)
    @jax.jit
    def fec_fused(b, i, k):
        out = fused.decode_slots_fused(b, i, k)
        return out["schf"].crc_ok.astype(jnp.int32).sum()

    def args_pipe(B):
        return (jnp.asarray(bursts_big[:B]),
                jnp.asarray(np.full(B, INIT, np.uint32)))

    def args_fused(B):
        return (jnp.asarray(bursts_big[:B]),
                jnp.asarray(np.full(B, INIT, np.uint32)),
                jnp.ones(B, jnp.int32))

    for name, step, mk in (("pipeline_schf", fec_pipeline, args_pipe),
                           ("fused_allkind", fec_fused, args_fused)):
        r, ts, tb = rate_of(step, mk)
        print(json.dumps({"path": name, "slots_per_s": round(r, 1),
                          "t_small": round(ts, 4), "t_big": round(tb, 4)}),
              flush=True)

    # (c) kernel-only with group variants, large differential
    soft = rng.choice(np.asarray([-1, 0, 1]), (B_BIG, fused.N_MOTHER)) \
        .astype(np.int8)
    rm = np.zeros((B_BIG, len(fused.BOUNDARIES)), np.float32)
    for group in (1, 2, 4):
        try:
            f = jax.jit(lambda s, r, g=group: decode_segmented_pallas(
                s, r, fused.N_SYM, fused.BOUNDARIES, tile_b=2048,
                group=g).sum())

            def mk(B):
                return (jnp.asarray(soft[:B]), jnp.asarray(rm[:B]))
            r, ts, tb = rate_of(f, mk)
            print(json.dumps({"path": f"kernel_g{group}",
                              "slots_per_s": round(r, 1),
                              "t_small": round(ts, 4),
                              "t_big": round(tb, 4)}), flush=True)
        except Exception as e:
            print(json.dumps({"path": f"kernel_g{group}",
                              "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()

"""Stage-level profile of the FEC-only bench path (bench.py stage 2).

Breaks pipeline.decode_schf_burst into its device stages and times each
with the same two-size differential methodology as bench.py, so the
fixed tunnel overhead cancels:

  assembly  descramble XOR + sign cast + one-hot FEC matmul + int8 cast
  kernel    segmented radix-16 Pallas Viterbi (int8 soft, 2048 tiles)
  crc       CRC16 check matmul
  full      the whole decode_schf_burst step

Usage: python tools/profile_fec_stage.py [B_SMALL B_BIG]
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

from tetra_tpu import constants as C, tx
from tetra_tpu.lmac import pipeline
from tetra_tpu.ops import crc, scramble
from tetra_tpu.ops.viterbi_pallas import decode_pallas
from tetra_tpu.phy.burst import build_norm_c_d_burst, split_norm_burst

REPS = 7


def median_time(fn, reps=REPS):
    fn()
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        samples.append(time.perf_counter() - t0)
    return float(np.median(samples))


def main():
    b_small = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    b_big = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    rng = np.random.default_rng(0)
    from tetra_tpu.ops.scramble import scramb_get_init
    init = scramb_get_init(262, 42, 1)
    n_uniq = 64
    schf = rng.integers(0, 2, size=(n_uniq, 268)).astype(np.int8)
    aach = rng.integers(0, 2, size=(n_uniq, 14)).astype(np.int8)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t5 = np.asarray(tx.encode_block("SCH_F", jnp.asarray(schf),
                                        jnp.uint32(init)))
        bb = np.asarray(tx.encode_bbk(jnp.asarray(aach), jnp.uint32(init)))
    uniq = np.stack([build_norm_c_d_burst(t5[i, :216], bb[i],
                                          t5[i, 216:], False)
                     for i in range(n_uniq)])

    n345, n2, n1, ia, _ = C.BLOCK_PARAMS["SCH_F"]

    @jax.jit
    def assembly(bursts, i):
        _, blk1, blk2 = split_norm_burst(bursts)
        b5 = jnp.concatenate([blk1, blk2], axis=-1)
        type4 = scramble.scramb_bits(i, b5)
        sgn = (1 - 2 * type4.astype(jnp.int8)).astype(jnp.bfloat16)
        mother = jnp.dot(sgn,
                         jnp.asarray(pipeline._fec_matrix("SCH_F"),
                                     jnp.bfloat16),
                         preferred_element_type=jnp.float32)
        return mother.astype(jnp.int8)

    @jax.jit
    def kernel(soft):
        return decode_pallas(soft, n2).astype(jnp.int32).sum()

    @jax.jit
    def crc_only(t2):
        return crc.crc16_check(t2[..., : n1 + 16]).astype(jnp.int32).sum()

    @jax.jit
    def full(b, i):
        res = pipeline.decode_schf_burst(b, i)
        return res["SCH_F"].crc_ok.astype(jnp.int32).sum()

    def bursts_of(n):
        return jnp.asarray(np.tile(uniq, (n // n_uniq + 1, 1))[:n]
                           .astype(np.int8))

    out = {}
    for name, make, fn in (
        ("assembly",
         lambda n: (bursts_of(n), jnp.full(n, init, jnp.uint32)),
         lambda args: assembly(*args).block_until_ready()),
        ("kernel",
         lambda n: (jnp.asarray(np.asarray(assembly(
             bursts_of(n), jnp.full(n, init, jnp.uint32)))),),
         lambda args: int(kernel(*args))),
        ("crc",
         lambda n: (jnp.asarray(rng.integers(0, 2, (n, n2))
                                .astype(np.int8)),),
         lambda args: int(crc_only(*args))),
        ("full",
         lambda n: (bursts_of(n), jnp.full(n, init, jnp.uint32)),
         lambda args: int(full(*args))),
    ):
        times = {}
        for B in (b_small, b_big):
            args = make(B)
            times[B] = median_time(lambda a=args: fn(a))
        rate = (b_big - b_small) / (times[b_big] - times[b_small])
        out[name] = {"slots_per_s": round(rate, 1),
                     "t_small_ms": round(times[b_small] * 1e3, 2),
                     "t_big_ms": round(times[b_big] * 1e3, 2),
                     "delta_ms": round((times[b_big] - times[b_small])
                                       * 1e3, 2)}
        print(json.dumps({name: out[name]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()

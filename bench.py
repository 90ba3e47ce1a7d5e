"""Benchmark: real-time TETRA carriers decodable per chip.

Measures the full lower-MAC decode path (descramble -> deinterleave ->
depuncture -> 16-state Viterbi -> CRC) on batched SCH/F bursts — the
dominant per-slot compute of the reference receiver (SURVEY.md §3.1 hot
loops) — and reports how many real-time carriers (70.588 slots/s each,
18 ksym/s) one chip sustains.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
vs_baseline is the ratio against the BASELINE.md north-star target of
1000 real-time carriers per chip.
"""
from __future__ import annotations

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tetra_tpu.lmac import pipeline
    from tetra_tpu import tx
    from tetra_tpu.ops.scramble import scramb_get_init

    B = 1024              # bursts per batch (carriers x slots)
    N_ITERS = 20
    init = scramb_get_init(262, 42, 1)

    rng = np.random.default_rng(0)
    schf = rng.integers(0, 2, size=(B, 268)).astype(np.int8)
    aach = rng.integers(0, 2, size=(B, 14)).astype(np.int8)
    # generate fixtures on the host CPU backend: the eager TX chain is many
    # tiny ops, and compiling them as TPU executables both wastes time and
    # degrades subsequent dispatch latency over the device tunnel
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t5 = np.asarray(tx.encode_block("SCH_F", jnp.asarray(schf), jnp.uint32(init)))
        bb = np.asarray(tx.encode_bbk(jnp.asarray(aach), jnp.uint32(init)))
    from tetra_tpu.phy.burst import build_norm_c_d_burst
    bursts = np.stack([build_norm_c_d_burst(t5[i, :216], bb[i], t5[i, 216:], False)
                       for i in range(min(B, 64))])
    bursts = np.tile(bursts, (B // len(bursts) + 1, 1))[:B]

    bursts_d = jnp.asarray(bursts.astype(np.int8))
    inits_d = jnp.asarray(np.full(B, init, dtype=np.uint32))

    @jax.jit
    def step(b, i):
        res = pipeline.decode_schf_burst(b, i)
        return res["SCH_F"].type1, res["SCH_F"].crc_ok

    # warmup / compile
    out = step(bursts_d, inits_d)
    jax.block_until_ready(out)
    # correctness gate: the benchmark only counts if decode is right
    ok_frac = float(np.asarray(out[1]).mean())

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = step(bursts_d, inits_d)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    slots_per_s = B * N_ITERS / dt
    # one carrier is 18000/255 = 70.588 slots/s (BASELINE.md)
    realtime_carriers = slots_per_s / (18000.0 / 255.0)
    result = {
        "metric": "realtime_carriers_per_chip",
        "value": round(realtime_carriers, 1),
        "unit": "carriers (70.6 FEC slots/s each, SCH/F full decode)",
        "vs_baseline": round(realtime_carriers / 1000.0, 3),
        "slots_per_s": round(slots_per_s, 1),
        "crc_ok_frac": ok_frac,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()

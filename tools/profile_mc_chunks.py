"""Per-phase profile of the fused multi-carrier chunk pipeline.

Times each host-visible phase of tools/bench_mc_e2e's configuration:
submit (pack + h2d + dispatch), bundle fetch (d2h), numpy row decode,
record assembly and the native C++ walk — to show where the per-chunk
budget goes on a tunneled device.

Usage: python tools/profile_mc_chunks.py [n_car] [n_frames] [n_chunks]
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

import bench_mc_e2e  # noqa: E402  (same dir)
from tetra_tpu.rx_multi import MultiCarrierReceiver  # noqa: E402


def main():
    n_car = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    n_frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    n_chunks = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    rng = np.random.default_rng(0)
    row = bench_mc_e2e.make_stream(rng, n_frames)
    bits = np.tile(row, (n_car, 1))
    for c in range(n_car):
        bits[c] = np.roll(bits[c], c % 17)
        bits[c, : c % 17] = rng.integers(0, 2, c % 17)
    T = bits.shape[1]
    cuts = np.linspace(0, T, n_chunks + 1).astype(int)

    def one_pass(profile=False):
        mc = MultiCarrierReceiver(np.zeros(n_car), fs=25_000.0 * n_car,
                                  control_plane="native")
        fast = mc._fast
        if not profile:
            for k in range(n_chunks):
                mc.process_bits(bits[:, cuts[k]:cuts[k + 1]],
                                final=k == n_chunks - 1)
            return
        # un-pipelined pass: time each phase serially per chunk
        for k in range(n_chunks):
            t0 = time.perf_counter()
            h = fast.submit(bits[:, cuts[k]:cuts[k + 1]] & 1)
            t1 = time.perf_counter()
            h.bundle.block_until_ready()
            t2 = time.perf_counter()
            arr = np.asarray(h.bundle)
            t3 = time.perf_counter()
            d = fast.collect(h)
            t4 = time.perf_counter()
            mcx = mc
            n = len(d["carrier"])
            recs = np.column_stack([
                d["carrier"], d["kind"], d["okA"], d["okB"], d["delta"],
                np.arange(n, dtype=np.int32), d["slot_ref"]])
            t5 = time.perf_counter()
            evd = mcx.native_cp.walk2(d["payload"].reshape(-1), recs,
                                      d["tail"])
            t6 = time.perf_counter()
            print(json.dumps({
                "chunk": k, "submit_ms": round((t1 - t0) * 1e3, 1),
                "device_wait_ms": round((t2 - t1) * 1e3, 1),
                "fetch_ms": round((t3 - t2) * 1e3, 1),
                "decode_np_ms": round((t4 - t3) * 1e3, 1),
                "recs_ms": round((t5 - t4) * 1e3, 1),
                "walk_ms": round((t6 - t5) * 1e3, 1),
                "bundle_kb": round(arr.nbytes / 1024, 1),
                "slots": n}), flush=True)

    one_pass()            # warm/compile
    t0 = time.perf_counter()
    one_pass()
    print(json.dumps({"pipelined_pass_s": round(time.perf_counter() - t0,
                                                3)}), flush=True)
    one_pass(profile=True)


if __name__ == "__main__":
    main()

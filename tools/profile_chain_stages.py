"""Stage bisect for the steady full chain (bench.py stage 3 shapes).

Times cumulative prefixes of locked_step_ri(fast="pallas",
decoders=("fused",)) with the same differential two-batch-size
methodology bench.py uses, so per-stage cost = delta between adjacent
prefixes. Prints one JSON line of Gsamples/s per prefix plus the
implied ms per stage at the big batch.
"""
import json
import time

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import jax.numpy as jnp

from tetra_tpu import constants as C
from tetra_tpu import tx
from tetra_tpu.phy import dqpsk
from tetra_tpu.phy.demod_pallas import (demodulate_hard_ri_pallas,
                                        demodulate_hard_slots_ri_pallas)
from tetra_tpu.phy.burst import build_norm_c_d_burst
from tetra_tpu.lmac import steady, fused as fused_mod
from tetra_tpu.ops.scramble import scramb_get_init

REPS = 7
N_SLOTS = 64
C_SMALL, C_BIG = 512, 4096


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
    init = scramb_get_init(262, 42, 1)
    n_uniq = 64
    schf = rng.integers(0, 2, size=(n_uniq, 268)).astype(np.int8)
    aach = rng.integers(0, 2, size=(n_uniq, 14)).astype(np.int8)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        t5 = np.asarray(tx.encode_block("SCH_F", jnp.asarray(schf),
                                        jnp.uint32(init)))
        bb = np.asarray(tx.encode_bbk(jnp.asarray(aach), jnp.uint32(init)))
    uniq = np.stack([build_norm_c_d_burst(t5[i, :216], bb[i], t5[i, 216:],
                                          False) for i in range(n_uniq)])
    pad = np.zeros(64, np.int8)
    bits_row = np.concatenate([pad, uniq[:N_SLOTS].reshape(-1), pad])
    iq_row = dqpsk.modulate(bits_row[None].astype(np.int8), sps=2)[0]
    T = iq_row.shape[-1]
    phase_bit = 64

    def mkdata(CC):
        tiled = np.tile(iq_row, (CC, 1))
        return (jnp.asarray(np.real(tiled).astype(np.float32)),
                jnp.asarray(np.imag(tiled).astype(np.float32)),
                jnp.asarray(np.full(CC, init, np.uint32)))

    data = {CC: mkdata(CC) for CC in (C_SMALL, C_BIG)}

    def slots_of(re, im):
        s, _ = demodulate_hard_slots_ri_pallas(re, im, N_SLOTS,
                                               phase_bit=phase_bit)
        return s

    # ---- cumulative prefixes ----
    @jax.jit
    def p1_demod(re, im, inits):
        return demodulate_hard_ri_pallas(re, im).astype(jnp.int32).sum()

    @jax.jit
    def p2_slots(re, im, inits):
        return slots_of(re, im).astype(
            jnp.int32).sum()

    @jax.jit
    def p3_kinds(re, im, inits):
        slots = slots_of(re, im)
        return steady.verify_train_seq(slots).sum()

    @jax.jit
    def p4_assembly(re, im, inits):
        """demod + kinds + keystream + gathers/mask + assembly matmul
        (everything in decode_slots_fused before the Viterbi)."""
        slots = slots_of(re, im)
        kinds = steady.verify_train_seq(slots)
        soft, _, _ = fused_mod.assemble_soft(slots, inits[:, None], kinds)
        return soft.astype(jnp.float32).sum()

    @jax.jit
    def p5_viterbi(re, im, inits):
        """p4 + the segmented Viterbi (skips CRC/BBK/wrap)."""
        slots = slots_of(re, im)
        kinds = steady.verify_train_seq(slots)
        soft, rm, _ = fused_mod.assemble_soft(slots, inits[:, None], kinds)
        bits = fused_mod._decode_segmented_auto(soft, rm)
        return bits.astype(jnp.int32).sum()

    @jax.jit
    def p6_full(re, im, inits):
        out = steady.locked_step_ri(re, im, inits, phase_bit=phase_bit,
                                    n_slots=N_SLOTS, fast="pallas",
                                    decoders=("fused",))
        return out["crc_ok"].astype(jnp.int32).sum()

    prefixes = [("demod", p1_demod), ("slots", p2_slots),
                ("kinds", p3_kinds), ("assembly", p4_assembly),
                ("viterbi", p5_viterbi), ("full", p6_full)]

    d_samples = (C_BIG - C_SMALL) * T
    out = {}
    prev_dt = 0.0
    for name, fn in prefixes:
        t_s = med(lambda: int(fn(*data[C_SMALL])))
        t_b = med(lambda: int(fn(*data[C_BIG])))
        dt = t_b - t_s
        out[name + "_gs"] = round(d_samples / dt / 1e9, 2)
        out[name + "_stage_ms"] = round((dt - prev_dt) * 1e3, 2)
        prev_dt = dt
    out["n_slots"] = N_SLOTS
    out["T"] = T
    print(json.dumps(out))


if __name__ == "__main__":
    main()

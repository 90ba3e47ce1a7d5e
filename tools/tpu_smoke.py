"""On-hardware kernel validation: the CPU test suite runs every Pallas
kernel in interpret mode, so the Mosaic-compiled artifacts themselves
are only exercised on a real TPU. This script re-runs the bit-exactness
checks on the device and prints one PASS/FAIL JSON line; run it after
touching any kernel (tests/ stays hardware-independent).

Checks:
  demod    — fused Pallas DQPSK demod == XLA demod, odd shapes + SNRs
  viterbi  — segmented radix-16: int8 == bf16 == f32 decisions on
             tie-heavy data (packed tie-break vs compare+min)
  fused    — locked_step_fused == locked_step_bits per classified kind
             on mixed corrupted bursts (the e2e decode contract)
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)


def check_demod():
    from tetra_tpu.phy import dqpsk
    from tetra_tpu.phy.demod_pallas import demodulate_hard_ri_pallas
    rng = np.random.default_rng(3)
    for C, T, snr in ((7, 5000, 100.0), (16, 32768, 10.0), (3, 1100, 4.0)):
        bits = rng.integers(0, 2, (C, T)).astype(np.int8)
        iq = np.asarray(dqpsk.modulate(jnp.asarray(bits), sps=2))
        iq = iq[:, :T] + (rng.normal(0, 1 / snr, (C, T))
                          + 1j * rng.normal(0, 1 / snr, (C, T)))
        re = jnp.asarray(iq.real.astype(np.float32))
        im = jnp.asarray(iq.imag.astype(np.float32))
        a = np.asarray(demodulate_hard_ri_pallas(re, im))
        b = np.asarray(dqpsk.demodulate_hard_ri(re, im))
        if not (a == b).all():
            return f"demod mismatch C={C} T={T} snr={snr}"
    return None


def check_viterbi():
    from tetra_tpu.lmac import fused
    from tetra_tpu.ops.viterbi_pallas import decode_segmented_pallas
    rng = np.random.default_rng(10)
    B = 4096
    vals = rng.integers(-1, 2, size=(B, fused.N_MOTHER)).astype(np.int8)
    rmask = jnp.asarray(rng.integers(0, 2, size=(B, 3)).astype(np.float32))
    outs = {}
    for name, soft in (
            ("f32", jnp.asarray(vals.astype(np.float32) * 127.0)),
            ("bf16", jnp.asarray((vals * 127).astype(np.float32)
                                 ).astype(jnp.bfloat16)),
            ("int8", jnp.asarray(vals))):
        outs[name] = np.asarray(decode_segmented_pallas(
            soft, rmask, fused.N_SYM, fused.BOUNDARIES))
    for name in ("bf16", "int8"):
        if not (outs[name] == outs["f32"]).all():
            return f"viterbi {name} != f32 decisions"
    return None


def check_fused():
    from tetra_tpu import constants as C, tx
    from tetra_tpu.lmac import steady
    from tetra_tpu.ops.scramble import scramb_get_init
    from tetra_tpu.phy.burst import build_norm_c_d_burst, build_sync_c_d_burst
    rng = np.random.default_rng(1)
    init = scramb_get_init(262, 42, 1)
    n = 24
    schf = rng.integers(0, 2, size=(n, 268)).astype(np.int8)
    aach = rng.integers(0, 2, size=(n, 14)).astype(np.int8)
    sb1b = rng.integers(0, 2, size=(n, 60)).astype(np.int8)
    sb2b = rng.integers(0, 2, size=(n, 124)).astype(np.int8)
    ndbb = rng.integers(0, 2, size=(n, 124)).astype(np.int8)
    t5 = np.asarray(tx.encode_block("SCH_F", jnp.asarray(schf),
                                    jnp.uint32(init)))
    bb = np.asarray(tx.encode_bbk(jnp.asarray(aach), jnp.uint32(init)))
    t5s1 = np.asarray(tx.encode_block("SB1", jnp.asarray(sb1b),
                                      jnp.uint32(C.SCRAMB_INIT)))
    t5s2 = np.asarray(tx.encode_block("SB2", jnp.asarray(sb2b),
                                      jnp.uint32(init)))
    t5n1 = np.asarray(tx.encode_block("NDB", jnp.asarray(ndbb),
                                      jnp.uint32(init)))
    rows = []
    for i in range(n):
        if i % 3 == 0:
            rows.append(build_sync_c_d_burst(t5s1[i], bb[i], t5s2[i]))
        elif i % 3 == 1:
            rows.append(build_norm_c_d_burst(t5[i, :216], bb[i],
                                             t5[i, 216:], False))
        else:
            rows.append(build_norm_c_d_burst(t5n1[i], bb[i],
                                             t5n1[(i + 1) % n], True))
    slots = np.stack(rows)
    slots[::4, 100] ^= 1
    slots[1::5, 300] ^= 1
    slots_j = jnp.asarray(slots.reshape(2, n // 2, 510))
    inits_j = jnp.full((2,), init, jnp.uint32)
    out_f = steady.locked_step_fused(slots_j, inits_j)
    out_b = steady.locked_step_bits(slots_j, inits_j)
    kinds = np.asarray(out_f["kinds"])
    fields = {0: ["sb1", "sb2", "bbk"], 1: ["schf", "bbk"],
              2: ["ndb1", "ndb2", "bbk"]}
    for kk, fl in fields.items():
        m = kinds == kk
        for f in fl:
            if not (np.asarray(out_f[f].type1)[m]
                    == np.asarray(out_b[f].type1)[m]).all():
                return f"fused kind={kk} field={f} type1 mismatch"
            if not (np.asarray(out_f[f].crc_ok)[m]
                    == np.asarray(out_b[f].crc_ok)[m]).all():
                return f"fused kind={kk} field={f} crc mismatch"
    return None


def main():
    backend = jax.default_backend()
    if backend not in ("tpu", "axon"):
        print(json.dumps({"ok": False,
                          "error": f"needs a TPU (backend={backend})"}))
        return 2
    results = {}
    rc = 0
    for name, fn in (("demod", check_demod), ("viterbi", check_viterbi),
                     ("fused", check_fused)):
        err = fn()
        results[name] = err or "ok"
        rc |= bool(err)
    print(json.dumps({"ok": rc == 0, "device": str(jax.devices()[0]),
                      **results}))
    return rc


if __name__ == "__main__":
    sys.exit(main())

"""Per-host worker for the REAL two-process jax.distributed bring-up.

This is docs/MULTIHOST.md's launch snippet as runnable code: standard
`jax.distributed.initialize`, the 2-D (host, chip) mesh, per-host
ingest via `jax.make_array_from_process_local_data` (each process
materialises ONLY its own time window), then the halo-exchanged
`sharded_locked_step_2d` chain. Spawned pairwise by
tests/test_distributed.py, which stitches each process's addressable
output shards back together and asserts bit-identity with the
single-process unsharded receiver.

Usage: python tools/dist_worker.py <pid> <nproc> <port> <outdir>
"""
import os
import pathlib
import pickle
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

CHIPS_PER_HOST = 4
CC, S_TOTAL = 8, 4      # carriers, total slots (S_TOTAL/nproc per host)


def build_capture(rng_seed: int = 5):
    """Deterministic mixed SYNC/SCH-F capture, shared with the test's
    unsharded reference run."""
    import numpy as np
    import jax.numpy as jnp
    from tetra_tpu import tx, testpdu
    from tetra_tpu.ops.scramble import scramb_get_init
    from tetra_tpu.phy import dqpsk

    init = scramb_get_init(262, 42, 1)
    aach = testpdu.make_access_assign_bits()
    slots = np.zeros((CC, S_TOTAL, 510), np.int8)
    for c in range(CC):
        for s in range(S_TOTAL):
            if (c + s) % 2 == 0:
                slots[c, s] = tx.make_sync_burst(
                    testpdu.make_sync_pdu(mcc=262, mnc=42, cc=1),
                    testpdu.make_sysinfo_pdu(), aach, jnp.uint32(init))
            else:
                slots[c, s] = tx.make_schf_burst(
                    testpdu.make_resource_pdu(ssi=c * 16 + s), aach,
                    jnp.uint32(init))
    iq = dqpsk.modulate(slots.reshape(CC, -1), sps=2)
    re = np.real(iq).astype(np.float32)
    im = np.imag(iq).astype(np.float32)
    inits = np.full(CC, init, np.uint32)
    return re, im, inits


def build_bits_capture(n_car: int):
    """Per-carrier HARD-BIT streams for the fastpath phase: garbage
    head, double SYNC (acquisition eats the first), SCH/F resources
    carrying MLE/CMCE D-SETUP TL-SDUs, zero tail so the ring drains.
    Deterministic — every process must build the IDENTICAL capture
    (the packed chunk enters the multi-process program replicated)."""
    import numpy as np
    import jax.numpy as jnp
    from tetra_tpu import tx, testpdu
    from tetra_tpu.ops.scramble import scramb_get_init

    init = scramb_get_init(262, 42, 1)
    aach = testpdu.make_access_assign_bits()
    sync = None
    rows = []
    for c in range(n_car):
        rng = np.random.default_rng(7000 + c)
        parts = [rng.integers(0, 2, 97 + 13 * c).astype(np.uint8)]
        if sync is None:
            sync = np.asarray(tx.make_sync_burst(
                testpdu.make_sync_pdu(mcc=262, mnc=42, cc=1),
                testpdu.make_sysinfo_pdu(), aach, jnp.uint32(init)),
                np.uint8)
        parts += [sync, sync]
        for s in range(6):
            sdu = testpdu.make_bl_udata(testpdu.make_mle_cmce_dsetup())
            parts.append(np.asarray(tx.make_schf_burst(
                testpdu.make_resource_pdu(ssi=0x500 + 16 * c + s,
                                          sdu_bits=sdu),
                aach, jnp.uint32(init)), np.uint8))
        parts.append(np.zeros(1300, np.uint8))
        rows.append(np.concatenate(parts))
    L = min(len(r) for r in rows)
    return np.stack([r[:L] for r in rows])


def run_fastpath_phase(pid: int):
    """The FLAGSHIP path across processes: MultiCarrierReceiver's
    native plane over a carrier-sharded multi-process mesh
    (fastpath._sharded_fused_chunk + collect_local) — each process
    fetches and walks ONLY its own carrier shards, the reference's
    one-process-per-carrier scaling model (src/receiver1:8) made real
    on a jax.distributed mesh. Returns (owned carriers, TL-SDU sink
    entries, per-owned-carrier stats)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh
    from tetra_tpu.rx_multi import MultiCarrierReceiver

    n_car = len(jax.devices())
    car_mesh = Mesh(np.asarray(jax.devices()), ("car",))
    bits = build_bits_capture(n_car)
    sink = []
    mc = MultiCarrierReceiver(
        np.zeros(n_car), fs=25e3 * n_car, control_plane="native",
        mesh=car_mesh,
        tl_sdu_sink=lambda c, pd, pt, b: sink.append(
            (int(c), int(pd), int(pt),
             np.packbits(np.asarray(b)).tobytes(), len(b))))
    assert mc._fast.multiproc
    L = bits.shape[1]
    cuts = [0, L // 3, 2 * L // 3, L]
    for k in range(3):
        mc.process_bits(bits[:, cuts[k]:cuts[k + 1]], final=k == 2)
    owned = [c for c, dev in enumerate(car_mesh.devices.flat)
             if dev.process_index == pid]
    stats = [(c, mc.carriers[c].stats.crc_ok,
              mc.carriers[c].stats.crc_wrong,
              mc.carriers[c].stats.slots) for c in owned]
    return owned, sink, stats


def main():
    pid, nproc, port, outdir = (int(sys.argv[1]), int(sys.argv[2]),
                                sys.argv[3], sys.argv[4])
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={CHIPS_PER_HOST}")
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    jax.config.update("jax_platforms", "cpu")
    # --- docs/MULTIHOST.md "Launch" ---
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=nproc, process_id=pid)
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P
    from tetra_tpu.parallel.mesh import make_mesh_2d, sharded_locked_step_2d

    assert jax.process_count() == nproc
    assert len(jax.devices()) == nproc * CHIPS_PER_HOST
    n_hosts = jax.process_count()
    mesh = make_mesh_2d(jax.devices(), hosts=n_hosts)
    step = sharded_locked_step_2d(mesh)

    # --- per-host ingest: this process's time window ONLY ---
    re_g, im_g, inits = build_capture()
    T = re_g.shape[1]
    tl = T // nproc
    sh = NamedSharding(mesh, P("chip", "host"))
    re = jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(re_g[:, pid * tl:(pid + 1) * tl]))
    im = jax.make_array_from_process_local_data(
        sh, np.ascontiguousarray(im_g[:, pid * tl:(pid + 1) * tl]))
    out = step(re, im, jax.numpy.asarray(inits))
    jax.block_until_ready(out)

    dump = {"crc_ok_total": int(np.asarray(out["crc_ok_total"]))}
    for key in ("kinds", "crc_ok", "schf_type1"):
        dump[key] = {"shape": out[key].shape,
                     "shards": [(s.index, np.asarray(s.data))
                                for s in out[key].addressable_shards]}

    # --- phase 2: the sharded fastpath flagship across processes ---
    owned, sink, fstats = run_fastpath_phase(pid)
    dump["fast_owned"] = owned
    dump["fast_sink"] = sink
    dump["fast_stats"] = fstats

    with open(os.path.join(outdir, f"out{pid}.pkl"), "wb") as f:
        pickle.dump(dump, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()

"""REAL two-process jax.distributed bring-up (BASELINE "linear to ≥2
hosts"; reference analogue: the per-process fan-out of src/receiver1:8).

The in-process virtual mesh (conftest, dryrun_multichip) validates the
sharded math; this test validates the actual multi-process path: two OS
processes, each owning 4 virtual chips, join one jax.distributed
cluster, run docs/MULTIHOST.md's launch snippet verbatim
(tools/dist_worker.py) with per-host time-window ingest, and their
stitched output shards must be bit-identical to the single-process
unsharded receiver.
"""
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tools", "dist_worker.py")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _stitch(dumps, key):
    shape = dumps[0][key]["shape"]
    out = None
    for d in dumps:
        for index, data in d[key]["shards"]:
            if out is None:
                out = np.zeros(shape, data.dtype)
            out[index] = data
    return out


class TestTwoProcessDistributed:
    def test_two_process_matches_single(self, tmp_path):
        nproc = 2
        port = _free_port()
        env = {k: v for k, v in os.environ.items()
               if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
        procs = [subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port),
             str(tmp_path)], env=env, stdout=subprocess.PIPE,
            stderr=subprocess.PIPE) for i in range(nproc)]
        outs = [p.communicate(timeout=600) for p in procs]
        for p, (so, se) in zip(procs, outs):
            assert p.returncode == 0, se.decode()[-3000:]

        dumps = [pickle.load(open(tmp_path / f"out{i}.pkl", "rb"))
                 for i in range(nproc)]
        kinds = _stitch(dumps, "kinds")
        crc_ok = _stitch(dumps, "crc_ok")
        schf_t1 = _stitch(dumps, "schf_type1")

        # single-process unsharded reference on the same capture
        import jax
        import jax.numpy as jnp
        from tools.dist_worker import build_capture, CC, S_TOTAL
        from tetra_tpu.lmac import steady
        re, im, inits = build_capture()
        ref = steady.locked_step_ri(jnp.asarray(re), jnp.asarray(im),
                                    jnp.asarray(inits), phase_bit=0,
                                    n_slots=S_TOTAL, decoders=("fused",))
        np.testing.assert_array_equal(kinds, np.asarray(ref["kinds"]))
        np.testing.assert_array_equal(crc_ok, np.asarray(ref["crc_ok"]))
        np.testing.assert_array_equal(schf_t1, np.asarray(ref["schf"].type1))
        # every process saw the same global psum'd CRC count
        want_total = int(np.asarray(ref["crc_ok"]).sum())
        assert want_total == CC * S_TOTAL
        for d in dumps:
            assert d["crc_ok_total"] == want_total

        # ---- phase 2: the sharded fastpath FLAGSHIP across the two
        # processes — each walked only its own carrier shards; the
        # union of their TL-SDU egress and per-carrier stats must be
        # bit-identical to a single-process unsharded receiver on the
        # same capture ----
        from tools.dist_worker import build_bits_capture
        from tetra_tpu.rx_multi import MultiCarrierReceiver
        owned_union = sorted(c for d in dumps for c in d["fast_owned"])
        n_car = len(owned_union)
        assert owned_union == list(range(n_car))
        for d in dumps:   # a process's sink holds ONLY its carriers
            assert {e[0] for e in d["fast_sink"]} <= set(d["fast_owned"])

        bits = build_bits_capture(n_car)
        sink_ref = []
        mc = MultiCarrierReceiver(
            np.zeros(n_car), fs=25e3 * n_car, control_plane="native",
            tl_sdu_sink=lambda c, pd, pt, b: sink_ref.append(
                (int(c), int(pd), int(pt),
                 np.packbits(np.asarray(b)).tobytes(), len(b))))
        L = bits.shape[1]
        cuts = [0, L // 3, 2 * L // 3, L]
        for k in range(3):
            mc.process_bits(bits[:, cuts[k]:cuts[k + 1]], final=k == 2)

        def by_carrier(entries):
            out = {}
            for e in entries:
                out.setdefault(e[0], []).append(e[1:])
            return out

        got = by_carrier([e for d in dumps for e in d["fast_sink"]])
        want = by_carrier(sink_ref)
        assert got == want and len(want) == n_car
        stats_ref = {c: (mc.carriers[c].stats.crc_ok,
                         mc.carriers[c].stats.crc_wrong,
                         mc.carriers[c].stats.slots)
                     for c in range(n_car)}
        for d in dumps:
            for c, ok, wrong, slots in d["fast_stats"]:
                assert (ok, wrong, slots) == stats_ref[c], c
                assert ok > 0 and wrong == 0

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

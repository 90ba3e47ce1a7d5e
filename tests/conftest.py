"""Test configuration: force an 8-device virtual CPU mesh.

Tests validate bit-exactness and sharding semantics; they must run
deterministically and without TPU hardware. Benchmarks (bench.py) use
the real chip.
"""
import os

# force-override: the environment may export JAX_PLATFORMS=axon (real TPU);
# tests must run on the deterministic virtual-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
# tools modules (bench_mc_e2e, ...) must not re-enable the persistent
# compilation cache when imported BY tests — see the cache note below
os.environ["TETRA_TPU_TESTS"] = "1"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin force-appends itself during `import jax`, ignoring
# JAX_PLATFORMS — only an explicit config update selects the CPU backend
jax.config.update("jax_platforms", "cpu")
# NO persistent compilation cache for tests: the executable
# (de)serialization path has segfaulted deterministically near the end
# of a full-suite run on this rig (put/get_executable_and_time inside
# an XLA:CPU cache write after ~300 tests of in-process compiles;
# reproduced across three runs, gone without the cache), and stale
# entries AOT-compiled on a different machine SIGILL on load (the
# cpu_aot_loader feature-mismatch warnings). Benchmarks (bench.py,
# tools/) keep their cache — TPU compiles through the tunnel are the
# expensive case and have not shown the fault.

import json
import pathlib

import numpy as np
import pytest

GOLDEN_PATH = pathlib.Path(__file__).parent / "golden" / "golden.json"


@pytest.fixture(scope="session")
def golden():
    with open(GOLDEN_PATH) as f:
        return json.load(f)


def arr(entry, key):
    return np.asarray(entry[key], dtype=np.uint8)

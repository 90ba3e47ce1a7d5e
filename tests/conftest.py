"""Test configuration: force an 8-device virtual CPU mesh.

Tests validate bit-exactness and sharding semantics; they must run
deterministically and without TPU hardware. Benchmarks (bench.py) use
the real chip.
"""
import os

# force-override: the environment may export JAX_PLATFORMS=axon (real TPU);
# tests must run on the deterministic virtual-device CPU mesh
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

# the axon TPU plugin force-appends itself during `import jax`, ignoring
# JAX_PLATFORMS — only an explicit config update selects the CPU backend
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tetra_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

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

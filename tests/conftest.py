"""Test configuration: force CPU with 8 virtual devices BEFORE jax import.

Mirrors the reference's debug-ddp trick (train.py:75-89) — same code, fake
topology — so multi-chip sharding tests run on any host.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_cpu_max_isa" not in flags:
    # Pin the CPU compile target: the persistent jit cache is shared across
    # heterogeneous hosts, and XLA:CPU AOT blobs compiled with the full
    # native feature set SIGILL-warn (and may crash) on a lesser host.
    # AVX2 is the portable common denominator (VERDICT r4 item 8).
    flags = (flags + " --xla_cpu_max_isa=AVX2").strip()
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

# The environment pins JAX_PLATFORMS=axon via sitecustomize; the config update
# is authoritative and restores CPU for tests.
jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the suite's wall time is dominated by CPU
# jit compiles (the tracker/BA/initializer programs take 30-60 s each);
# caching them across runs turns repeat runs into a ~2-minute fast tier.
_cache_dir = os.environ.get("TANDEM_TEST_JIT_CACHE",
                            "/tmp/tandem_tpu_jit_cache")
try:
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
except Exception:
    pass  # older jax without the persistent cache API

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference/cva_mvsnet"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


requires_reference = pytest.mark.skipif(
    not reference_available(), reason="reference repo not mounted")


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(1234)

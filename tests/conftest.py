"""Test config: force JAX onto a virtual 8-device CPU mesh.

Real TPU hardware here is a single tunneled chip with ~60s+ per-compile
round-trips — unusable for a unit-test loop.  The environment's
`sitecustomize` registers the axon TPU backend and sets
`jax_platforms="axon,cpu"` at interpreter start (before conftest runs), so we
override the config AFTER jax import rather than via env vars.  Multi-chip
sharding is validated on virtual CPU devices
(`xla_force_host_platform_device_count=8`), mirroring how the driver dry-runs
`__graft_entry__.dryrun_multichip`.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache: model-sized CPU compiles dominate suite
# wall time; caching them across runs cuts repeat suites by minutes.  The
# cache dir key lives in utils/compile_cache.py (shared with the driver
# dryrun): jax/jaxlib versions + CPU model name + feature flags — XLA:CPU
# AOT artifacts are NOT portable across machine types, and a stale or
# foreign artifact can SIGILL or load with a machine-mismatch warning.
from jpeg_detection_resnet_ssd_tpu.utils.compile_cache import (
    enable_persistent_cache,
)

enable_persistent_cache(
    jax,
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)

import numpy as np
import pytest


@pytest.fixture(scope="session", autouse=True)
def _assert_cpu_backend():
    assert jax.devices()[0].platform == "cpu", (
        "tests must run on the virtual CPU mesh, got " + str(jax.devices())
    )
    assert len(jax.devices()) == 8


@pytest.fixture
def rng():
    return np.random.default_rng(0)

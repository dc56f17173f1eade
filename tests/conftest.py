"""Test harness configuration.

Mirrors the reference's CPU-sim strategy (SURVEY §4): the reference tests
its 8-core kernel without hardware by compiling the same source against
tikicpulib (cmake/cpu/CMakeLists.txt:6). Here the same trick is
``--xla_force_host_platform_device_count=8`` — the multi-chip sharding
code paths run unchanged on 8 virtual CPU devices.

Env vars must be set before the first ``import jax`` anywhere in the test
process, which is why this lives at the top of conftest.
"""

import os

# Force CPU even when the session env pins a TPU platform (e.g.
# JAX_PLATFORMS=axon on tunneled-TPU machines) — tests must not burn the
# real chip, and the virtual 8-device mesh only exists on CPU.  A plain
# env var is not enough on machines whose sitecustomize imports jax at
# interpreter start (the env default is frozen into jax config then), so
# also update the config directly before any backend initializes.
#
# ESCAPE HATCH: the *_tpu.py hardware tests need the real chip, which
# this pin would make unreachable from pytest entirely.  Set
# APT_TPU_TESTS=1 to keep the session backend (and f32) — e.g.
#   APT_TPU_TESTS=1 python -m pytest tests/ -q -k tpu
# on the bench machine; everything else still skips itself off-TPU.
_TPU_RUN = os.environ.get("APT_TPU_TESTS") == "1"

if not _TPU_RUN:
    os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if not _TPU_RUN and "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

if not _TPU_RUN:
    jax.config.update("jax_platforms", "cpu")
    # Float64 is the numerically-stable parity gate (see
    # tests/test_reference_parity.py); enable it for the CPU test
    # process.  (Not on TPU: the chip is f32-native.)
    jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFERENCE_PATH = "/root/reference"


@pytest.fixture
def rng():
    return np.random.RandomState(0)


@pytest.fixture(scope="session")
def reference_scripts_dir():
    """Path to the upstream reference's scripts/, or skip if absent."""
    p = os.path.join(REFERENCE_PATH, "scripts")
    if not os.path.isdir(p):
        pytest.skip("reference repo not mounted")
    return p

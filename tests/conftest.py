"""Test configuration: run JAX on a virtual 8-device CPU mesh.

Multi-chip TPU hardware is unavailable in CI; sharding correctness is
validated on XLA's host platform with 8 virtual devices (the driver
separately dry-runs the multi-chip path).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402

REFDIR = "/root/reference/Benchmark"


@pytest.fixture(scope="session")
def vela_polyco():
    from dspsr_tpu.timing.polyco import Polyco
    return Polyco.load(os.path.join(REFDIR, "vela.polyco"))


@pytest.fixture(scope="session")
def vela_par():
    from dspsr_tpu.timing.par import Ephemeris
    return Ephemeris.load(os.path.join(REFDIR, "vela.par"))


@pytest.fixture
def rng():
    return np.random.default_rng(12345)

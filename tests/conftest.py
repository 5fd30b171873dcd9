"""Test configuration: force CPU with 8 virtual devices.

This is the standard JAX stand-in for multi-chip hardware: every sharding /
mesh test runs against an 8-device host-platform mesh, so the multi-chip
code path is exercised on any machine.  Must run before jax is imported.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some environments pre-import jax via sitecustomize before conftest runs;
# the backend is still uninitialized at that point, so switching the platform
# through jax.config still works.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from image_classification_tpu.core.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def eight_device_mesh():
    from image_classification_tpu.parallel import MeshSpec, build_mesh

    return build_mesh(MeshSpec(data=-1, model=1))

"""Test harness configuration.

All tests run on a virtual 8-device CPU mesh so that every pjit/shard_map code
path (data-parallel training, sharded retrieval top-k) is exercised without TPU
hardware, mirroring how the driver validates `dryrun_multichip`.

These env vars must be set before the first `import jax` anywhere in the test
process, which is why they live at the top of the root conftest.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import pathlib

import numpy as np
import pytest

# The host image's sitecustomize force-registers the 'axon' TPU platform at
# jax-config level, overriding JAX_PLATFORMS; pin the config back to CPU so
# tests always run on the virtual 8-device mesh.
import jax

jax.config.update("jax_platforms", "cpu")

REFERENCE_ROOT = pathlib.Path("/root/reference")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)


@pytest.fixture(scope="session")
def reference_fixtures():
    """Path to the reference repo's checked-in data fixtures, if present.

    Only *data* (metadata JSONs, .npy embedding matrices) is read from the
    reference tree — never code. Tests depending on these skip when the
    reference mount is absent.
    """
    if not REFERENCE_ROOT.exists():
        pytest.skip("reference fixture tree not mounted")
    return REFERENCE_ROOT / "Backend"

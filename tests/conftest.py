"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set platform flags before jax initializes (first import wins).
"""

import os

# force CPU: the ambient environment pins JAX_PLATFORMS to the TPU tunnel
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["JAX_PLATFORM_NAME"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax

# the axon TPU plugin re-pins jax_platforms during import; override it back
jax.config.update("jax_platforms", "cpu")

import sys

REFERENCE_DIFFUSERS = "/root/reference/diffusers/src"


def add_torch_oracle_path():
    """Make the vendored reference diffusers importable as a numerical oracle.

    Tests compare our JAX implementations against the reference's torch
    behavior; the reference code itself is never imported by the framework.
    """
    if REFERENCE_DIFFUSERS not in sys.path:
        sys.path.insert(0, REFERENCE_DIFFUSERS)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def torch_oracle():
    add_torch_oracle_path()
    import diffusers  # noqa: F401

    return diffusers

"""Test harness config: run JAX on a virtual 8-device CPU mesh with x64.

Multi-chip sharding is validated on host CPU devices
(xla_force_host_platform_device_count), the JAX analogue of a fake
multi-node backend; float64 is enabled so parity tests against the
reference's numpy/math (float64) semantics can be bit-exact.
"""
import os

# Hard override: the session may pre-set JAX_PLATFORMS to a TPU platform,
# but tests must run on host CPU (true float64 + virtual 8-device mesh).
# jax may already be imported by a pytest plugin (baking env defaults into
# jax.config), so set both the env vars and the live config.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import sys

import jax
import pytest

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
assert len(jax.devices()) == 8, "tests expect an 8-device virtual CPU mesh"

REFERENCE_PATH = "/root/reference"


def has_reference() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "tinycarlo"))


@pytest.fixture(scope="session")
def reference():
    """Import the reference implementation as an oracle for parity tests."""
    if not has_reference():
        pytest.skip("reference implementation not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import tinycarlo  # noqa: F401  (registers gym envs)

    return tinycarlo


requires_reference = pytest.mark.skipif(
    not has_reference(), reason="reference implementation not available"
)

# Vendored copies of the reference maps (examples/maps/README.md): map-
# dependent tests run standalone; only tests importing the reference CODE
# as an oracle need the checkout (requires_reference).
_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SIMPLE_LAYOUT_MAP = os.path.join(_REPO, "examples/maps/simple_layout.json")
KNUFFINGEN_MAP = os.path.join(_REPO, "examples/maps/knuffingen.json")

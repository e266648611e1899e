"""Test environment: force CPU with 8 virtual devices BEFORE jax imports.

SURVEY.md §4: the reference has no way to test multi-device logic (it is
single-GPU); our sharded/ICI-merge code is unit-tested on an emulated 8-device
CPU mesh via --xla_force_host_platform_device_count, per the build brief.
"""

import os

# Force-set (the harness pre-sets JAX_PLATFORMS=axon → one real TPU; unit
# tests must run on the emulated 8-device CPU mesh). Set
# FAISS_TPU_TEST_PLATFORM=tpu to run the suite on real hardware instead.
_platform = os.environ.get("FAISS_TPU_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize's axon register() overrides jax_platforms via jax.config at
# interpreter boot; env alone is not enough — override the config back.
if _platform == "cpu":
    jax.config.update("jax_platforms", "cpu")

import pytest  # noqa: E402


@pytest.fixture(scope="session", autouse=True)
def capability_banner():
    """Print the capability banner before tests so failures are attributable
    to a code path (reference: tests/test_metal_flat.mm:466-474)."""
    import faiss_tpu

    print()
    print(faiss_tpu.describe_capabilities())
    yield

"""Test configuration.

Tests always run on a virtual 8-device CPU backend so that the multi-chip
sharding paths (data-parallel training, cross-replica batch-norm moments,
sequence-parallel WPT) are exercised without TPU hardware.  This mirrors the
reference's trick of unit-testing post-`all_gather` reduction logic on a
single host (reference: tests/test_trainer.py:40-43), but at the XLA level:
the mesh is real, the collectives are real, only the chips are virtual.
"""

import os

# Force CPU: the ambient environment pins JAX_PLATFORMS=axon (the tunneled
# TPU) and its sitecustomize imports jax before conftest runs, so plain env
# vars are too late — use jax.config before any backend is initialized.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def eight_devices():
    import jax

    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs

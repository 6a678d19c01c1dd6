import os

import pytest

# Tests run on a virtual 8-device CPU mesh so multi-chip sharding logic is
# exercised without TPU hardware (the driver dry-runs the real multi-chip
# path separately). The axon sitecustomize pins jax_platforms before pytest
# starts, so we must override via jax.config, not env vars.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8"
).strip()

if not int(os.environ.get("DCVC_TPU_TEST_ON_TPU", "0")):
    import jax

    jax.config.update("jax_platforms", "cpu")


# Modules whose tests finish in seconds on this 1-vCPU host — `pytest -m
# fast` is the round-checkable tier (<3 min); the full suite is the nightly
# tier (>20 min, dominated by full-size model compiles and torch parity).
FAST_MODULES = {
    "test_rans",
    "test_entropy",
    "test_async_coder",
    "test_utils",
    "test_vision",
    "test_datasets",
    "test_warp_impls",
    "test_sharding",
    "test_distributed",
    "test_dtype_consistency",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in FAST_MODULES:
            item.add_marker(pytest.mark.fast)

import os

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

"""Test env: force CPU JAX with 8 fake devices (standard JAX trick for
testing pmap/shard_map logic without a TPU slice — SURVEY.md §4). Must run
before jax is imported anywhere."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

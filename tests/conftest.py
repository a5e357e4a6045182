"""Test env: force CPU JAX with 8 fake devices (standard JAX trick for
testing pmap/shard_map logic without a TPU slice — SURVEY.md §4).

This image's sitecustomize imports jax at interpreter startup and registers
the `axon` TPU plugin, so env vars set here are too late; instead we override
via jax.config before any backend is initialized (registration alone doesn't
initialize backends)."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

"""Test env: run JAX on a virtual 8-device CPU mesh (the JAX-native way to
exercise multi-chip sharding without hardware — SURVEY.md §4)."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The container's sitecustomize registers the axon TPU backend and pins
# jax_platforms="axon,cpu" via jax.config.update, which overrides the env
# var. Re-pin to cpu the same way (conftest runs after sitecustomize).
jax.config.update("jax_platforms", "cpu")

"""Test configuration: force an 8-device virtual CPU mesh.

The TPU-native analog of "test multi-node without a cluster" (the reference
has nothing comparable, SURVEY.md section 4): all sharding/collective tests
run against XLA's host platform with 8 virtual devices.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

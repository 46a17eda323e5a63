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
# The suite is XLA:CPU compile-dominated (the big view-step graphs take
# minutes each); a persistent compile cache makes warm re-runs of the
# suite dramatically cheaper.  Cold (clean-checkout) runs are unchanged.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jit_caches_between_modules():
    """Free compiled executables before each test module.

    A full-suite run accumulates every module's jitted executables in one
    process; by the time the big view-step graphs (test_scene_eval,
    test_relay_artifact) compile, XLA:CPU's JIT has hundreds of live code
    regions and the compile intermittently segfaults (observed at the
    ~105th test; the same tests always pass in isolation).  Dropping dead
    modules' caches keeps the process footprint flat."""
    jax.clear_caches()
    yield

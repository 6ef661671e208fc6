"""Test harness: force an 8-device virtual CPU mesh before jax initializes.

Multi-host/multi-chip tests run against this fake mesh (SURVEY.md par.4:
"multi-host tests on CPU via XLA_FLAGS=--xla_force_host_platform_device_count
to fake a mesh without TPUs").

Some installed pytest plugins import jax before this conftest runs, so the
env var alone is not reliable — we also force the platform through
jax.config (valid until a backend is initialized) and assert the result.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _bound_jit_cache():
    """Free compiled executables after every test module.

    One pytest invocation over the whole suite compiles hundreds of
    XLA:CPU programs across 8 virtual devices; with all of them kept
    alive the run segfaults inside backend_compile ~70 tests in
    (allocator pressure).  Dropping each module's executables bounds the
    live set — cross-module cache reuse is negligible anyway (modules
    use different configs/shapes)."""
    yield
    jax.clear_caches()


def pytest_sessionstart(session):
    backend = jax.default_backend()
    assert backend == "cpu", (
        f"tests must run on the virtual CPU mesh, got backend={backend}")
    assert len(jax.devices()) >= 8, jax.devices()

import os

# Default test platform: virtual 8-device CPU mesh, f64 for numeric parity
# with the reference (which is double-precision C++).  Set CAFEMPC_TEST_TPU=1
# to run on the real chip instead.
if not os.environ.get("CAFEMPC_TEST_TPU"):
    os.environ.setdefault(
        "XLA_FLAGS",
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8")

import jax  # noqa: E402

if not os.environ.get("CAFEMPC_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compilation cache: the whole-body solver graph is large
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
jax.config.update("jax_persistent_cache_enable_xla_caches",
                  "xla_gpu_per_fusion_autotune_cache_dir")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


def pytest_configure(config):
    config.addinivalue_line(
        "markers",
        "slow: heavy whole-body solves (skipped unless CAFEMPC_RUN_SLOW=1)")


def pytest_collection_modifyitems(config, items):
    """Keep the default suite fast (<5 min): heavy WB tests run in the
    CAFEMPC_RUN_SLOW=1 tier (VERDICT r1 #8)."""
    if os.environ.get("CAFEMPC_RUN_SLOW"):
        return
    skip = pytest.mark.skip(reason="slow tier; set CAFEMPC_RUN_SLOW=1")
    for it in items:
        if "slow" in it.keywords:
            it.add_marker(skip)


@pytest.fixture(scope="session")
def fixtures_dir():
    return os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(42)

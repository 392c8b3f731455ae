"""Test configuration: run on a virtual 8-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and exports
``JAX_PLATFORMS=axon`` before pytest starts, so we must *overwrite* (not
setdefault) the platform and also update the already-imported jax config.
Set ``CLIMPARAM_TEST_TPU=1`` to run the suite against the real TPU instead.
"""

import os

if os.environ.get("CLIMPARAM_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    xla_flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in xla_flags:
        os.environ["XLA_FLAGS"] = (xla_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

if os.environ.get("CLIMPARAM_TEST_TPU") != "1":
    # sitecustomize may have imported jax already, freezing the env snapshot.
    jax.config.update("jax_platforms", "cpu")

jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop compiled executables at module boundaries.

    Full single-process suite runs (507 tests) segfault DETERMINISTICALLY in
    XLA-CPU `backend_compile_and_load` at ~test #257 (three runs, identical
    site: the scan compile in `test_fused_rhs.py::
    test_train_config_auto_runs_everywhere`) while the same test passes
    alone, with its whole file, and in a half-suite process that runs files
    16-29 (ROUND5.md "Test suite") — i.e. the crash needs the ACCUMULATED
    compiled-program state of the 15 preceding modules, not any particular
    test. Clearing JAX's executable caches per module bounds that
    accumulation; within-module caching (what the tests actually reuse) is
    untouched, and CPU recompiles of these small programs cost seconds per
    module.
    """
    yield
    jax.clear_caches()

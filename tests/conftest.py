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

"""Test configuration: force an 8-virtual-device CPU backend.

Tests must run identically with or without the real TPU attached; sharding
tests use the virtual 8-device CPU mesh.  The axon TPU plugin registers a
PJRT backend from sitecustomize at interpreter startup, but backend
*initialization* is lazy, so flipping ``jax_platforms`` here (before any
test touches a device) is early enough.  Set OECE_TEST_TPU=1 to run the
suite against the real device instead.
"""

import os

if os.environ.get("OECE_TEST_TPU", "0") != "1":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

"""Test configuration: force an 8-virtual-device CPU backend.

Tests must run identically with or without the real TPU attached; sharding
tests use the virtual 8-device CPU mesh.  Set OECE_TEST_TPU=1 to run the
suite against the real device instead.
"""

import os
import sys

if os.environ.get("OECE_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    # the axon TPU plugin (sitecustomize) overrides JAX_PLATFORMS; it keys
    # off this env var, so clearing it keeps tests on the local CPU
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

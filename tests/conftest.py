"""Test config: force an 8-device virtual CPU mesh before any backend init.

Multi-chip hardware isn't available in CI; sharding tests run against
XLA's host-platform device partitioning. The container's sitecustomize
registers the axon TPU plugin and force-sets jax_platforms, so we must
override via jax.config *after* import (env vars alone are ignored).
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

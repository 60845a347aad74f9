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

# Persistent compile cache: the suite's wall-clock is dominated by CPU
# XLA compiles (1-core box); warm runs skip them entirely. Keyed by
# backend so TPU bench caches don't mix in (same scheme as bench.py).
_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(_repo, ".jax_cache-cpu-tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

sys.path.insert(0, _repo)

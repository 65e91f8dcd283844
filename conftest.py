"""Root conftest: force CPU backend with 8 virtual devices for all tests.

Mirrors the reference's CPU-CI strategy (reference tests/conftest.py:16-24 uses
FORCE_CPU to run the warp kernels' CPU build); here the JAX CPU backend is the
fake backend, and 8 virtual devices let sharding tests run without a TPU slice.
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(__file__))

"""Root conftest: force the CPU backend with 8 virtual devices for all tests.

Mirrors the reference's CPU-CI strategy (reference tests/conftest.py:16-24 uses
FORCE_CPU to run the warp kernels' CPU build); here the JAX CPU backend is the
fake backend, and 8 virtual devices let sharding tests run without a TPU slice.

The environment may pin JAX_PLATFORMS to a hardware plugin (and a
sitecustomize may import jax before this file runs), so the platform is
forced through jax.config, not just the env var.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jaxcache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(__file__))

"""Accelerator selection (the TPU analog of reference
src/mjlab/utils/gpu.py:select_gpus, which indexes CUDA_VISIBLE_DEVICES).

On JAX the visible-device set is controlled before backend init via
TPU_VISIBLE_DEVICES / CUDA_VISIBLE_DEVICES / JAX_PLATFORMS; after init,
sub-selection happens by passing an explicit device list to the mesh
(`mjlab_tpu.parallel.make_env_mesh(devices)`), so this helper resolves a
user spec into that list.
"""

from __future__ import annotations

import os
from typing import Literal


def select_devices(
    device_ids: list[int] | Literal["all"] | None = "all",
):
    """Resolve a device spec into (devices, count).

    Args:
      device_ids: indices into the currently visible accelerator list
        (`jax.devices()`), "all" for every visible chip, or None to force
        the CPU backend.

    Returns:
      (devices, count): a list of jax devices to build the mesh over, or
      (None, 0) for CPU mode.
    """
    if device_ids is None:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        return None, 0
    import jax

    visible = jax.devices()
    if device_ids == "all":
        return visible, len(visible)
    missing = [i for i in device_ids if i >= len(visible)]
    if missing:
        raise ValueError(
            f"device indices {missing} out of range: only "
            f"{len(visible)} visible devices ({visible})"
        )
    picked = [visible[i] for i in device_ids]
    return picked, len(picked)


def enable_persistent_compilation_cache(
    path: str | None = None,
) -> None:
    """Turn on JAX's on-disk XLA compilation cache.

    Robot-scale steps compile in minutes; the cache makes every
    subsequent process (bench re-runs, training restarts, play) hit a
    warm compile. Safe to call multiple times; honors
    JAX_COMPILATION_CACHE_DIR when set."""
    try:
        import jax

        cache = (
            path
            or os.environ.get("JAX_COMPILATION_CACHE_DIR")
            or os.path.expanduser("~/.cache/mjlab_tpu_xla")
        )
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except (OSError, AttributeError, ValueError) as e:
        # A mis-set/unwritable cache dir must not crash startup, but a
        # silently-disabled cache costs minutes per cold compile — say why.
        import warnings

        warnings.warn(
            f"persistent XLA compilation cache disabled: {e!r}",
            RuntimeWarning,
            stacklevel=2,
        )


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when jax was already imported.

    Some environments pre-import jax (sitecustomize), so the env var set
    by the user's shell never reaches backend selection. Calling this
    before the first jax operation re-applies it through jax.config. Call
    at the top of CLI entry points."""
    plat = os.environ.get("JAX_PLATFORMS")
    if not plat:
        return
    try:
        import jax

        jax.config.update("jax_platforms", plat)
    except Exception:
        pass

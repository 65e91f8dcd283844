"""W&B helpers (reference src/mjlab/utils/wandb.py:9). Soft dependency:
no-ops when wandb is not installed."""

from __future__ import annotations


def add_wandb_tags(tags: list[str]) -> None:
    try:
        import wandb
    except ImportError:
        return
    if wandb.run is not None:
        wandb.run.tags = tuple(set(list(wandb.run.tags or ()) + list(tags)))

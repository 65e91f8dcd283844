"""Filesystem helpers (reference src/mjlab/utils/os.py):
asset collection, YAML config dumps, regex-latest checkpoint resolution."""

from __future__ import annotations

import dataclasses
import os
import re
from pathlib import Path


def update_assets(
    assets: dict[str, bytes], path: str | Path, meshdir: str = ""
) -> None:
    """Collect files under `path` into the assets dict keyed by
    meshdir-relative name (reference utils/os.py:8)."""
    path = Path(path)
    for f in path.rglob("*"):
        if f.is_file():
            key = os.path.join(meshdir, f.relative_to(path).as_posix())
            assets[key] = f.read_bytes()


def dump_yaml(path: str, data, sort_keys: bool = False) -> None:
    """Write a (possibly dataclass) config tree as YAML
    (reference utils/os.py:37)."""
    import yaml

    def to_plain(obj):
        if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
            return {
                f.name: to_plain(getattr(obj, f.name))
                for f in dataclasses.fields(obj)
            }
        if isinstance(obj, dict):
            return {k: to_plain(v) for k, v in obj.items()}
        if isinstance(obj, (list, tuple)):
            return [to_plain(v) for v in obj]
        if callable(obj):
            return f"{getattr(obj, '__module__', '')}.{getattr(obj, '__name__', repr(obj))}"
        if hasattr(obj, "tolist"):  # numpy / jax arrays
            return obj.tolist()
        if isinstance(obj, (str, int, float, bool)) or obj is None:
            return obj
        return str(obj)  # slices, enums, anything else

    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_plain(data), f, sort_keys=sort_keys)


def get_checkpoint_path(
    log_path: str,
    run_dir: str = ".*",
    checkpoint: str = r"model_(\d+).*",
    sort_alpha: bool = True,
) -> str:
    """Resolve the latest run dir + checkpoint by regex
    (reference utils/os.py:52-90)."""
    runs = [
        d
        for d in os.listdir(log_path)
        if re.fullmatch(run_dir, d)
        and os.path.isdir(os.path.join(log_path, d))
    ]
    if not runs:
        raise FileNotFoundError(
            f"no run dir matching '{run_dir}' under {log_path}"
        )
    if sort_alpha:
        runs.sort()
    else:
        runs.sort(
            key=lambda d: os.path.getmtime(os.path.join(log_path, d))
        )
    run = os.path.join(log_path, runs[-1])
    ckpts = [f for f in os.listdir(run) if re.fullmatch(checkpoint, f)]
    if not ckpts:
        raise FileNotFoundError(f"no checkpoint matching '{checkpoint}' in {run}")

    def key(f):
        m = re.search(r"(\d+)", f)
        return int(m.group(1)) if m else -1

    ckpts.sort(key=key)
    return os.path.join(run, ckpts[-1])


def get_wandb_checkpoint_path(
    run_path: str, log_path: str = "logs", checkpoint_substr: str = "model"
) -> str:
    """Download-and-cache the latest checkpoint of a W&B run
    (reference utils/os.py:92-118). run_path: "entity/project/run_id"."""
    import wandb

    run_id = str(run_path).split("/")[-1]
    download_dir = os.path.join(log_path, "wandb_checkpoints", run_id)

    api = wandb.Api()
    wandb_run = api.run(str(run_path))
    files = [f.name for f in wandb_run.files() if checkpoint_substr in f.name]
    if not files:
        raise FileNotFoundError(f"no checkpoint files in W&B run {run_path}")

    def key(name):
        m = re.search(r"(\d+)", name)
        return int(m.group(1)) if m else -1

    checkpoint_file = max(files, key=key)
    checkpoint_path = os.path.join(download_dir, checkpoint_file)
    if not os.path.exists(checkpoint_path):
        os.makedirs(download_dir, exist_ok=True)
        wandb_run.file(checkpoint_file).download(download_dir, replace=True)
    return checkpoint_path

"""Pretrained demo asset download + cache (reference src/mjlab/scripts/gcs.py).

Same public GCS assets and sha256-verified cache semantics as the
reference; used by the demo CLI. Environments without egress get a clear
error pointing at the local-checkpoint path."""

from __future__ import annotations

import hashlib
import os
import tempfile

CACHE_DIR = os.path.join(tempfile.gettempdir(), "mjlab_tpu_cache")

ASSETS: dict[str, dict] = {
    "demo_ckpt.pt": {
        "url": "https://storage.googleapis.com/mjlab_beta/model_49999.pt",
        "sha256": (
            "f1bc404f5165b833a3933ac98ff223450392b78df3eb76b0c36cd1360ff22319"
        ),
        "path": os.path.join(CACHE_DIR, "demo_ckpt.pt"),
    },
    "demo_motion.npz": {
        "url": (
            "https://storage.googleapis.com/mjlab_beta/"
            "lafan_dance1_subject1.npz"
        ),
        "sha256": (
            "f08d15d4b5bb605e17b6928ccdb44ae6ce7bf2038111e8b145f12a176cd096d4"
        ),
        "path": os.path.join(CACHE_DIR, "lafan1_dance1_subject1_demo.npz"),
    },
}


def sha256_of(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download_with_progress(url: str, path: str) -> None:
    import requests
    from tqdm import tqdm

    response = requests.get(url, stream=True, timeout=60)
    response.raise_for_status()
    total = int(response.headers.get("content-length", 0))
    with open(path, "wb") as f, tqdm(
        desc=os.path.basename(path), total=total, unit="B",
        unit_scale=True, unit_divisor=1024,
    ) as pbar:
        for chunk in response.iter_content(chunk_size=8192):
            pbar.update(f.write(chunk))


def ensure_asset(name: str) -> str:
    """Return the local path of a named demo asset, downloading and
    hash-verifying it on first use."""
    info = ASSETS[name]
    path = info["path"]
    if os.path.exists(path) and sha256_of(path) == info["sha256"]:
        return path
    os.makedirs(CACHE_DIR, exist_ok=True)
    try:
        download_with_progress(info["url"], path)
    except Exception as e:
        raise RuntimeError(
            f"could not download {name} from {info['url']} (no network "
            "egress?). Pass --checkpoint-file / --motion-file to run the "
            f"demo from local files instead: {e}"
        ) from e
    got = sha256_of(path)
    if got != info["sha256"]:
        os.unlink(path)
        raise RuntimeError(
            f"sha256 mismatch for {name}: got {got}, expected "
            f"{info['sha256']}"
        )
    return path

"""Model weight persistence and the model artifact cache.

The reference downloads ``.rten`` model files once into ``~/.cache/ocrs``
(ocrs-cli/src/models.rs:17-64). This framework's native weight format is a
flat ``.npz`` of the parameter pytree plus a small metadata record; the cache
mirror lives in ``~/.cache/ocrs-tpu``. Remote URLs download once and reuse
the cached file, keyed by the URL's filename (models.rs:44-64).
"""

from __future__ import annotations

import json
import os
import urllib.request
from pathlib import Path
from typing import Any

import jax
import numpy as np

_SEP = "/"
_META_KEY = "__meta__"


def cache_dir() -> Path:
    """Per-user model cache (mirrors models.rs:17-42)."""
    root = os.environ.get("OCRS_TPU_CACHE", os.path.join(Path.home(), ".cache", "ocrs-tpu"))
    p = Path(root)
    p.mkdir(parents=True, exist_ok=True)
    return p


def _flatten(params: Any, prefix: str = "") -> dict[str, np.ndarray]:
    out: dict[str, np.ndarray] = {}
    if isinstance(params, dict):
        for k, v in params.items():
            out.update(_flatten(v, f"{prefix}{k}{_SEP}"))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.update(_flatten(v, f"{prefix}{i}{_SEP}"))
    else:
        out[prefix[: -len(_SEP)]] = np.asarray(params)
    return out


def _unflatten(flat: dict[str, np.ndarray]) -> Any:
    tree: dict = {}
    for key, value in flat.items():
        parts = key.split(_SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(tree)


def save_params(path: str | Path, params: Any, meta: dict | None = None) -> None:
    """Save a parameter pytree (+ JSON metadata) as a flat .npz."""
    flat = _flatten(jax.device_get(params))
    flat[_META_KEY] = np.frombuffer(
        json.dumps(meta or {}).encode("utf-8"), dtype=np.uint8
    )
    np.savez(path, **flat)


def load_params(path: str | Path) -> tuple[Any, dict]:
    """Load a parameter pytree and its metadata from a .npz."""
    with np.load(path) as data:
        flat = {k: data[k] for k in data.files}
    meta_arr = flat.pop(_META_KEY, None)
    meta = (
        json.loads(bytes(meta_arr.tobytes()).decode("utf-8"))
        if meta_arr is not None
        else {}
    )
    return _unflatten(flat), meta


def load_recognition_model(source: str | Path):
    """Construct a RecognitionModel from a weight file, honoring the
    architecture recorded in the file's metadata ("arch": crnn | convctc)."""
    from .recognition_net import RecognitionModel

    params, meta = load_params(fetch_model(str(source)))
    return RecognitionModel(params, arch=meta.get("arch", "crnn"))


def load_detection_model(source: str | Path):
    """Construct a DetectionModel from a weight file (input size from meta)."""
    from .detection_net import DetectionModel

    params, meta = load_params(fetch_model(str(source)))
    return DetectionModel(params, tuple(meta.get("input_hw", (800, 608))))


def fetch_model(source: str) -> Path:
    """Resolve a model source to a local file.

    Local paths pass through; ``http(s)://`` URLs download once into the
    cache, keyed by filename, and are skipped when already present
    (models.rs:44-64)."""
    if not source.startswith(("http://", "https://")):
        return Path(source)
    filename = source.rsplit("/", 1)[-1]
    target = cache_dir() / filename
    if target.exists():
        return target
    print(f"Downloading {source}...")
    tmp = target.with_suffix(target.suffix + ".part")
    urllib.request.urlretrieve(source, tmp)
    tmp.rename(target)
    return target

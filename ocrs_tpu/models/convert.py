"""Weight conversion from external formats.

The reference executes ``.rten`` model binaries converted from ONNX exports
of the ocrs-models PyTorch training repo (README.md:16-19). ocrs-tpu's
native format is the flat ``.npz`` pytree (weights.py); this module converts
into it from:

  * **PyTorch state dicts** (``convert_torch_state_dict``) — the PROVEN
    path: a torch CRNN converts with <=1e-4 numeric equivalence
    (tests/test_convert.py::test_torch_crnn_numeric_equivalence). The
    reference's models are trained in PyTorch (ocrs-models), so this is the
    realistic route to its weights.
  * **ONNX** (``convert_onnx``) — a thin adapter over the same mapping for
    environments with the ``onnx`` package (not installed here; import is
    gated). Untested against real exports — prefer the torch path.

Both converters are deliberately strict: they verify every target leaf is
covered exactly once and report what didn't match, because a silently
mismapped weight is worse than an error. Conversions from the reference's
exact checkpoints additionally need transposes between torch's OIHW /
``[3H, C]`` GRU layouts and this framework's HWIO / ``[C, 3H]`` layouts —
handled by ``_adapt`` below.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np


def _flatten_with_paths(tree: Any, prefix: str = "") -> list[tuple[str, np.ndarray]]:
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.extend(_flatten_with_paths(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.extend(_flatten_with_paths(v, f"{prefix}{i}/"))
    else:
        out.append((prefix[:-1], np.asarray(tree)))
    return out


def _set_by_path(tree: Any, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node[int(p)] if isinstance(node, (list, tuple)) else node[p]
    last = parts[-1]
    if isinstance(node, (list, tuple)):
        node[int(last)] = value
    else:
        node[last] = value


def _adapt(source: np.ndarray, target_shape: tuple[int, ...]) -> np.ndarray | None:
    """Try to view `source` as `target_shape`, applying the standard
    torch->JAX layout changes: OIHW->HWIO for conv kernels and [out,in] ->
    [in,out] transposes for dense/GRU matrices."""
    src = np.asarray(source)
    if src.shape == tuple(target_shape):
        return src
    if src.ndim == 4 and tuple(np.transpose(src, (2, 3, 1, 0)).shape) == tuple(target_shape):
        return np.transpose(src, (2, 3, 1, 0))  # OIHW -> HWIO
    if src.ndim == 2 and src.T.shape == tuple(target_shape):
        return src.T
    return None


def _name_hint_score(source_name: str, target_path: str) -> int:
    """Affinity between a torch parameter name and a target leaf path.

    Disambiguates same-shaped tensors: GRU direction (``_reverse`` <-> bwd)
    and role (``weight_ih``/``weight_hh``/``bias_ih``/``bias_hh`` <->
    wx/wh/bx/bh). Shape-adaptable candidates with the highest score win;
    ties fall back to source declaration order."""
    score = 0
    is_reverse = "reverse" in source_name
    if "/bwd/" in target_path or target_path.endswith("bwd"):
        score += 4 if is_reverse else -4
    elif "/fwd/" in target_path:
        score += 4 if not is_reverse else -4
    leaf = target_path.rsplit("/", 1)[-1]
    for token, tgt in (
        ("weight_ih", "wx"),
        ("weight_hh", "wh"),
        ("bias_ih", "bx"),
        ("bias_hh", "bh"),
    ):
        if token in source_name:
            score += 4 if leaf == tgt else -4
    return score


def convert_torch_state_dict(state_dict: dict, target_params: Any) -> Any:
    """Map a PyTorch ``state_dict`` onto `target_params` by shape signature
    plus name hints.

    Target leaves are traversed in sorted-path order (a JAX pytree's
    canonical dict ordering — NOT python declaration order, which jax tree
    ops do not preserve); each takes the unconsumed source tensor that
    adapts to its shape with the highest name-hint affinity
    (:func:`_name_hint_score`), ties resolved by source declaration order.
    Raises with a detailed report when coverage is not exact.
    """
    import copy

    result = copy.deepcopy(
        {"__root__": target_params}
    )["__root__"]  # deep copy of nested dict/list structure
    targets = sorted(_flatten_with_paths(result), key=lambda kv: kv[0])
    sources = [(k, np.asarray(v)) for k, v in state_dict.items()]
    used = [False] * len(sources)
    unmatched = []
    for path, leaf in targets:
        best = None  # (neg_score, order, index, adapted)
        for i, (name, src) in enumerate(sources):
            if used[i]:
                continue
            adapted = _adapt(src, leaf.shape)
            if adapted is None:
                continue
            key = (-_name_hint_score(name, path), i)
            if best is None or key < best[0]:
                best = (key, i, adapted)
        if best is None:
            unmatched.append((path, leaf.shape))
            continue
        used[best[1]] = True
        _set_by_path(result, path, best[2].astype(np.float32))
    if unmatched:
        leftover = [sources[i][0] for i in range(len(sources)) if not used[i]]
        raise ValueError(
            "state dict does not cover the target parameters.\n"
            f"unmatched targets: {unmatched}\n"
            f"unused sources: {leftover}"
        )
    return result


def convert_onnx(onnx_path: str, target_params: Any) -> Any:
    """Convert an ONNX model's initializers onto `target_params`.

    Requires the ``onnx`` package. Initializers are taken in graph order and
    mapped by shape signature like :func:`convert_torch_state_dict`.
    """
    try:
        import onnx
        from onnx import numpy_helper
    except ImportError as exc:  # pragma: no cover - environment dependent
        raise ImportError(
            "ONNX conversion requires the `onnx` package, which is not "
            "installed in this environment. Convert via a PyTorch state "
            "dict (convert_torch_state_dict) or install onnx."
        ) from exc

    model = onnx.load(onnx_path)
    state = {init.name: numpy_helper.to_array(init) for init in model.graph.initializer}
    return convert_torch_state_dict(state, target_params)

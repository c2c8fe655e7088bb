import numpy as np
import pytest

from ocrs_tpu.models.convert import convert_torch_state_dict
from ocrs_tpu.models.recognition_net import init_params

import jax


def test_convert_state_dict_roundtrip():
    params = init_params(jax.random.key(0), n_classes=8, hidden=16)
    # Build a torch-style state dict: conv kernels in OIHW, matrices
    # transposed, arbitrary names, declaration order.
    from ocrs_tpu.models.convert import _flatten_with_paths

    state = {}
    for i, (path, leaf) in enumerate(_flatten_with_paths(jax.device_get(params))):
        arr = np.asarray(leaf)
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))  # HWIO -> OIHW
        elif arr.ndim == 2:
            arr = arr.T
        state[f"module.layer{i}.weight"] = arr

    converted = convert_torch_state_dict(state, jax.device_get(params))
    for (pa, la), (pb, lb) in zip(
        _flatten_with_paths(jax.device_get(params)), _flatten_with_paths(converted)
    ):
        assert pa == pb
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), rtol=1e-6)


def test_convert_state_dict_reports_mismatch():
    params = {"a": {"w": np.zeros((4, 6))}}
    with pytest.raises(ValueError, match="unmatched targets"):
        convert_torch_state_dict({"x": np.zeros((3, 3))}, params)

"""Separable bilinear resize as MXU matmuls.

The reference resizes with ONNX ``Resize`` (bilinear, half-pixel coordinate
transform, no antialiasing) via rten's ``resize_image``
(ocrs/src/detection.rs:167-171, recognition.rs:119-122). On TPU the natural
formulation is two dense interpolation matrices applied as matmuls — this
keeps the op on the MXU instead of emitting scatter/gather, and XLA fuses the
pair with neighbouring elementwise work.

Note ``jax.image.resize`` is NOT equivalent: it antialiases on downscale,
which ONNX Resize does not. We build the exact ONNX half-pixel kernel.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


@lru_cache(maxsize=256)
def _interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bilinear interpolation matrix, half-pixel convention
    with edge clamping (ONNX Resize ``coordinate_transformation_mode =
    half_pixel``, ``mode = linear``)."""
    if in_size == out_size:
        return np.eye(in_size, dtype=np.float32)
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    lo = np.floor(src).astype(np.int64)
    frac = (src - lo).astype(np.float64)
    lo0 = np.clip(lo, 0, in_size - 1)
    lo1 = np.clip(lo + 1, 0, in_size - 1)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    rows = np.arange(out_size)
    np.add.at(m, (rows, lo0), 1.0 - frac)
    np.add.at(m, (rows, lo1), frac)
    return m.astype(np.float32)


def resize_bilinear(
    img: jax.Array, out_hw: tuple[int, int], precision: str = "highest"
) -> jax.Array:
    """Bilinear-resize the trailing two dims of `img` to `out_hw`.

    Works for any leading batch/channel dims. Matches rten/ONNX Resize
    (linear, half_pixel, no antialias) to float rounding.

    ``precision``: the default matmul precision truncates f32 operands to
    bf16 on TPU (and, with current backends, on the CPU emulation path too),
    which would break the ONNX-exact parity claim (~1e-3 error on [0,1]
    pixels) — so image-parity call sites use the "highest" default
    (true-f32 passes; the op is bandwidth-bound so the extra MXU passes are
    cheap). Approximation-tolerant call sites (e.g. U-Net feature-map
    upsampling on bf16 activations) pass "default"."""
    out_h, out_w = int(out_hw[0]), int(out_hw[1])
    in_h, in_w = img.shape[-2], img.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return img
    ry = jnp.asarray(_interp_matrix(in_h, out_h))
    rx = jnp.asarray(_interp_matrix(in_w, out_w))
    # (..., H, W) -> (..., out_h, W) -> (..., out_h, out_w)
    out = jnp.einsum(
        "oh,...hw->...ow", ry, img,
        preferred_element_type=jnp.float32, precision=precision,
    )
    out = jnp.einsum(
        "pw,...ow->...op", rx, out,
        preferred_element_type=jnp.float32, precision=precision,
    )
    return out

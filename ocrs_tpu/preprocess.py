"""Image preprocessing: color conversion + normalization, on device.

Behavioral parity with the reference preprocessing
(/root/reference/ocrs/src/preprocess.rs:125-250):

  * Accepts u8 or f32 pixels, greyscale / RGB / RGBA, HWC or CHW order.
  * Converts to a single grey channel using ITU BT.601 weights
    ``[0.299, 0.587, 0.114]`` (torchvision-compatible; preprocess.rs:171).
  * u8 inputs are scaled by 1/255 (fused into the channel weights,
    preprocess.rs:182).
  * Alpha channels are ignored.
  * Output is a ``(1, H, W)`` float32 tensor biased by ``BLACK_VALUE`` so the
    value range is ``[-0.5, 0.5]`` (preprocess.rs:128).

Unlike the reference's hand-vectorized CPU loop (preprocess.rs:219-245), the
conversion here is a single fused XLA computation that runs on the TPU so the
image lands in HBM ready for the detection model.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .errors import ImageSourceError

#: Value of a fully black pixel in normalized images (preprocess.rs:128).
BLACK_VALUE: float = -0.5

#: ITU BT.601 luminance weights (preprocess.rs:171).
ITU_WEIGHTS: tuple[float, float, float] = (0.299, 0.587, 0.114)


class DimOrder(enum.Enum):
    """Dimension order of an input image (preprocess.rs:50-57)."""

    HWC = "hwc"
    CHW = "chw"


@dataclass(frozen=True)
class ImageSource:
    """A reference to input image pixels plus layout metadata.

    Mirrors ``ocrs::ImageSource`` (preprocess.rs:81-123). ``data`` is a host
    numpy array (u8 or float); device transfer happens in
    :func:`prepare_image`.
    """

    data: np.ndarray
    order: DimOrder

    @staticmethod
    def from_bytes(data: bytes | np.ndarray, hw: tuple[int, int]) -> "ImageSource":
        """Create from packed HWC u8 bytes; the channel count is inferred from
        the data length (preprocess.rs:81-101)."""
        arr = np.frombuffer(data, dtype=np.uint8) if isinstance(data, (bytes, bytearray)) else np.asarray(data, dtype=np.uint8).reshape(-1)
        h, w = int(hw[0]), int(hw[1])
        if h <= 0 or w <= 0:
            raise ImageSourceError(f"invalid image dimensions {h}x{w}")
        if arr.size % (h * w) != 0:
            raise ImageSourceError(
                f"data length {arr.size} is not a multiple of height*width {h * w}"
            )
        channels = arr.size // (h * w)
        if channels not in (1, 3, 4):
            raise ImageSourceError(f"unsupported channel count {channels}")
        return ImageSource(arr.reshape(h, w, channels), DimOrder.HWC)

    @staticmethod
    def from_tensor(data: np.ndarray, order: DimOrder) -> "ImageSource":
        """Create from a 3-D u8/float array in the given layout
        (preprocess.rs:105-123)."""
        arr = np.asarray(data)
        if arr.ndim != 3:
            raise ImageSourceError(f"expected 3 dims, got {arr.ndim}")
        chan_axis = 2 if order == DimOrder.HWC else 0
        channels = arr.shape[chan_axis]
        if channels not in (1, 3, 4):
            raise ImageSourceError(f"unsupported channel count {channels}")
        return ImageSource(arr, order)

    def hw(self) -> tuple[int, int]:
        if self.order == DimOrder.HWC:
            return self.data.shape[0], self.data.shape[1]
        return self.data.shape[1], self.data.shape[2]


@partial(jax.jit, static_argnames=("is_u8",))
def _normalize_hwc(img: jax.Array, is_u8: bool) -> jax.Array:
    """Fused channel-weighting + scale + bias. img: (H, W, C) -> (1, H, W)."""
    c = img.shape[-1]
    if c == 1:
        w = jnp.array([1.0], dtype=jnp.float32)
    else:
        w = jnp.array(ITU_WEIGHTS, dtype=jnp.float32)
        if c == 4:
            w = jnp.concatenate([w, jnp.zeros((1,), jnp.float32)])
    if is_u8:
        w = w / 255.0
    grey = jnp.tensordot(img.astype(jnp.float32), w, axes=([-1], [0]))
    return (grey + BLACK_VALUE)[None, :, :]


def prepare_image(img: ImageSource) -> jax.Array:
    """Convert an :class:`ImageSource` to a normalized (1, H, W) float32
    greyscale tensor on the default device (preprocess.rs:149-199)."""
    data = img.data
    if data.dtype == np.uint8:
        is_u8 = True
    elif np.issubdtype(data.dtype, np.floating):
        is_u8 = False
        data = data.astype(np.float32, copy=False)
    else:
        raise ImageSourceError(f"unsupported dtype {data.dtype}")
    if img.order == DimOrder.CHW:
        data = np.moveaxis(data, 0, -1)
    return _normalize_hwc(jnp.asarray(data), is_u8)

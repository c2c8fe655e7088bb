"""ocrs_tpu — a TPU-native OCR framework built on JAX/XLA/Pallas.

A from-scratch reimplementation of the capabilities of
`robertknight/ocrs <https://github.com/robertknight/ocrs>`_ designed for TPU:
jitted detection and recognition models, on-device mask post-processing and
line extraction, static-shape width bucketing, and sharded multi-page
throughput via ``jax.sharding``.

Public API mirrors the reference engine surface (ocrs/src/lib.rs:130-301).
"""

from .errors import (
    ImageSourceError,
    ModelNotLoadedError,
    ModelRunError,
    OcrError,
    WrongOutputError,
)
from .geometry import Line, Rect, RotatedRect, min_area_rect
from .preprocess import BLACK_VALUE, DimOrder, ImageSource, prepare_image

__version__ = "0.1.0"

__all__ = [
    "BLACK_VALUE",
    "DimOrder",
    "ImageSource",
    "ImageSourceError",
    "Line",
    "ModelNotLoadedError",
    "ModelRunError",
    "OcrError",
    "Rect",
    "RotatedRect",
    "WrongOutputError",
    "min_area_rect",
    "prepare_image",
]
